#!/usr/bin/env python
"""Extract the CB6r2 chemical mechanism from the KPP-generated
reference sources into TPU-friendly tensors (the CBMZ extractor
tools/extract_cbmz.py generalized to the CB6 mechanism files,
VERDICT r4 next #4):

- ``mod_cb6_Function.F90`` ``Fun``: 216 reaction-rate products → a
  (216, 3) reactant-index table into [76 var | 6 fix | 1.0], plus the
  vdot aggregation → a dense (76, 216) stoichiometry matrix.
- ``mod_cb6_Rates.F90`` ``Update_rconst`` + the constant block in
  ``mod_cb6_Main.F90:117-152``: each rate expression translated to
  Python; the kk1/kk2/kk3 temporaries and rconst self-references are
  preserved as sequential statements.

Rate-law note: the reference's ``fall``/``spd``/``lihi`` helpers
divide the (never-assigned — the module is dead code, wired to no
chemsimtype) global ``C_Mb`` by Avogadro's number, which would put
every falloff reaction in a nonsensical 1e-23 low-pressure regime.
The published CB6r2 rate laws (Yarwood et al. 2010; CAMx) take M in
molec/cm³ directly — that is what the generated helpers use, and the
mid-falloff k values it produces are physically correct (e.g. OH+OH+M
k0·M ≈ 0.7·ki at surface).

The chemical mechanism (CB6r2) is public science; this regenerable
extraction carries the reaction data, not program structure.
Output: ``regcm_tpu/chem/_cb6_mech_data.py``.
"""
import re
import sys

SRC = "/root/reference/Main/chemlib/GAS_CB6r2"
OUT = "/root/repo/regcm_tpu/chem/_cb6_mech_data.py"
NVAR, NFIX, NREACT = 76, 6, 216
ONE = NVAR + NFIX                 # index of the constant-1 slot


def read_joined(path):
    lines = open(path).read().split("\n")
    out, cur = [], ""
    for ln in lines:
        ln = ln.split("!")[0].rstrip()
        if not ln.strip():
            continue
        cur += " " + ln.strip().lstrip("&")
        if cur.rstrip().endswith("&"):
            cur = cur.rstrip()[:-1]
            continue
        out.append(cur.strip())
        cur = ""
    return out


def clean(expr):
    expr = re.sub(r"_[dr][pk]x?\d*", "", expr)
    return expr.replace(" ", "")


def fnum(tok):
    return tok.replace("D", "e").replace("d", "e").replace("E", "e")


def parse_parameters():
    """Species names ordered by index from mod_cb6_Parameters."""
    var = {}
    fix = {}
    for ln in open(f"{SRC}/mod_cb6_Parameters.F90"):
        m = re.match(r"\s*INTEGER, PARAMETER :: indv_(\w+)\s*=\s*(\d+)",
                     ln)
        if m:
            name, i = m.group(1), int(m.group(2))
            if i <= NVAR:
                var[i] = name
        m = re.match(r"\s*INTEGER, PARAMETER :: indf_(\w+)\s*=\s*(\d+)",
                     ln)
        if m:
            fix[int(m.group(2))] = m.group(1)
    assert len(var) == NVAR and len(fix) == NFIX, (len(var), len(fix))
    return [var[i + 1] for i in range(NVAR)], \
        [fix[i + 1] for i in range(NFIX)]


def parse_function():
    lines = read_joined(f"{SRC}/mod_cb6_Function.F90")
    react_idx = [[ONE, ONE, ONE] for _ in range(NREACT)]
    stoich = [[0.0] * NREACT for _ in range(NVAR)]
    for ln in lines:
        m = re.match(r"A\((\d+)\)=(.*)$", clean(ln))
        if m:
            r = int(m.group(1)) - 1
            factors = m.group(2).split("*")
            slots = []
            for fct in factors:
                mv = re.match(r"V\((\d+)\)$", fct)
                mf = re.match(r"F\((\d+)\)$", fct)
                mr = re.match(r"RCT\((\d+)\)$", fct)
                if mv:
                    slots.append(int(mv.group(1)) - 1)
                elif mf:
                    slots.append(NVAR + int(mf.group(1)) - 1)
                else:
                    assert mr and int(mr.group(1)) - 1 == r, (r, fct)
            assert len(slots) <= 3, (r, slots)
            for i, sidx in enumerate(slots):
                react_idx[r][i] = sidx
            continue
        m = re.match(r"Vdot\((\d+)\)=(.*)$", clean(ln))
        if m:
            i = int(m.group(1)) - 1
            terms = re.findall(r"[+-]?[^+-]+", m.group(2))
            for t in terms:
                sign = -1.0 if t.startswith("-") else 1.0
                t = t.lstrip("+-")
                mm = re.match(r"(?:([\d.]+)\*)?A\((\d+)\)$", t)
                assert mm, (i, t)
                coeff = float(mm.group(1)) if mm.group(1) else 1.0
                stoich[i][int(mm.group(2)) - 1] += sign * coeff
    return react_idx, stoich


_HELPERS = '''
def _gtde0(a0, t0, p0, T):
    return a0 * (T / t0) ** p0


def _gtdp0(a0, ea, T):
    return a0 * np.exp(ea / T)


def _gtd(a0, t0, p0, ea, T):
    return a0 * (T / t0) ** p0 * np.exp(ea / T)


def _fall(k0, ki, n, f, M):
    # Troe falloff with M in molec/cm3 (Yarwood et al. 2010; see
    # tools/extract_cb6.py docstring for the dead-code /Avogadro note)
    g = 1.0 / (1.0 + (np.log10(k0 * M / ki) / n) ** 2)
    return (k0 * M / (1.0 + k0 * M / ki)) * f ** g


def _spd(k1, k2, M):
    return k1 + k2 * M


def _lihi(k1, k2, k3, M):
    return k1 + k3 * M / (1.0 + k3 * M / k2)
'''


def translate_rates():
    """Update_rconst body → ordered Python statements."""
    lines = read_joined(f"{SRC}/mod_cb6_Rates.F90")
    main_lines = read_joined(f"{SRC}/mod_cb6_Main.F90")

    def conv(expr):
        e = clean(expr)
        e = re.sub(r"jval_(\w+)", r"j['\1']", e)
        e = re.sub(r"\bgtde0\(", "_gtde0(", e)
        e = re.sub(r"\bgtdp0\(", "_gtdp0(", e)
        e = re.sub(r"\bgtd\(", "_gtd(", e)
        e = re.sub(r"\bfall\(", "_fall(", e)
        e = re.sub(r"\bspd\(", "_spd(", e)
        e = re.sub(r"\blihi\(", "_lihi(", e)
        # Fortran D-exponents → e, then strip the parens KPP puts
        # around bare literals so the helper calls have no nested
        # parens and the T/M argument injection regexes stay simple
        e = re.sub(r"rconst\((\d+)\)",
                   lambda m: f"rc[{int(m.group(1)) - 1}]", e)
        e = re.sub(r"[-+]?\d*\.?\d+[DdEe][-+]?\d+", lambda m:
                   fnum(m.group(0)), e)
        e = re.sub(r"(?<![\w\]])\(([-+]?\d*\.?\d+(?:e[-+]?\d+)?)\)",
                   r"\1", e)
        e = re.sub(r"_gtde0\(([^()]*)\)", r"_gtde0(\1,T)", e)
        e = re.sub(r"_gtdp0\(([^()]*)\)", r"_gtdp0(\1,T)", e)
        e = re.sub(r"_gtd\(([^()]*)\)", r"_gtd(\1,T)", e)
        e = re.sub(r"_fall\(([^()]*)\)", r"_fall(\1,M)", e)
        e = re.sub(r"_spd\(([^()]*)\)", r"_spd(\1,M)", e)
        e = re.sub(r"_lihi\(([^()]*)\)", r"_lihi(\1,M)", e)
        return e

    stmts = []
    have = set()
    grab = False
    for ln in lines:
        l2 = clean(ln)
        if grab and l2.startswith("ENDSUBROUTINE"):
            break               # stop BEFORE Update_PHOTO's KPP
                                # scaffolding re-assignments
        if l2.startswith("SUBROUTINEUpdate_rconst"):
            grab = True
            continue
        if not grab:
            continue
        m = re.match(r"(kk\d)=(.*)$", l2)
        if m:
            stmts.append((m.group(1), conv(m.group(2))))
            continue
        m = re.match(r"rconst\((\d+)\)=(.*)$", l2)
        if m:
            i = int(m.group(1))
            stmts.append((f"rc[{i - 1}]", conv(m.group(2))))
            have.add(i)
    # constant coefficients from the Main block
    const_stmts = []
    for ln in main_lines:
        m = re.match(r"rconst\((\d+)\)=\(\((.*)\)\)$", clean(ln))
        if m and int(m.group(1)) not in have:
            i = int(m.group(1))
            const_stmts.append((f"rc[{i - 1}]", fnum(m.group(2))))
            have.add(i)
    missing = sorted(set(range(1, NREACT + 1)) - have)
    assert not missing, missing
    return const_stmts + stmts


# Standard CB6r2 molecular weights, g/mol (Yarwood et al. 2010 / CAMx
# user's guide species table; PAR-like lumped species per-molecule
# values as used for transport).  Radical intermediates that are never
# transported carry 1.0 (their MW never enters a conversion).
MW = {
    'NTR': 119.0, 'SULF': 98.0, 'SDIO': 64.0, 'OSNG': 16.0,
    'ECH4': 16.0, 'ETHA': 30.1, 'ETHY': 26.0, 'DNPO': 108.0,
    'BENZ': 78.1, 'EPOX': 118.1, 'ETOH': 46.1, 'PRPA': 44.1,
    'KET': 72.1, 'TOLN': 92.1, 'XYLN': 106.2, 'HPLD': 116.1,
    'PACN': 121.0, 'PACD': 76.0, 'NTR2': 135.1, 'PNA': 79.0,
    'MEOH': 32.0, 'HONO': 47.0, 'MEPX': 48.0, 'OPAN': 161.1,
    'CAT1': 124.1, 'HPOX': 34.0, 'ISPX': 118.1, 'FACD': 46.0,
    'PANX': 135.1, 'HCO3': 63.0, 'CRER': 107.1, 'RPOX': 76.1,
    'NTR1': 119.1, 'ACET': 58.1, 'INTR': 147.1, 'BZO2': 159.1,
    'CRON': 153.1, 'AACD': 60.1, 'ROR': 71.1, 'TOLR': 172.1,
    'ETHE': 28.0, 'CMON': 28.0, 'XLO2': 187.2, 'TERP': 136.2,
    'CRSL': 108.1, 'ISPR': 68.1, 'EPX2': 149.1, 'NTRC': 63.0,
    'GLYD': 60.0, 'GLY': 58.0, 'XOPN': 98.1, 'MEGY': 72.1,
    'ROPN': 84.1, 'IOLE': 56.1, 'FORM': 30.0, 'OLE': 42.1,
    'AALD': 44.1, 'XYLR': 173.2, 'OPO3': 115.0, 'XO2N': 1.0,
    'ISO2': 117.1, 'XO2H': 1.0, 'ISPD': 70.1, 'MEO2': 47.0,
    'ALDX': 58.1, 'ALKA': 72.1, 'OZN': 48.0, 'ROO': 1.0,
    'HOX': 17.0, 'HO2': 33.0, 'CXO3': 89.1, 'NTOX': 62.0,
    'ACOO': 75.0, 'O': 16.0, 'NMOX': 30.0, 'NDOX': 46.0,
}

# Transported tracer set for chemsimtype='CB6': the non-radical,
# minutes-or-longer-lifetime species (the CAMx CB6 transported set;
# the reference wires no CB6 chemsimtype — see chem/cb6.py docstring).
TRACERS = [
    'NMOX', 'NDOX', 'DNPO', 'HONO', 'NTRC', 'PNA', 'OZN', 'HPOX',
    'CMON', 'SDIO', 'SULF', 'ECH4', 'ETHA', 'ALKA', 'MEOH', 'ETOH',
    'FORM', 'AALD', 'ALDX', 'ACET', 'KET', 'ETHE', 'OLE', 'IOLE',
    'ETHY', 'PRPA', 'BENZ', 'TOLN', 'XYLN', 'ISPR', 'TERP', 'ISPD',
    'NTR1', 'NTR2', 'INTR', 'PACN', 'OPAN', 'PANX', 'PACD', 'FACD',
    'AACD', 'MEPX', 'RPOX', 'ISPX', 'HPLD', 'GLYD', 'GLY', 'MEGY',
    'CRSL', 'CRON', 'EPOX',
]


def main():
    species, fixed = parse_parameters()
    react_idx, stoich = parse_function()
    stmts = translate_rates()
    for t in TRACERS:
        assert t in species, t
    mw_list = [MW[s] for s in species]
    tr_sol = [0.6 if t == "SDIO" else 0.0 for t in TRACERS]

    body = "\n".join(f"    {lhs} = {rhs}" for lhs, rhs in stmts)
    with open(OUT, "w") as f:
        f.write('"""CB6r2 gas-phase mechanism tables (generated by '
                'tools/extract_cb6.py from the\nKPP-generated '
                'reference sources '
                'Main/chemlib/GAS_CB6r2/mod_cb6_*.F90).\n\n'
                '76 variable species + 6 fixed (WTR, DIHY, O2, METH, '
                'M=N2, DUMMY2) + a\nconstant-1 slot; 216 reactions; '
                'dense (76, 216) stoichiometry.  CB6r2\n(Yarwood et '
                'al. 2010 / Ruiz & Yarwood 2013) public mechanism '
                'data."""\n'
                "import numpy as _onp\nimport jax.numpy as np\n\n")
        f.write(f"NVAR, NFIX, NREACT = {NVAR}, {NFIX}, {NREACT}\n")
        f.write(f"SPECIES = {species!r}\n\n")
        f.write(f"FIXED = {fixed!r}\n\n")
        f.write(f"MW = _onp.array({mw_list!r})\n\n")
        f.write(f"CB6_TRACERS = {TRACERS!r}\n\n")
        f.write(f"CB6_TRACER_SOL = {tr_sol!r}\n\n")
        f.write(f"REACT_IDX = _onp.array({react_idx!r}, "
                "dtype=_onp.int32)\n\n")
        f.write(f"STOICH = _onp.array({stoich!r})\n\n")
        f.write(_HELPERS)
        f.write('\n\ndef update_rconst(T, M, j):\n'
                '    """(216, ...) rate-constant vector; T/M '
                'broadcastable arrays, j a dict of\n    photolysis '
                'rates keyed by CB6 jval names (Update_rconst,\n'
                '    mod_cb6_Rates.F90:146-385 + the mod_cb6_Main '
                'constant block :117-152)."""\n'
                '    T = np.asarray(T)\n'
                '    rc = [None] * 216\n'
                f'{body}\n'
                '    return np.stack([np.broadcast_to('
                'np.asarray(v, dtype=T.dtype), T.shape)'
                ' for v in rc])\n')
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.exit(main())
