#!/usr/bin/env python
"""Extract the CBMZ chemical mechanism from the KPP-generated
reference sources into TPU-friendly tensors:

- ``mod_cbmz_function.F90`` ``fun`` (:44-286): the 124 reaction-rate
  products → a (124, 3) reactant-index table (into the concentration
  vector [58 var | 2 fix | 1.0]), plus literal rate constants; the
  vdot aggregation → a dense (58, 124) stoichiometry matrix.
- ``mod_cbmz_rates.F90`` ``update_rconst`` (:255-382) +
  ``mod_cbmz_main.F90`` constant rconst block (:102-132): each rate
  expression translated to Python source evaluated with (temp, c_m,
  jvals) vectors.

The chemical mechanism (CBMZ, Zaveri & Peters 1999) is public
science; this regenerable extraction carries the reaction data, not
program structure.  Output: ``regcm_tpu/chem/_cbmz_mech_data.py``.
"""
import re
import sys

SRC = "/root/reference/Main/chemlib/GAS_CBMZ_NEW"
OUT = "/root/repo/regcm_tpu/chem/_cbmz_mech_data.py"
NVAR, NFIX, NREACT = 58, 2, 124
ONE = NVAR + NFIX                 # index of the constant-1 slot


def read_joined(path):
    """Source with Fortran continuations joined."""
    lines = open(path).read().split("\n")
    out, cur = [], ""
    for ln in lines:
        ln = ln.split("!")[0].rstrip()
        if not ln.strip():
            continue
        cur += " " + ln.strip()
        if cur.rstrip().endswith("&"):
            cur = cur.rstrip()[:-1]
            continue
        out.append(cur.strip())
        cur = ""
    return out


def clean(expr):
    expr = re.sub(r"_[dr][pk]x?\d*", "", expr)
    return expr.replace(" ", "")


def parse_function():
    lines = read_joined(f"{SRC}/mod_cbmz_function.F90")
    react_idx = [[ONE, ONE, ONE] for _ in range(NREACT)]
    lit_const = [None] * NREACT
    stoich = [[0.0] * NREACT for _ in range(NVAR)]
    for ln in lines:
        m = re.match(r"a\((\d+)\)=(.*)$", clean(ln))
        if m:
            r = int(m.group(1)) - 1
            factors = m.group(2).split("*")
            slots = []
            for fct in factors:
                mv = re.match(r"v\((\d+)\)$", fct)
                mf = re.match(r"f\((\d+)\)$", fct)
                mr = re.match(r"rct\((\d+)\)$", fct)
                if mv:
                    slots.append(int(mv.group(1)) - 1)
                elif mf:
                    slots.append(NVAR + int(mf.group(1)) - 1)
                elif mr:
                    assert int(mr.group(1)) - 1 == r
                else:
                    lit_const[r] = float(fct.replace("e", "E")
                                         .replace("d", "E"))
            assert len(slots) <= 3, (r, slots)
            for i, sidx in enumerate(slots):
                react_idx[r][i] = sidx
            continue
        m = re.match(r"vdot\((\d+)\)=(.*)$", clean(ln))
        if m:
            i = int(m.group(1)) - 1
            expr = m.group(2)
            # split into signed terms
            terms = re.findall(r"[+-]?[^+-]+", expr)
            for t in terms:
                sign = -1.0 if t.startswith("-") else 1.0
                t = t.lstrip("+-")
                mm = re.match(r"(?:([\d.]+)\*)?a\((\d+)\)$", t)
                assert mm, (i, t)
                coeff = float(mm.group(1)) if mm.group(1) else 1.0
                stoich[i][int(mm.group(2)) - 1] += sign * coeff
    return react_idx, lit_const, stoich


# translation of the rate-law helper calls into Python expressions
# operating on vectors T (temp) and M (c_m); jval('name') indexes the
# photolysis dict.  Mirrors mod_cbmz_rates.F90:42-248.
_HELPERS = '''
def _arr2(a0, b0, T):
    return a0 * np.exp(b0 / T)


def _arr3(a0, b0, a1, b1, T, M):
    k1 = a0 * M * (300.0 / T) ** b0
    k2 = a1 * (300.0 / T) ** b1
    ex = 1.0 / (1.0 + np.log(k1 / k2) ** 2)
    return (k2 * k1 * M) / (k2 + k1 * M) * 0.6 ** ex


def _cbz1(T, M):
    ka = 7.2e-15 * np.exp(785.0 / T)
    kb = 1.9e-33 * np.exp(725.0 / T)
    kc = 4.1e-16 * np.exp(1440.0 / T)
    return (ka + M * kb) / (1.0 + (M * kb / kc))


def _cbz2(T, M):
    return 2.3e-13 * np.exp(600.0 / T) + M * 1.7e-33 * np.exp(1000.0 / T)


def _kdms(T):
    k0 = T * np.exp(-234.0 / T)
    k1 = 8.46e-10 * np.exp(7230.0 / T)
    k2 = 2.68e-10 * np.exp(7810.0 / T)
    k3 = 1.04e11 * T
    k4 = 88.1 * np.exp(7460.0 / T)
    return (k0 + k1 + k2) / (k3 + k4)
'''


def translate_rates():
    """update_rconst body → list of (index, python_expr)."""
    lines = read_joined(f"{SRC}/mod_cbmz_rates.F90")
    main_lines = read_joined(f"{SRC}/mod_cbmz_main.F90")
    exprs = {}

    def conv(expr):
        e = clean(expr)
        e = re.sub(r"jval_(\w+)", r"j['\1']", e)
        e = e.replace("arr2(", "_arr2(").replace("arr3(", "_arr3(")
        e = e.replace("cbz1(temp,c_m)", "_cbz1(T,M)")
        e = e.replace("cbz2(temp,c_m)", "_cbz2(T,M)")
        e = e.replace("kdms(temp)", "_kdms(T)")
        e = e.replace("temp", "T").replace("c_m", "M")
        # append the T (and M) arguments to helper calls
        e = re.sub(r"_arr2\(([^()]*)\)", r"_arr2(\1,T)", e)
        e = re.sub(r"_arr3\(([^()]*)\)", r"_arr3(\1,T,M)", e)
        return e

    grab = False
    for ln in lines:
        if "subroutine update_rconst" in ln:
            grab = True
            continue
        if grab and "end subroutine" in ln:
            break
        if grab:
            m = re.match(r"rconst\((\d+)\)\s*=\s*(.*)$", ln.strip())
            if m:
                exprs[int(m.group(1))] = conv(m.group(2))
    # constant coefficients from chemmain (mod_cbmz_main.F90:102-132)
    for ln in main_lines:
        m = re.match(r"rconst\((\d+)\)=(.*)$", clean(ln))
        if m and int(m.group(1)) not in exprs:
            exprs[int(m.group(1))] = m.group(2).replace("e", "E") \
                .replace("E", "e", 1) if False else m.group(2)
    missing = [i for i in range(1, NREACT + 1) if i not in exprs]
    assert not missing, missing
    return exprs


def main():
    react_idx, lit_const, stoich = parse_function()
    exprs = translate_rates()
    # cross-check literal constants in fun vs the rconst table
    for r, litv in enumerate(lit_const):
        if litv is not None:
            ev = float(eval(exprs[r + 1], {"np": __import__("numpy")},
                            {}))
            assert abs(ev - litv) < 1e-25 + 1e-9 * abs(litv), \
                (r + 1, litv, ev)

    species = ['CO2', 'H2SO4', 'HCOOH', 'RCOOH', 'MSA', 'DUMMY',
               'PAN', 'TOL', 'O1D', 'H2O2', 'SO2', 'XYL', 'CH4',
               'C2H6', 'CRO', 'DMS', 'HNO4', 'H2', 'TO2', 'CH3OH',
               'HNO2', 'CH3OOH', 'ETHOOH', 'N2O5', 'ETH', 'CRES',
               'O3P', 'CO', 'HNO3', 'PAR', 'OPEN', 'ISOPN', 'ISOPP',
               'ISOPO2', 'H2O', 'AONE', 'OLEI', 'ISOP', 'HCHO',
               'OLET', 'XO2', 'MGLY', 'ETHP', 'NAP', 'ALD2', 'CH3O2',
               'ISOPRD', 'ANO2', 'ROOH', 'RO2', 'ONIT', 'HO2', 'O3',
               'OH', 'NO', 'NO2', 'NO3', 'C2O3']

    # molecular weights per CBMZ species (mod_che_molwg.F90 w_* +
    # mw_cbmz table :150-210), g/mol; arbitrary weights for
    # chemistry-only intermediates exactly as the reference
    mw = {'CO2': 44.0, 'H2SO4': 98.0, 'HCOOH': 46.0, 'RCOOH': 59.1,
          'MSA': 96.0, 'DUMMY': 1.0, 'PAN': 121.0, 'TOL': 92.0,
          'O1D': 16.0, 'H2O2': 34.0, 'SO2': 64.0, 'XYL': 106.0,
          'CH4': 16.0, 'C2H6': 30.07, 'CRO': 48.0, 'DMS': 62.0,
          'HNO4': 79.0, 'H2': 2.0, 'TO2': 32.0, 'CH3OH': 32.0,
          'HNO2': 47.0, 'CH3OOH': 48.0, 'ETHOOH': 74.0,
          'N2O5': 108.0, 'ETH': 28.0, 'CRES': 108.0, 'O3P': 48.0,
          'CO': 28.0, 'HNO3': 63.0, 'PAR': 44.0, 'OPEN': 1.0,
          'ISOPN': 68.0, 'ISOPP': 68.0, 'ISOPO2': 68.0, 'H2O': 18.0,
          'AONE': 72.0, 'OLEI': 56.0, 'ISOP': 68.0, 'HCHO': 30.0,
          'OLET': 42.0, 'XO2': 47.0, 'MGLY': 72.0, 'ETHP': 28.0,
          'NAP': 1.0, 'ALD2': 44.0, 'CH3O2': 47.0, 'ISOPRD': 68.0,
          'ANO2': 46.0, 'ROOH': 48.0, 'RO2': 47.0, 'ONIT': 119.0,
          'HO2': 33.0, 'O3': 48.0, 'OH': 17.0, 'NO': 30.0,
          'NO2': 46.0, 'NO3': 62.0, 'C2O3': 72.0}
    mw_list = [mw[s] for s in species]
    # transported tracer set for chemsimtype='CBMZ' (ntr=37,
    # mod_che_common.F90:384-399) + solubility (SO2 only; gas wet dep
    # goes through sethet, not chtrsol)
    tracers = ['NO', 'NO2', 'N2O5', 'HNO2', 'HNO3', 'HNO4', 'O3',
               'H2O2', 'CO', 'SO2', 'DMS', 'H2SO4', 'CH4', 'C2H6',
               'PAR', 'CH3OH', 'HCHO', 'ALD2', 'AONE', 'ETH', 'OLET',
               'OLEI', 'TOL', 'XYL', 'ISOP', 'ONIT', 'PAN', 'HCOOH',
               'RCOOH', 'CH3OOH', 'ETHOOH', 'ROOH', 'MGLY', 'ISOPRD',
               'ISOPN', 'OPEN', 'CRES']
    for t in tracers:
        assert t in species, t
    tr_sol = [0.6 if t == "SO2" else 0.0 for t in tracers]

    body = "\n".join(
        f"    rc[{i - 1}] = {e}" for i, e in sorted(exprs.items()))
    with open(OUT, "w") as f:
        f.write('"""CBMZ gas-phase mechanism tables (generated by '
                'tools/extract_cbmz.py from the\nKPP-generated '
                'reference sources '
                'Main/chemlib/GAS_CBMZ_NEW/mod_cbmz_*.F90).\n\n'
                '58 variable species + 2 fixed (O2, N2) + a '
                'constant-1 slot; 124 reactions,\neach a product of '
                'rconst and up to three concentration factors; '
                'dense\n(58, 124) stoichiometry.  Zaveri & Peters '
                '(1999) public mechanism data.\n\n'
                'Tables are NumPy; the rate function uses jax.numpy '
                'so it traces under jit\n(works eagerly on concrete '
                'f64 inputs for the oracles too)."""\n'
                "import numpy as _onp\nimport jax.numpy as np\n\n")
        f.write(f"NVAR, NFIX, NREACT = {NVAR}, {NFIX}, {NREACT}\n")
        f.write(f"SPECIES = {species!r}\n\n")
        f.write(f"MW = _onp.array({mw_list!r})\n\n")
        f.write(f"CBMZ_TRACERS = {tracers!r}\n\n")
        f.write(f"CBMZ_TRACER_SOL = {tr_sol!r}\n\n")
        f.write(f"REACT_IDX = _onp.array({react_idx!r}, "
                "dtype=_onp.int32)\n\n")
        f.write(f"STOICH = _onp.array({stoich!r})\n\n")
        f.write(_HELPERS)
        f.write('\n\ndef update_rconst(T, M, j):\n'
                '    """(124, ...) rate-constant vector; T/M '
                'broadcastable arrays, j a dict of\n    photolysis '
                'rates (update_rconst, mod_cbmz_rates.F90:255-382 + '
                'the\n    chemmain constant block)."""\n'
                '    T = np.asarray(T)\n'
                '    shape = (124,) + T.shape\n'
                '    rc = [None] * 124\n'
                f'{body}\n'
                '    return np.stack([np.broadcast_to('
                'np.asarray(v, dtype=T.dtype), T.shape)'
                ' for v in rc])\n')
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.exit(main())
