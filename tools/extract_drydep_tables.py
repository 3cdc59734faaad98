#!/usr/bin/env python
"""Extract the Zhang et al. (2003) gas dry-deposition constant tables
from ``Main/chemlib/mod_che_drydep.F90`` (per-landuse LAI/resistance
parameters :91-315, per-gas diffusivity/mesophyll/scaling tables
:215-360) into ``regcm_tpu/chem/_drydep_gas_data.py``.

Published scheme constants (Zhang, Brook & Vet 2003, ACP 3:2067),
regenerable from this extractor.
"""
import re
import sys

SRC = "/root/reference/Main/chemlib/mod_che_drydep.F90"
OUT = "/root/repo/regcm_tpu/chem/_drydep_gas_data.py"

ARRAYS = ["z01", "z02", "tmin", "tmax", "rsminz", "brs", "topt",
          "bvpd", "psi1", "psi2", "rac1", "rac2", "rcutdO", "rcutwO",
          "rgO", "rcutds", "rgs", "sdmax", "rm", "alphaz", "betaz",
          "mw"]
SIZES = {"rm": 31, "alphaz": 31, "betaz": 31, "mw": 31}


def _nums(body):
    body = re.sub(r"_rkx?\d*|_rk\d+", "", body).replace("&", " ")
    return [float(v.replace("d", "e").replace("D", "E"))
            for v in re.findall(
                r"[-+]?\d+\.?\d*(?:[eEdD][-+]?\d+)?", body)]


def main():
    text = open(SRC).read()
    out = {}
    for name in ARRAYS:
        m = re.search(rf"data\s+{name}\s*/(.*?)/\s*\n", text,
                      re.S | re.I)
        if not m:
            raise SystemExit(f"data {name} not found")
        vals = _nums(m.group(1))
        want = SIZES.get(name, 22)
        assert len(vals) == want, (name, len(vals))
        out[name.lower()] = vals
    # LAI: 20 per-row data statements (urban/suburban classes 21-22
    # are uninitialized in the reference; drydep_gas clamps lcov>20 to
    # 20, so rows 21/22 duplicate row 20), 15 columns
    lai = []
    for row in range(1, 21):
        m = re.search(rf"data \(lai\({row},kk\), kk = 1, 15\)/(.*?)/",
                      text, re.S)
        if not m:
            raise SystemExit(f"lai row {row} not found")
        vals = _nums(m.group(1))
        assert len(vals) == 15, (row, len(vals))
        lai.append(vals)
    lai.append(lai[19])
    lai.append(lai[19])
    with open(OUT, "w") as f:
        f.write('"""Zhang (2003) gas dry-deposition tables (generated '
                'by tools/extract_drydep_tables.py\nfrom '
                'Main/chemlib/mod_che_drydep.F90:91-360).  22 BATS '
                'landuse classes;\n31 deposited gas species; LAI '
                'columns 1-12 months + 13 annual? 14 min 15 max."""\n'
                "import numpy as np\n\n")
        for k, v in out.items():
            f.write(f"{k.upper()} = np.array({v!r})\n\n")
        f.write(f"LAI = np.array({lai!r})\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.exit(main())
