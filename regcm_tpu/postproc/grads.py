"""GrADS descriptor generation (the ``GrADSNcPrepare`` equivalent,
``PostProc/GrADSNcPrepare.F90``).

Writes a GrADS .ctl control file pointing at one of the model's NetCDF
stream files (via GrADS' xdfopen/sdfopen pathway: DSET + the variable
table with dimension declarations), so the reference's GrADS-based
plotting workflow opens this framework's output directly."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..io.ncio import read_nc


def write_ctl(ncpath: str, ctlpath: Optional[str] = None) -> str:
    """Generate a .ctl for a stream file (GrADSNcPrepare)."""
    data = read_nc(ncpath)
    ctlpath = ctlpath or os.path.splitext(ncpath)[0] + ".ctl"
    times = np.asarray(data.get("time", [0.0]))
    nt = len(times)
    dt_h = float(times[1] - times[0]) if nt > 1 else 6.0
    # pick grid shape from any 2-D/3-D variable
    iy = jx = kz = None
    var3, var2 = [], []
    for name, arr in data.items():
        a = np.asarray(arr)
        if name in ("time", "xlat", "xlon", "sigma", "topo"):
            continue
        if a.ndim == 4:
            kz = a.shape[1]
            iy, jx = a.shape[2], a.shape[3]
            var3.append(name)
        elif a.ndim == 3:
            iy, jx = a.shape[1], a.shape[2]
            var2.append(name)
    if iy is None:
        raise ValueError(f"no time-varying fields in {ncpath}")
    xlat = np.asarray(data.get("xlat"))
    xlon = np.asarray(data.get("xlon"))
    lat0, dlat = (float(xlat.min()),
                  float((xlat.max() - xlat.min())
                        / max(iy - 1, 1))) if xlat is not None \
        else (0.0, 1.0)
    lon0, dlon = (float(xlon.min()),
                  float((xlon.max() - xlon.min())
                        / max(jx - 1, 1))) if xlon is not None \
        else (0.0, 1.0)
    dtinc = max(int(round(dt_h)), 1)
    lines = [
        f"DSET ^{os.path.basename(ncpath)}",
        "DTYPE netcdf",
        "TITLE regcm_tpu output",
        "UNDEF -1e30",
        f"XDEF {jx} LINEAR {lon0:.4f} {dlon:.6f}",
        f"YDEF {iy} LINEAR {lat0:.4f} {dlat:.6f}",
        f"ZDEF {kz or 1} LINEAR 1 1",
        f"TDEF {nt} LINEAR 00Z01JAN1990 {dtinc}hr",
        f"VARS {len(var3) + len(var2)}",
    ]
    for v in var3:
        lines.append(f"{v}=>{v} {kz} t,z,y,x 3-D field")
    for v in var2:
        lines.append(f"{v}=>{v} 0 t,y,x 2-D field")
    lines.append("ENDVARS")
    with open(ctlpath, "w") as f:
        f.write("\n".join(lines) + "\n")
    return ctlpath


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="GrADS ctl generator (GrADSNcPrepare equivalent)")
    ap.add_argument("ncfile")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    print("wrote", write_ctl(args.ncfile, args.out))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
