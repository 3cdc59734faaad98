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


def ncplot(ncpath: str, outdir: Optional[str] = None,
           launch_grads: bool = True):
    """``GrADSNcPlot`` equivalent (PostProc/GrADSNcPlot.F90): write
    the .ctl descriptor plus a display script and hand off to GrADS
    (``grads -l -c temp.gs``, :809-811) when the binary exists;
    otherwise render a matplotlib quick-look PNG per time-varying
    variable (lowest level, last record) — the same "open the stream
    and look at every field" workflow without the external GrADS
    dependency."""
    import shutil
    import subprocess

    from .. io.ncio import read_nc
    ctl = write_ctl(ncpath)
    outdir = outdir or os.path.dirname(os.path.abspath(ncpath))
    data = read_nc(ncpath)
    names = [n for n, a in data.items()
             if np.asarray(a).ndim >= 3 and n not in
             ("time", "xlat", "xlon", "topo")]
    gs = os.path.join(outdir, "temp.gs")
    with open(gs, "w") as f:
        f.write(f"'open {os.path.basename(ctl)}'\n")
        for n in names:
            f.write(f"'clear'\n'display {n}'\n"
                    f"'draw title {n}'\n'printim {n}.png'\n")
        f.write("'quit'\n")
    if launch_grads and shutil.which("grads"):
        subprocess.run(["grads", "-l", "-c", os.path.basename(gs)],
                       cwd=outdir, check=False)
        return [ctl, gs]
    # matplotlib fallback
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    made = [ctl, gs]
    for n in names:
        a = np.asarray(data[n])
        fld = a[-1]
        while fld.ndim > 2:
            fld = fld[-1]                       # lowest level
        fig, ax = plt.subplots(figsize=(6, 4.5))
        im = ax.pcolormesh(fld, shading="auto")
        fig.colorbar(im, ax=ax)
        ax.set_title(n)
        png = os.path.join(outdir, f"{n}.png")
        fig.savefig(png, dpi=90)
        plt.close(fig)
        made.append(png)
    return made


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="GrADS tooling (GrADSNcPrepare/GrADSNcPlot "
                    "equivalents)")
    ap.add_argument("ncfile")
    ap.add_argument("--out", default=None)
    ap.add_argument("--plot", action="store_true",
                    help="also render quick-look plots (GrADSNcPlot)")
    args = ap.parse_args(argv)
    if args.plot:
        for p in ncplot(args.ncfile, args.out):
            print("wrote", p)
    else:
        print("wrote", write_ctl(args.ncfile, args.out))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
