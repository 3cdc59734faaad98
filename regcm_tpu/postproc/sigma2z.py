"""sigma→height postprocessor (``sigma2z`` executable equivalent,
``PostProc/sigma2z.F90:25-750``): interpolates ATM output files from
model sigma levels to fixed height levels. Heights are built
hydrostatically from T (``htsig``, ``Share/mod_hgt.F90:527-558``) and
fields interpolated linearly in z with zero-derivative extrapolation
(``intlinz``, ``Share/mod_vertint.F90:1040-1131``).
"""
from __future__ import annotations

import numpy as np

from ..io.ncio import NCWriter, read_nc
from ..utils import constants as c

# PostProc/sigma2z.F90:92-93
ZLEVS = np.array([20., 50., 80., 100., 150., 200., 500., 750., 1000.,
                  1500., 2000., 5000., 7000., 10000.], dtype=np.float64)


def htsig(t, p_half, ps_pa, topo):
    """Hydrostatic MSL heights of half levels (kz, iy, jx), model
    top-down order (mod_hgt.F90 htsig: h_bot from surface, then
    integrate upward with layer-mean T)."""
    rovg = c.rgas * c.regrav
    kz = t.shape[0]
    h = np.empty_like(t)
    h[kz - 1] = topo + rovg * t[kz - 1] * np.log(ps_pa / p_half[kz - 1])
    for k in range(kz - 2, -1, -1):
        tbar = 0.5 * (t[k] + t[k + 1])
        h[k] = h[k + 1] + rovg * tbar * np.log(p_half[k + 1] / p_half[k])
    return h


def intlinz(f, hz, zlevs):
    """Linear-in-z interpolation of f(kz, iy, jx) at heights hz (same
    shape, decreasing with k) onto zlevs (nz,) m MSL. Out-of-range →
    nearest level (zero vertical derivative)."""
    kz, iy, jx = f.shape
    out = np.empty((len(zlevs), iy, jx), dtype=f.dtype)
    ii, jj = np.meshgrid(np.arange(iy), np.arange(jx), indexing="ij")
    for n, z in enumerate(zlevs):
        above = (hz > z).sum(axis=0)          # levels above target
        kx = np.clip(above, 1, kz - 1)        # level below (higher k)
        knx = kx - 1
        h_up = hz[knx, ii, jj]
        h_dn = hz[kx, ii, jj]
        wz = np.clip((h_up - z) / np.maximum(h_up - h_dn, 1e-10),
                     0.0, 1.0)
        out[n] = f[knx, ii, jj] * (1.0 - wz) + f[kx, ii, jj] * wz
    return out


def sigma2z(atm_path: str, out_path: str,
            zlevs: np.ndarray = ZLEVS) -> str:
    """Convert one ATM stream file to height levels."""
    d = read_nc(atm_path)
    sig = d["sigma"]
    ps = d["ps"]                              # (nt, iy, jx) hPa
    nt, iy, jx = ps.shape
    ptop_pa = 5000.0
    if "ptop" in d and not hasattr(d["ptop"], "shape"):
        ptop_pa = float(d["ptop"]) * 1000.0
    topo = d.get("topo", np.zeros((iy, jx)))
    w = NCWriter(out_path, dims={"iy": iy, "jx": jx, "zlev": len(zlevs)},
                 attrs={"title": "regcm_tpu height-level output"})
    w.def_static("zlev", ("zlev",), zlevs, "m", "Height level")
    for name in ("xlat", "xlon", "topo"):
        if name in d:
            w.def_static(name, ("iy", "jx"), d[name])
    vars3 = [k for k in ("ta", "ua", "va", "hus", "clw") if k in d]
    for name in vars3:
        w.def_time_var(name, ("zlev", "iy", "jx"))
    w.def_time_var("ps", ("iy", "jx"), "hPa", "Surface pressure")
    for it in range(nt):
        ps_pa = ps[it] * 100.0
        p_half = (sig[:, None, None] * (ps_pa[None] - ptop_pa) + ptop_pa)
        hz = htsig(d["ta"][it], p_half, ps_pa, topo)
        fields = {"ps": ps[it]}
        for name in vars3:
            fields[name] = intlinz(d[name][it], hz, zlevs)
        w.write_record(float(d["time"][it]), fields)
    w.close()
    return out_path


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="sigma2z postprocessor")
    ap.add_argument("atmfile")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args(argv)
    out = args.output or args.atmfile.replace(".nc", "_zlev.nc")
    sigma2z(args.atmfile, out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
