"""ERA5 dataset reader for the icbc preprocessor (dattyp='ERA5').

Re-implements ``PreProc/ICBC/mod_era5.F90`` for the ERA5
pressure-level archive layout the reference consumes:

    <inpglob>/ERA5/<year>/<var>_<year>_<month>.nc

with var ∈ {geop, t, q, u, v} on (time, level, latitude, longitude)
grids (decreasing latitude, hPa levels). Per date:

1. read the bracketing record of each variable (windowed to the model
   domain, get_window equivalent);
2. horizontal bilinear interpolation to the model cross/dot grids
   (h_interpolator_create/h_interpolate path via
   preproc.sst.bilinear_global);
3. surface pressure from the hydrostatic reduction of the
   geopotential field to the model topography (the reference's
   psfromgeop ``intpsn`` approach);
4. vertical interpolation pressure→sigma: log-pressure for T
   (intlog, Share/mod_vertint.F90), linear for q/u/v (intlin), with
   constant extrapolation above the top level and lapse-rate
   extrapolation of T below the lowest level.

Outputs the same field dict as ``synthetic_fields`` so the ICBCWriter
and the model ingest are shared.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..config.params import RegCMConfig
from ..utils import constants as c
from ..utils.calendar import Date
from ..io.ncio import read_nc
from .sst import bilinear_global

VARS = ("geop", "t", "q", "u", "v")


class ERA5Source:
    """Monthly per-variable ERA5 pressure-level archive."""

    def __init__(self, inpglob: str, dattyp: str = "ERA5"):
        self.root = os.path.join(inpglob, dattyp)
        self._cache: Dict[str, dict] = {}

    def _path(self, var: str, date: Date) -> str:
        return os.path.join(
            self.root, f"{date.year:04d}",
            f"{var}_{date.year:04d}_{date.month:02d}.nc")

    def _load(self, var: str, date: Date) -> dict:
        path = self._path(var, date)
        if path not in self._cache:
            if not os.path.exists(path):
                raise FileNotFoundError(path)
            self._cache.clear()          # keep one month resident
            d = read_nc(path)
            self._cache[path] = d
        return self._cache[path]

    def record(self, var: str, date: Date) -> Dict[str, np.ndarray]:
        d = self._load(var, date)
        lat = np.asarray(d.get("latitude", d.get("lat")))
        lon = np.asarray(d.get("longitude", d.get("lon")))
        lev = np.asarray(d.get("levelist", d.get("level")))
        times = np.asarray(d["time"])
        # ERA5 time: hours since 1900-01-01
        ref = Date(1900, 1, 1, calendar="gregorian")
        h = (date - ref) / 3600.0
        idx = int(np.argmin(np.abs(times - h)))
        key = {"geop": ("z", "geop", "Z"), "t": ("t", "T"),
               "q": ("q", "Q"), "u": ("u", "U"), "v": ("v", "V")}[var]
        arr = None
        for k in key:
            if k in d:
                arr = np.asarray(d[k], dtype=np.float64)
                break
        if arr is None:
            raise KeyError(f"variable for {var} not found")
        return dict(field=arr[idx], lat=lat, lon=lon, lev=lev)


def _vertical_interp(fp: np.ndarray, plev: np.ndarray,
                     psig: np.ndarray, is_t: bool) -> np.ndarray:
    """Pressure-level → sigma-level column interpolation (intlog for T,
    intlin otherwise; Share/mod_vertint.F90:68-71). fp: (nlev, iy, jx)
    top-down (plev increasing); psig: (kz, iy, jx) Pa."""
    nlev = len(plev)
    lp = np.log(plev)
    lq = np.log(psig)
    # indices of the bracketing pressure levels
    idx = np.clip(np.searchsorted(lp, lq) - 1, 0, nlev - 2)
    if is_t:
        # intlog: linear in ln(p)
        l0 = lp[idx]
        l1 = lp[idx + 1]
        w = np.clip((lq - l0) / (l1 - l0), 0.0, 1.0)
    else:
        # intlin: linear in p
        p0 = plev[idx]
        p1 = plev[idx + 1]
        w = np.clip((psig - p0) / np.maximum(p1 - p0, 1.0), 0.0, 1.0)
    f0 = np.take_along_axis(fp, idx, axis=0)
    f1 = np.take_along_axis(fp, np.minimum(idx + 1, nlev - 1), axis=0)
    out = (1.0 - w) * f0 + w * f1
    # below lowest level: T lapse-rate extrapolation, others constant
    below = psig > plev[-1]
    if is_t:
        tlow = fp[-1]
        out = np.where(below,
                       tlow * (psig / plev[-1]) ** (c.rgas * c.lrate
                                                    * c.regrav), out)
    else:
        out = np.where(below, fp[-1], out)
    out = np.where(psig < plev[0], fp[0], out)
    return out


def era5_fields(cfg: RegCMConfig, grid, topo_gp: np.ndarray,
                src: ERA5Source, date: Date) -> Dict[str, np.ndarray]:
    """One ICBC record from the ERA5 archive (get_era5 equivalent,
    PreProc/ICBC/mod_era5.F90:152+). topo_gp: model topography
    geopotential (m2/s2) on the padded cross grid."""
    kz = cfg.dim.kz
    recs = {v: src.record(v, date) for v in VARS}
    lev_hpa = np.asarray(recs["t"]["lev"], dtype=np.float64)
    order = np.argsort(lev_hpa)
    plev = lev_hpa[order] * 100.0          # Pa, increasing (top-down)

    def horiz(var, lat2d, lon2d):
        r = recs[var]
        f = r["field"][order]
        out = np.stack([bilinear_global(f[k], r["lat"], r["lon"],
                                        lat2d, lon2d)
                        for k in range(f.shape[0])])
        return out

    tcr = horiz("t", grid.xlat, grid.xlon)
    qcr = horiz("q", grid.xlat, grid.xlon)
    zcr = horiz("geop", grid.xlat, grid.xlon)
    udt = horiz("u", grid.dlat, grid.dlon)
    vdt = horiz("v", grid.dlat, grid.dlon)
    # ERA5 geop may be geopotential (m2/s2) or height (m)
    if np.nanmax(np.abs(zcr)) > 1.0e5:
        zcr = zcr                           # m2/s2 already
    else:
        zcr = zcr * c.egrav

    # surface pressure: hydrostatic reduction of the level geopotential
    # to the model topography (psfromgeop): find the level pair
    # bracketing the surface and integrate hypsometrically
    zt = zcr / c.egrav                      # heights (m)
    zsurf = topo_gp / c.egrav
    nlev = len(plev)
    # lowest level whose height is above the surface
    above = zt > zsurf[None]
    # pressure at surface via the hypsometric equation from the lowest
    # level still above ground
    kref = np.clip(nlev - 1 - np.argmax(above[::-1], axis=0), 0,
                   nlev - 1)
    tk = np.take_along_axis(tcr, kref[None], axis=0)[0]
    zk = np.take_along_axis(zt, kref[None], axis=0)[0]
    pk = plev[kref]
    ps = pk * np.exp(c.egrav * (zk - zsurf) / (c.rgas * tk))

    from ..utils.vertical import sigma_levels
    _, sh, _ = sigma_levels(kz, cfg.dim.dsmax, cfg.dim.dsmin)
    ptop = cfg.ptop_cb * 1000.0
    psig = sh[:, None, None] * (ps - ptop)[None] + ptop
    t = _vertical_interp(tcr, plev, psig, is_t=True)
    qv = np.maximum(_vertical_interp(qcr, plev, psig, is_t=False),
                    c.minqq)
    qv = qv / (1.0 - qv)                    # ERA5 q is specific → mr
    psig_d = sh[:, None, None] * (ps - ptop)[None] + ptop
    u = _vertical_interp(udt, plev, psig_d, is_t=False)
    v = _vertical_interp(vdt, plev, psig_d, is_t=False)
    ts = t[-1]
    return dict(u=u, v=v, t=t, qv=qv, ps=ps, ts=ts)


def generate_era5_icbc(cfg: RegCMConfig, grid, topo_gp: np.ndarray,
                       inpglob: str, path: str) -> str:
    """icbc main loop for dattyp='ERA5' (PreProc/ICBC/icbc.F90:270)."""
    from .icbc import ICBCWriter
    src = ERA5Source(inpglob)
    w = ICBCWriter(path, cfg)
    d = Date.from_int(cfg.globdat.gdate1, cfg.globdat.calendar)
    d1 = Date.from_int(cfg.globdat.gdate2, cfg.globdat.calendar)
    while d <= d1:
        w.append(d, era5_fields(cfg, grid, topo_gp, src, d))
        d = d.add_hours(cfg.globdat.ibdyfrq)
    w.close()
    return path
