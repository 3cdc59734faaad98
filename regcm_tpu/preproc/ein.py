"""ERA-Interim (EIN15/EIN25/EIN75) dataset reader for the icbc
preprocessor (dattyp='EIN15').

Re-implements ``PreProc/ICBC/mod_ein.F90`` for the archive layout the
reference consumes (headerein :102 + ein6hour :359):

    <inpglob>/EIN15/<year>/<var>.<year>.<hh>.nc

with one file per synoptic hour hh ∈ {00, 06, 12, 18} and
var ∈ {air, hgt, rhum, uwnd, vwnd} on (time, level, lat, lon) grids
(levels in hPa).  Unlike ERA5 the moisture variable is RELATIVE
HUMIDITY (%), converted to mixing ratio against the model's own
saturation formula after interpolation (the reference's rh→sph path).

Horizontal/vertical interpolation and the hydrostatic surface-pressure
reduction are shared with the ERA5 reader.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..config.params import RegCMConfig
from ..utils import constants as c
from ..utils.calendar import Date
from ..io.ncio import read_nc
from .sst import bilinear_global
from .era5 import _vertical_interp

VARS = ("air", "hgt", "rhum", "uwnd", "vwnd")


class EINSource:
    """Yearly per-variable, per-synoptic-hour ERA-Interim archive."""

    def __init__(self, inpglob: str, dattyp: str = "EIN15"):
        self.root = os.path.join(inpglob, dattyp)
        self._cache: Dict[str, dict] = {}

    def _path(self, var: str, date: Date) -> str:
        return os.path.join(
            self.root, f"{date.year:04d}",
            f"{var}.{date.year:04d}.{date.hour:02d}.nc")

    def _load(self, path: str) -> dict:
        if path not in self._cache:
            if not os.path.exists(path):
                raise FileNotFoundError(path)
            if len(self._cache) > 4:
                self._cache.clear()
            self._cache[path] = read_nc(path)
        return self._cache[path]

    def record(self, var: str, date: Date) -> Dict[str, np.ndarray]:
        d = self._load(self._path(var, date))
        lat = np.asarray(d.get("lat", d.get("latitude")))
        lon = np.asarray(d.get("lon", d.get("longitude")))
        lev = np.asarray(d.get("level", d.get("levelist")))
        times = np.asarray(d["time"])
        # NCEP-style: hours since 1900-01-01
        ref = Date(1900, 1, 1, calendar="gregorian")
        h = (date - ref) / 3600.0
        idx = int(np.argmin(np.abs(times - h)))
        arr = np.asarray(d[var], dtype=np.float64)
        return dict(field=arr[idx], lat=lat, lon=lon, lev=lev)


def ein_fields(cfg: RegCMConfig, grid, topo_gp: np.ndarray,
               src: EINSource, date: Date) -> Dict[str, np.ndarray]:
    """One ICBC record from the ERA-Interim archive (ein6hour,
    PreProc/ICBC/mod_ein.F90:359+)."""
    from ..utils.thermo import pfwsat
    import jax.numpy as jnp
    kz = cfg.dim.kz
    recs = {v: src.record(v, date) for v in VARS}
    lev_hpa = np.asarray(recs["air"]["lev"], dtype=np.float64)
    order = np.argsort(lev_hpa)
    plev = lev_hpa[order] * 100.0          # Pa, increasing (top-down)

    def horiz(var, lat2d, lon2d):
        r = recs[var]
        f = r["field"][order]
        return np.stack([bilinear_global(f[k], r["lat"], r["lon"],
                                         lat2d, lon2d)
                         for k in range(f.shape[0])])

    tcr = horiz("air", grid.xlat, grid.xlon)
    rhcr = horiz("rhum", grid.xlat, grid.xlon)
    zcr = horiz("hgt", grid.xlat, grid.xlon)       # heights (m)
    udt = horiz("uwnd", grid.dlat, grid.dlon)
    vdt = horiz("vwnd", grid.dlat, grid.dlon)

    # rh (%) → mixing ratio on the pressure levels
    p3 = plev[:, None, None] * np.ones_like(tcr)
    qs = np.asarray(pfwsat(jnp.asarray(tcr), jnp.asarray(p3)))
    qcr = np.clip(rhcr / 100.0, 0.0, 1.05) * qs

    # surface pressure from the hypsometric reduction (psfromgeop)
    zt = zcr
    zsurf = topo_gp / c.egrav
    nlev = len(plev)
    above = zt > zsurf[None]
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
    u = _vertical_interp(udt, plev, psig, is_t=False)
    v = _vertical_interp(vdt, plev, psig, is_t=False)
    return dict(u=u, v=v, t=t, qv=qv, ps=ps, ts=t[-1])


def generate_ein_icbc(cfg: RegCMConfig, grid, topo_gp: np.ndarray,
                      inpglob: str, path: str,
                      dattyp: str = "EIN15") -> str:
    """icbc main loop for dattyp='EIN15' (PreProc/ICBC/icbc.F90:270)."""
    from .icbc import ICBCWriter
    src = EINSource(inpglob, dattyp)
    w = ICBCWriter(path, cfg)
    d = Date.from_int(cfg.globdat.gdate1, cfg.globdat.calendar)
    d1 = Date.from_int(cfg.globdat.gdate2, cfg.globdat.calendar)
    while d <= d1:
        w.append(d, ein_fields(cfg, grid, topo_gp, src, d))
        d = d.add_hours(cfg.globdat.ibdyfrq)
    w.close()
    return path
