"""NCEP/NCAR reanalysis reader for the icbc preprocessor
(dattyp='NNRP1'/'NNRP2').

Re-implements ``PreProc/ICBC/mod_ncep.F90`` (init_ncep :80, get_ncep
:218, cdc6hour :410) for the CDC yearly archive layout:

    <inpglob>/<dattyp>/<year>/{air,hgt,rhum,uwnd,vwnd}.<year>.nc

on (time, level, lat, lon) grids, levels in hPa DECREASING from 1000,
variables packed int16 with scale_factor/add_offset. Per date:

1. read the 6-hourly record of each variable; unpack; NNRP1 relative
   humidity exists only on the lowest 8 levels — levels above are
   filled with 0.01 (mod_ncep.F90:430-447, the reference's rhum
   nlev=8 special case);
2. horizontal bilinear interpolation to model cross/dot grids;
3. surface pressure by hydrostatic reduction of the geopotential
   heights to the model topography (intgtb/intpsn path);
4. vertical interpolation p→sigma (intlog for T, intlin otherwise)
   shared with the ERA5 reader;
5. relative humidity → water-vapor mixing ratio on model levels
   (rh2mxr, Share/mod_humid.F90:218).

Outputs the same field dict as ``synthetic_fields`` so ICBCWriter and
the model ingest are shared.
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


def _unpack(arr: np.ndarray, attrs: dict) -> np.ndarray:
    """Apply CDC int16 packing (scale_factor/add_offset, missing →
    NaN)."""
    out = np.asarray(arr, dtype=np.float64)
    fill = attrs.get("_FillValue", attrs.get("missing_value"))
    if fill is not None:
        out = np.where(np.asarray(arr) == np.asarray(fill), np.nan,
                       out)
    scale = float(np.ravel(attrs.get("scale_factor", [1.0]))[0])
    off = float(np.ravel(attrs.get("add_offset", [0.0]))[0])
    return out * scale + off


class NCEPSource:
    """Yearly per-variable NNRP archive (one file per var per year)."""

    def __init__(self, inpglob: str, dattyp: str = "NNRP1"):
        self.root = os.path.join(inpglob, dattyp)
        self.dattyp = dattyp
        self._cache: Dict[str, tuple] = {}

    def _path(self, var: str, year: int) -> str:
        return os.path.join(self.root, f"{year:04d}",
                            f"{var}.{year:04d}.nc")

    def _load(self, var: str, year: int):
        path = self._path(var, year)
        if path not in self._cache:
            if not os.path.exists(path):
                raise FileNotFoundError(path)
            if len(self._cache) > 6:
                self._cache.clear()
            self._cache[path] = read_nc(path, with_attrs=True)
        return self._cache[path]

    def record(self, var: str, date: Date) -> Dict[str, np.ndarray]:
        d, attrs = self._load(var, date.year)
        lat = np.asarray(d.get("lat", d.get("latitude")),
                         dtype=np.float64)
        lon = np.asarray(d.get("lon", d.get("longitude")),
                         dtype=np.float64)
        lev = np.asarray(d["level"], dtype=np.float64)
        times = np.asarray(d["time"], dtype=np.float64)
        # CDC time: hours since 1800-01-01
        ref = Date(1800, 1, 1, calendar="gregorian")
        h = (date - ref) / 3600.0
        idx = int(np.argmin(np.abs(times - h)))
        if abs(times[idx] - h) > 3.0:
            raise KeyError(f"{var}: no record near {date}")
        f = _unpack(d[var][idx], attrs.get(var, {}))
        return dict(field=f, lat=lat, lon=lon, lev=lev)


def ncep_fields(cfg: RegCMConfig, grid, topo_gp: np.ndarray,
                src: NCEPSource, date: Date) -> Dict[str, np.ndarray]:
    """One ICBC record from the NNRP archive (get_ncep equivalent,
    mod_ncep.F90:218-294)."""
    kz = cfg.dim.kz
    recs = {v: src.record(v, date) for v in VARS}
    lev_t = np.asarray(recs["air"]["lev"], dtype=np.float64)
    order = np.argsort(lev_t)
    plev = lev_t[order] * 100.0             # Pa, increasing top-down
    nlev = len(plev)

    def expand_rh(r):
        """NNRP1 rhum stops at 300 hPa (8 levels) — fill 0.01 above
        (mod_ncep.F90:430-447)."""
        f = r["field"]
        rl = np.asarray(r["lev"], dtype=np.float64)
        out = np.full((nlev,) + f.shape[1:], 0.01)
        for k, pv in enumerate(rl):
            j = int(np.argmin(np.abs(lev_t - pv)))
            out[j] = f[k]
        return out

    def horiz(f, r, lat2d, lon2d):
        f = np.where(np.isnan(f), np.nanmean(f, axis=(-2, -1),
                                             keepdims=True), f)
        return np.stack([bilinear_global(f[k], r["lat"], r["lon"],
                                         lat2d, lon2d)
                         for k in range(f.shape[0])])

    rh_full = expand_rh(recs["rhum"])[order] * 0.01   # % → fraction
    tcr = horiz(recs["air"]["field"][order], recs["air"],
                grid.xlat, grid.xlon)
    zcr = horiz(recs["hgt"]["field"][order], recs["hgt"],
                grid.xlat, grid.xlon)
    rhc = horiz(rh_full, recs["rhum"], grid.xlat, grid.xlon)
    udt = horiz(recs["uwnd"]["field"][order], recs["uwnd"],
                grid.dlat, grid.dlon)
    vdt = horiz(recs["vwnd"]["field"][order], recs["vwnd"],
                grid.dlat, grid.dlon)
    rhc = np.clip(rhc, 0.01, 1.0)

    # surface pressure: hypsometric reduction from the lowest level
    # still above the model surface (intgtb/intpsn)
    zsurf = topo_gp / c.egrav
    above = zcr > zsurf[None]
    kref = np.clip(nlev - 1 - np.argmax(above[::-1], axis=0), 0,
                   nlev - 1)
    tk = np.take_along_axis(tcr, kref[None], axis=0)[0]
    zk = np.take_along_axis(zcr, kref[None], axis=0)[0]
    pk = plev[kref]
    ps = pk * np.exp(c.egrav * (zk - zsurf) / (c.rgas * tk))

    from ..utils.vertical import sigma_levels
    _, sh, _ = sigma_levels(kz, cfg.dim.dsmax, cfg.dim.dsmin)
    ptop = cfg.ptop_cb * 1000.0
    psig = sh[:, None, None] * (ps - ptop)[None] + ptop
    t = _vertical_interp(tcr, plev, psig, is_t=True)
    rh = _vertical_interp(rhc, plev, psig, is_t=False)
    u = _vertical_interp(udt, plev, psig, is_t=False)
    v = _vertical_interp(vdt, plev, psig, is_t=False)
    # rh2mxr (Share/mod_humid.F90:218): qv = rh·qs(t, p)
    import jax.numpy as jnp
    from ..utils.thermo import pfwsat
    qs = np.asarray(pfwsat(jnp.asarray(t), jnp.asarray(psig)))
    qv = np.maximum(rh * qs, c.minqq)
    ts = t[-1]
    return dict(u=u, v=v, t=t, qv=qv, ps=ps, ts=ts)


def generate_ncep_icbc(cfg: RegCMConfig, grid, topo_gp: np.ndarray,
                       inpglob: str, path: str,
                       dattyp: str = "NNRP1") -> str:
    """icbc main loop for dattyp='NNRP*' (PreProc/ICBC/icbc.F90:273)."""
    from .icbc import ICBCWriter
    src = NCEPSource(inpglob, dattyp)
    w = ICBCWriter(path, cfg)
    d = Date.from_int(cfg.globdat.gdate1, cfg.globdat.calendar)
    d1 = Date.from_int(cfg.globdat.gdate2, cfg.globdat.calendar)
    while d <= d1:
        w.append(d, ncep_fields(cfg, grid, topo_gp, src, d))
        d = d.add_hours(cfg.globdat.ibdyfrq)
    w.close()
    return path
