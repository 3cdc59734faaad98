"""CMIP5 6hrLev GCM readers for the icbc preprocessor
(dattyp='MP_RF'/'MP_45'/... for MPI-ESM-MR, 'HA_RF'/... for
HadGEM2-ES).

Re-implements the generic GCM path of ``PreProc/ICBC/mod_gn6hnc.F90``
with the filename/variable conventions of
``mod_mpiesm_helper.F90`` and ``mod_hadgem_helper.F90``:

- MPI-ESM-MR: monthly per-variable files
  ``<inpglob>/MPI-ESM-MR/<scen>/<var>/
    <var>_6hrLev_MPI-ESM-MR_<exp>_r1i1p1_<YYYYMM0100>00-<…>00.nc``
  with vars ta/hus/ua/va on hybrid levels (ap + b·aps, 'aps' in each
  file) and 'geosp' orography (helper :96-130).
- HadGEM2-ES: quarterly per-variable files (historical: quarters
  starting Mar/Jun/Sep/Dec day 1 hour 6, helper :146-171) with vars
  ta/hus/ua/va, 'orog' in the ta file, and surface pressure in
  separate Dec→Dec yearly 'ps' files (:124-133); levels are treated
  through the same ak + bk·ps form the reference applies
  (mod_gn6hnc.F90:1623).

Processing per date (get_gn6hnc equivalent): unpack the 6-hourly
record, build per-column hybrid pressures p = a + b·ps, interpolate
horizontally to the model cross/dot grids, reduce surface pressure to
the model topography hypsometrically from the GCM orography and
lowest-level temperature, then interpolate hybrid→sigma per column
(log-p for T, linear otherwise — the reference goes through an
intermediate pressure-level set, mod_gn6hnc.F90:998-1030; collapsing
the two interpolations into one is the single documented deviation).
Specific humidity converts to mixing ratio (sph2mxr).
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

ATM_VARS = ("ta", "hus", "ua", "va")


def _mpiesm_path(root: str, var: str, date: Date, scen: str) -> str:
    y2, m2 = date.year, date.month + 1
    if m2 > 12:
        m2, y2 = 1, y2 + 1
    d1 = f"{date.year:04d}{date.month:02d}0100"
    d2 = f"{y2:04d}{m2:02d}0100"
    exp = "historical" if scen == "RF" else f"rcp{scen[3:]}"
    base = f"_6hrLev_MPI-ESM-MR_{exp}_r1i1p1_"
    return os.path.join(root, "MPI-ESM-MR", scen, var,
                        f"{var}{base}{d1}00-{d2}00.nc")


def _hadgem_path(root: str, var: str, date: Date) -> str:
    """Historical (RF) conventions (mod_hadgem_helper.F90:124-171)."""
    y, m, d, h = date.year, date.month, date.day, date.hour
    if var == "ps":
        # Dec 2 (y-1) 06 → Dec 2 (y) 00 yearly file
        inow = y * 1000000 + m * 10000 + d * 100 + h
        icheck = y * 1000000 + 120200
        if inow > icheck:
            y = y + 1
        d1 = f"{y - 1:04d}1202" + "06"
        d2 = f"{y:04d}1202" + "00"
    else:
        # quarter starting Mar/Jun/Sep/Dec 1, hour 6
        yy = y
        mm = (m // 3) * 3
        if mm == 0:
            yy, mm = y - 1, 12
        icheck = yy * 1000000 + mm * 10000 + 106
        inow = y * 1000000 + m * 10000 + d * 100 + h
        if inow < icheck:
            mm -= 3
            if mm == 0:
                yy, mm = yy - 1, 12
        d1 = f"{yy:04d}{mm:02d}0106"
        mm2, yy2 = mm + 3, yy
        if mm2 > 12:
            mm2, yy2 = 3, yy + 1
        d2 = f"{yy2:04d}{mm2:02d}0100"
    base = "_6hrLev_HadGEM2-ES_historical_r1i1p1_"
    return os.path.join(root, "HadGEM2-ES", "RF", var,
                        f"{var}{base}{d1}-{d2}.nc")


class GCMSource:
    """Generic CMIP5 6hrLev archive (gn6hnc equivalent) for the
    MPI-ESM-MR ('MP_xx') and HadGEM2-ES ('HA_xx') conventions."""

    def __init__(self, inpglob: str, dattyp: str):
        self.root = inpglob
        self.dattyp = dattyp
        self.kind = dattyp[:3]
        if self.kind not in ("MP_", "HA_"):
            raise ValueError(
                f"dattyp {dattyp!r}: GCMSource supports MP_* "
                f"(MPI-ESM-MR) and HA_* (HadGEM2-ES); other CMIP "
                f"helpers (mod_{{canesm,ccsm4,...}}_helper.F90) are "
                f"not ported")
        self.scen = "RF" if dattyp[3:5] == "RF" else "RCP" + dattyp[3:5]
        self._cache: Dict[str, dict] = {}
        # HadGEM time axes are model-dependent (360-day); resolve
        # records by offset from the file-name start date instead
        self.calendar = "360_day" if self.kind == "HA_" else "gregorian"

    def _path(self, var: str, date: Date) -> str:
        if self.kind == "MP_":
            return _mpiesm_path(self.root, var, date, self.scen)
        return _hadgem_path(self.root, var, date)

    def _load(self, path: str) -> dict:
        if path not in self._cache:
            if not os.path.exists(path):
                raise FileNotFoundError(path)
            if len(self._cache) > 6:
                self._cache.clear()
            self._cache[path] = read_nc(path)
        return self._cache[path]

    def _hours_into_file(self, date: Date) -> float:
        # hours since the file's first record. The namelist date is
        # reinterpreted field-wise in the SOURCE calendar (HadGEM runs
        # use calendar='360_day' end to end, as in the reference)
        dd = Date(date.year, date.month, date.day, date.hour,
                  calendar=self.calendar)
        if self.kind == "MP_":
            start = Date(date.year, date.month, 1,
                         calendar=self.calendar)
        else:
            # infer quarter start from the path logic
            p = os.path.basename(self._path("ta", date))
            d1 = p.split("_r1i1p1_")[1][:10]
            start = Date(int(d1[:4]), int(d1[4:6]), int(d1[6:8]),
                         int(d1[8:10]), calendar=self.calendar)
        return (dd - start) / 3600.0

    def record(self, date: Date) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        first = None
        for var in ATM_VARS:
            d = self._load(self._path(var, date))
            if first is None:
                first = d
            it = int(np.argmin(np.abs(
                (np.asarray(d["time"], np.float64)
                 - np.asarray(d["time"], np.float64)[0])
                - self._hours_into_file(date))))
            out[var] = np.asarray(d[var][it], dtype=np.float64)
        lat = np.asarray(first.get("lat", first.get("latitude")),
                         dtype=np.float64)
        lon = np.asarray(first.get("lon", first.get("longitude")),
                         dtype=np.float64)
        # hybrid coefficients: ap/b (Pa), or hyam/hybm with p0, or
        # lev/b (HadGEM form, used as ak+bk·ps per the reference)
        if "ap" in first:
            ak = np.asarray(first["ap"], np.float64)
            bk = np.asarray(first["b"], np.float64)
        elif "hyam" in first:
            p0 = float(np.ravel(first.get("p0", [1.0e5]))[0])
            ak = np.asarray(first["hyam"], np.float64) * p0
            bk = np.asarray(first["hybm"], np.float64)
        else:
            ak = np.asarray(first["lev"], np.float64)
            bk = np.asarray(first["b"], np.float64)
        # surface pressure
        if self.kind == "MP_":
            dps = self._load(self._path("ta", date))
            psv = dps["aps"]
            it = int(np.argmin(np.abs(
                (np.asarray(dps["time"], np.float64)
                 - np.asarray(dps["time"], np.float64)[0])
                - self._hours_into_file(date))))
            ps = np.asarray(psv[it], dtype=np.float64)
            zs = np.asarray(dps["geosp"], np.float64) * c.regrav
        else:
            dps = self._load(self._path("ps", date))
            tps = np.asarray(dps["time"], np.float64)
            p = os.path.basename(self._path("ps", date))
            d1 = p.split("_r1i1p1_")[1][:10]
            start = Date(int(d1[:4]), int(d1[4:6]), int(d1[6:8]),
                         int(d1[8:10]), calendar=self.calendar)
            dd = Date(date.year, date.month, date.day, date.hour,
                      calendar=self.calendar)
            hh = (dd - start) / 3600.0
            it = int(np.argmin(np.abs((tps - tps[0]) - hh)))
            ps = np.asarray(dps["ps"][it], dtype=np.float64)
            zta = self._load(self._path("ta", date))
            zs = np.asarray(zta["orog"], np.float64)
        zs = np.maximum(zs, 0.0)
        p3d = ak[:, None, None] + bk[:, None, None] * ps[None]
        return dict(t=out["ta"], q=out["hus"], u=out["ua"],
                    v=out["va"], ps=ps, zs=zs, p3d=p3d, lat=lat,
                    lon=lon)


def _vertical_interp_cols(fp: np.ndarray, p3: np.ndarray,
                          psig: np.ndarray, is_t: bool) -> np.ndarray:
    """Per-column source pressures variant of the ERA5 reader's
    intlog/intlin (Share/mod_vertint.F90). fp/p3: (nlev, iy, jx) with
    p3 increasing along axis 0; psig: (kz, iy, jx) Pa."""
    nlev = fp.shape[0]
    lp = np.log(p3)
    lq = np.log(psig)
    # bracketing index per column/target level
    idx = np.sum(lq[:, None] >= lp[None], axis=1) - 1
    idx = np.clip(idx, 0, nlev - 2)
    kzt = psig.shape[0]
    out = np.empty_like(psig)
    for k in range(kzt):
        i0 = idx[k]
        f0 = np.take_along_axis(fp, i0[None], axis=0)[0]
        f1 = np.take_along_axis(fp, (i0 + 1)[None], axis=0)[0]
        if is_t:
            x0 = np.take_along_axis(lp, i0[None], axis=0)[0]
            x1 = np.take_along_axis(lp, (i0 + 1)[None], axis=0)[0]
            w = np.clip((lq[k] - x0) / np.maximum(x1 - x0, 1e-12),
                        0.0, 1.0)
        else:
            x0 = np.take_along_axis(p3, i0[None], axis=0)[0]
            x1 = np.take_along_axis(p3, (i0 + 1)[None], axis=0)[0]
            w = np.clip((psig[k] - x0) / np.maximum(x1 - x0, 1.0),
                        0.0, 1.0)
        out[k] = (1.0 - w) * f0 + w * f1
    # extrapolation: T lapse below the lowest level, constant above
    below = psig > p3[-1][None]
    if is_t:
        out = np.where(below, fp[-1][None]
                       * (psig / p3[-1][None])
                       ** (c.rgas * c.lrate * c.regrav), out)
    else:
        out = np.where(below, fp[-1][None], out)
    out = np.where(psig < p3[0][None], fp[0][None], out)
    return out


def gcm_fields(cfg: RegCMConfig, grid, topo_gp: np.ndarray,
               src: GCMSource, date: Date) -> Dict[str, np.ndarray]:
    """One ICBC record from a CMIP5 6hrLev archive."""
    kz = cfg.dim.kz
    r = src.record(date)
    # order levels top-down by mean pressure
    order = np.argsort(np.mean(r["p3d"], axis=(1, 2)))
    t3, q3, u3, v3 = (r[k][order] for k in ("t", "q", "u", "v"))
    p3 = r["p3d"][order]

    def horiz(f, lat2d, lon2d):
        return np.stack([bilinear_global(f[k], r["lat"], r["lon"],
                                         lat2d, lon2d)
                         for k in range(f.shape[0])])

    tcr = horiz(t3, grid.xlat, grid.xlon)
    qcr = horiz(q3, grid.xlat, grid.xlon)
    pcr = horiz(p3, grid.xlat, grid.xlon)
    udt = horiz(u3, grid.dlat, grid.dlon)
    vdt = horiz(v3, grid.dlat, grid.dlon)
    pdt = horiz(p3, grid.dlat, grid.dlon)
    ps_g = bilinear_global(r["ps"], r["lat"], r["lon"], grid.xlat,
                           grid.xlon)
    zs_g = bilinear_global(r["zs"], r["lat"], r["lon"], grid.xlat,
                           grid.xlon)

    # hypsometric reduction of the GCM surface pressure to the model
    # topography with the lowest-level temperature
    zsurf = topo_gp / c.egrav
    tlow = tcr[-1]
    ps = ps_g * np.exp(-c.egrav * (zsurf - zs_g) / (c.rgas * tlow))

    from ..utils.vertical import sigma_levels
    _, sh, _ = sigma_levels(kz, cfg.dim.dsmax, cfg.dim.dsmin)
    ptop = cfg.ptop_cb * 1000.0
    psig = sh[:, None, None] * (ps - ptop)[None] + ptop
    t = _vertical_interp_cols(tcr, pcr, psig, is_t=True)
    qsp = np.maximum(
        _vertical_interp_cols(qcr, pcr, psig, is_t=False), c.minqq)
    qv = qsp / (1.0 - qsp)                  # sph2mxr
    u = _vertical_interp_cols(udt, pdt, psig, is_t=False)
    v = _vertical_interp_cols(vdt, pdt, psig, is_t=False)
    ts = t[-1]
    return dict(u=u, v=v, t=t, qv=qv, ps=ps, ts=ts)


def generate_gcm_icbc(cfg: RegCMConfig, grid, topo_gp: np.ndarray,
                      inpglob: str, path: str, dattyp: str) -> str:
    """icbc main loop for the generic-GCM dattyps
    (PreProc/ICBC/icbc.F90:303 init_gn6hnc path)."""
    from .icbc import ICBCWriter
    src = GCMSource(inpglob, dattyp)
    w = ICBCWriter(path, cfg)
    d = Date.from_int(cfg.globdat.gdate1, cfg.globdat.calendar)
    d1 = Date.from_int(cfg.globdat.gdate2, cfg.globdat.calendar)
    while d <= d1:
        w.append(d, gcm_fields(cfg, grid, topo_gp, src, d))
        d = d.add_hours(cfg.globdat.ibdyfrq)
    w.close()
    return path
