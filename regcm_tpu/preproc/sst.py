"""SST preprocessor (the ``sst`` executable equivalent).

Mirrors ``PreProc/ICBC/sst.F90:36-225``: reads a global SST dataset
(``ssttyp`` dispatch → OI_WK/ERSST/CAM4/GCM readers in
``mod_sst_*.F90``), interpolates it to the model grid
(``mod_mksst.F90``: bilinear over ocean points, nearest-valid fill
near coasts) and writes the ``<domname>_SST.nc`` time series consumed
by the icbc program and the model.

Sources supported here:
- any CF-style lat-lon NetCDF with variables (lat, lon, time, sst|
  skt|tos) — covers the OISST-weekly/ERSST file layouts after their
  own download tooling;
- ``ssttyp="FIXED"``: an analytic zonal SST climatology (no external
  data needed), used by the synthetic test pipeline.

All interpolation is plain NumPy (host-side preprocessing, matching
the reference's standalone-executable design).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..config.params import RegCMConfig
from ..utils.calendar import Date
from ..io.ncio import NCWriter, read_nc


def analytic_sst(xlat: np.ndarray, doy: float = 0.0) -> np.ndarray:
    """Zonal-mean SST climatology with a weak seasonal cycle (K)."""
    t = 300.5 - 27.0 * np.sin(np.deg2rad(np.abs(xlat))) ** 2
    seas = 1.5 * np.cos(2.0 * np.pi * (doy - 31.0) / 365.0) \
        * np.sign(xlat)
    return np.maximum(t - seas, 271.35)


def bilinear_global(field: np.ndarray, lats: np.ndarray,
                    lons: np.ndarray, xlat: np.ndarray,
                    xlon: np.ndarray,
                    missing: Optional[float] = None) -> np.ndarray:
    """Bilinear interpolation from a global regular lat-lon grid to
    scattered target points, with lon wraparound (the gridded branch of
    Share/mod_kdinterp.F90 used by mod_mksst). Missing source cells
    (|v| > 1e19 or == missing) are excluded by weight masking —
    nearest-valid behavior near coasts."""
    lats = np.asarray(lats)
    lons = np.asarray(lons) % 360.0
    xl = np.asarray(xlat)
    xo = np.asarray(xlon) % 360.0
    nlat, nlon = field.shape
    # fractional indices (lats may be descending)
    asc = lats[1] > lats[0]
    la = lats if asc else lats[::-1]
    fi = np.interp(xl, la, np.arange(nlat))
    if not asc:
        fi = (nlat - 1) - fi
    dlon = (lons[1] - lons[0]) % 360.0
    fj = ((xo - lons[0]) % 360.0) / dlon
    i0 = np.clip(np.floor(fi).astype(int), 0, nlat - 2)
    j0 = np.floor(fj).astype(int) % nlon
    wi = np.clip(fi - i0, 0.0, 1.0)
    wj = fj - np.floor(fj)
    j1 = (j0 + 1) % nlon
    v00 = field[i0, j0]
    v01 = field[i0, j1]
    v10 = field[i0 + 1, j0]
    v11 = field[i0 + 1, j1]
    w00 = (1.0 - wi) * (1.0 - wj)
    w01 = (1.0 - wi) * wj
    w10 = wi * (1.0 - wj)
    w11 = wi * wj
    vals = np.stack([v00, v01, v10, v11])
    wgts = np.stack([w00, w01, w10, w11])
    bad = ~np.isfinite(vals) | (np.abs(vals) > 1.0e19)
    if missing is not None:
        bad |= vals == missing
    wgts = np.where(bad, 0.0, wgts)
    wsum = wgts.sum(axis=0)
    out = (vals * wgts).sum(axis=0) / np.where(wsum > 0.0, wsum, 1.0)
    return np.where(wsum > 0.0, out, np.nan)


class SSTSource:
    """Global SST archive (one of the mod_sst_* readers)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path and os.path.exists(path):
            data = read_nc(path)
            self.lats = np.asarray(
                data.get("lat", data.get("latitude")))
            self.lons = np.asarray(
                data.get("lon", data.get("longitude")))
            for nm in ("sst", "skt", "tos"):
                if nm in data:
                    self.sst = np.asarray(data[nm], dtype=np.float64)
                    break
            else:
                raise ValueError(f"no SST variable found in {path}")
            if self.sst.ndim == 2:
                self.sst = self.sst[None]
            self.times = np.asarray(data.get(
                "time", np.arange(self.sst.shape[0])))
            # Celsius archives → K
            if np.nanmax(self.sst) < 200.0:
                self.sst = self.sst + 273.15
        else:
            self.lats = self.lons = self.times = None
            self.sst = None

    def at(self, date: Date, xlat, xlon) -> np.ndarray:
        if self.sst is None:
            return analytic_sst(xlat, doy=float(date.day_of_year()))
        # nearest record in time (weekly OISST style), bilinear in space
        if len(self.times) > 1:
            ref = Date(1949, 12, 1, calendar=date.calendar)
            h = (date - ref) / 3600.0
            idx = int(np.argmin(np.abs(self.times - h)))
        else:
            idx = 0
        return bilinear_global(self.sst[idx], self.lats, self.lons,
                               xlat, xlon)


def generate_sst(cfg: RegCMConfig, path: str,
                 source: Optional[SSTSource] = None,
                 landmask: Optional[np.ndarray] = None) -> str:
    """The sst main program (PreProc/ICBC/sst.F90:36): write the
    <domname>_SST.nc series over [gdate1, gdate2] at ibdyfrq cadence."""
    from ..core.grid import build_grid
    grid = build_grid(cfg)
    iy, jx = grid.iy, grid.jx
    src = source or SSTSource()
    lnd = landmask if landmask is not None \
        else np.asarray(grid.lndocn)
    w = NCWriter(path, dims={"iy": iy, "jx": jx},
                 attrs={"title": "regcm_tpu SST",
                        "projection": cfg.geo.iproj})
    w.def_static("xlat", ("iy", "jx"), grid.xlat, "degrees_north",
                 "Latitude")
    w.def_static("xlon", ("iy", "jx"), grid.xlon, "degrees_east",
                 "Longitude")
    w.def_time_var("sst", ("iy", "jx"), "K",
                   "Sea surface temperature",
                   "sea_surface_temperature")
    d0 = Date.from_int(cfg.globdat.gdate1, cfg.globdat.calendar)
    d1 = Date.from_int(cfg.globdat.gdate2, cfg.globdat.calendar)
    d = d0
    ref = Date(1949, 12, 1, calendar=cfg.globdat.calendar)
    while d <= d1:
        sst = src.at(d, grid.xlat, grid.xlon)
        # mksst: land points carry the nearest-ocean/fallback value,
        # masked out again at model ingest
        sst = np.where(np.isfinite(sst), sst,
                       analytic_sst(grid.xlat,
                                    doy=float(d.day_of_year())))
        w.write_record((d - ref) / 3600.0, {"sst": sst})
        d = d.add_hours(cfg.globdat.ibdyfrq)
    w.close()
    return path


def read_sst(path: str, date: Date,
             calendar: str = "gregorian") -> np.ndarray:
    """Read the SST record bracketing `date` (time-interpolated like
    the model's SST ingestion)."""
    data = read_nc(path)
    times = np.asarray(data["time"])
    ref = Date(1949, 12, 1, calendar=calendar)
    h = (date - ref) / 3600.0
    if len(times) == 1:
        return np.asarray(data["sst"][0])
    i1 = int(np.clip(np.searchsorted(times, h), 1, len(times) - 1))
    i0 = i1 - 1
    w = np.clip((h - times[i0]) / max(times[i1] - times[i0], 1e-9),
                0.0, 1.0)
    return (1.0 - w) * np.asarray(data["sst"][i0]) \
        + w * np.asarray(data["sst"][i1])


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="sst preprocessor")
    ap.add_argument("namelist")
    ap.add_argument("--source", default=None,
                    help="global SST NetCDF (OISST/ERSST-style)")
    args = ap.parse_args(argv)
    cfg = RegCMConfig.from_file(args.namelist)
    out = f"{cfg.terrain.domname}_SST.nc"
    generate_sst(cfg, out, SSTSource(args.source))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
