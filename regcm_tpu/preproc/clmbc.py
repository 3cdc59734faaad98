"""CLM forcing generator — the ``clmbc`` executable equivalent
(``PreProc/ICBC/clmbc.F90`` + the hourly-surface ERA5 reader
``mod_era5.F90:80-150,298-311,400-532`` and the h-output writer
``mod_write.F90:57-106``).

The reference reads four ERA5 hourly surface archives per month
(``{pr,ssr,strd,clt}_YYYY_MM.nc`` with native names tp/ssr/strd/tcc,
era5hour :423-424), horizontally interpolates to the model cross
grid, converts accumulations to fluxes (/3600, get_era5h :303-309),
and writes hourly records of

  pr [kg m-2 s-1], ssr [W m-2], strd [W m-2], clt [1]

plus the static xlon/xlat/mask/topo — the offline forcing consumed by
the CLM4.5 stand-alone driver (``clmsa``).

When the ERA5 hourly archive is absent in this environment, a
documented synthetic fallback provides an analytic diurnal/seasonal
forcing (clear-sky solar geometry for ssr, Stefan-Boltzmann clear-sky
longwave for strd, ITCZ-modulated precipitation) so the file format
and the downstream consumer can be exercised end-to-end.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..config.params import RegCMConfig
from ..utils.calendar import Date
from ..io.ncio import NCWriter, read_nc

_SECPH = 3600.0


def _era5h_record(inpglob: str, date: Date, xlat: np.ndarray,
                  xlon: np.ndarray) -> Optional[Dict[str, np.ndarray]]:
    """One hourly record from the ERA5 hourly archive, on the model
    grid; None when the archive is absent."""
    from .sst import bilinear_global
    fname = {"pr": "tp", "ssr": "ssr", "strd": "strd", "clt": "tcc"}
    out = {}
    for stem, var in fname.items():
        path = os.path.join(
            inpglob, "ERA5", "hourly",
            f"{stem}_{date.year:04d}_{date.month:02d}.nc")
        if not os.path.exists(path):
            return None
        d = read_nc(path)
        lat = np.asarray(d.get("latitude", d.get("lat")))
        lon = np.asarray(d.get("longitude", d.get("lon")))
        f = np.asarray(d[var], dtype=np.float64)
        # hour index within the month
        it = min((date.day - 1) * 24 + date.hour, f.shape[0] - 1)
        out[stem] = bilinear_global(f[it], lat, lon, xlat, xlon)
    # accumulations → fluxes (get_era5h: tp m/hr → kg m-2 s-1;
    # ssr/strd J/m² → W/m²)
    out["pr"] = np.maximum(out["pr"] / _SECPH * 1000.0, 0.0)
    out["ssr"] = np.maximum(out["ssr"] / _SECPH, 0.0)
    out["strd"] = np.maximum(out["strd"] / _SECPH, 0.0)
    out["clt"] = np.clip(out["clt"], 0.0, 1.0)
    return out


def _synthetic_record(date: Date, xlat: np.ndarray,
                      xlon: np.ndarray) -> Dict[str, np.ndarray]:
    """Analytic hourly forcing (archive-absent fallback)."""
    doy = date.day_of_year()
    decl = np.deg2rad(23.44) * np.sin(
        2.0 * np.pi * (doy - 81) / 365.25)
    latr = np.deg2rad(xlat)
    # local solar hour angle
    ha = np.deg2rad((date.hour + xlon / 15.0 - 12.0) * 15.0)
    mu = np.sin(latr) * np.sin(decl) + np.cos(latr) * np.cos(decl) \
        * np.cos(ha)
    mu = np.maximum(mu, 0.0)
    clt = 0.4 + 0.3 * np.exp(-(xlat / 12.0) ** 2)       # ITCZ band
    ssr = 1000.0 * mu * (1.0 - 0.6 * clt)
    t2m = 288.0 - 30.0 * np.sin(latr) ** 2 + 5.0 * mu
    strd = 0.8 * 5.670e-8 * t2m ** 4 * (1.0 + 0.2 * clt)
    pr = 3.0e-5 * clt ** 2 * (1.0 + 0.5 * np.cos(ha))
    return {"pr": np.maximum(pr, 0.0), "ssr": ssr, "strd": strd,
            "clt": clt}


def generate_clmbc(cfg: RegCMConfig, path: str, grid=None) -> str:
    """clmbc main loop: one record per hour over [gdate1, gdate2]
    (clmbc.F90:113-126, hourly cadence)."""
    if grid is None:
        from ..core.grid import build_grid
        grid = build_grid(cfg)
    iy, jx = cfg.dim.iy, cfg.dim.jx
    xlat = np.asarray(grid.xlat)
    xlon = np.asarray(grid.xlon)
    w = NCWriter(path, dims={"iy": iy, "jx": jx},
                 attrs={"title": "regcm_tpu CLMBC forcing",
                        "source": "clmbc"})
    w.def_static("xlon", ("iy", "jx"), xlon, "degrees_east",
                 "Longitude on Cross Points", "longitude")
    w.def_static("xlat", ("iy", "jx"), xlat, "degrees_north",
                 "Latitude on Cross Points", "latitude")
    w.def_static("mask", ("iy", "jx"),
                 np.asarray(grid.lndocn), "1", "Land Mask",
                 "land_binary_mask")
    w.def_static("topo", ("iy", "jx"),
                 np.asarray(grid.ht) / 9.80665, "m",
                 "Surface Model Elevation", "surface_altitude")
    w.def_time_var("pr", ("iy", "jx"), "kg m-2 s-1",
                   "Precipitation flux", "precipitation_flux")
    w.def_time_var("ssr", ("iy", "jx"), "W m-2",
                   "Surface Downwelling Shortwave Flux",
                   "surface_downwelling_shortwave_flux_in_air")
    w.def_time_var("strd", ("iy", "jx"), "W m-2",
                   "Surface Downwelling Longwave Flux",
                   "surface_downwelling_longwave_flux_in_air")
    w.def_time_var("clt", ("iy", "jx"), "1", "Total cloud cover",
                   "cloud_area_fraction")
    d0 = Date.from_int(cfg.globdat.gdate1, cfg.globdat.calendar)
    d1 = Date.from_int(cfg.globdat.gdate2, cfg.globdat.calendar)
    inpglob = cfg.globdat.inpglob
    d = d0
    synth = None
    while d <= d1:
        rec = _era5h_record(inpglob, d, xlat, xlon)
        if rec is None:
            if synth is None:
                synth = True
                print("clmbc: ERA5 hourly archive absent under "
                      f"{inpglob!r}; writing the documented synthetic "
                      "analytic forcing")
            rec = _synthetic_record(d, xlat, xlon)
        hours = (d - Date(1949, 12, 1, calendar=d.calendar)) / 3600.0
        w.write_record(hours, rec)
        d = d.add_hours(1)
    w.close()
    return path


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(
        description="CLM forcing generator (clmbc equivalent)")
    p.add_argument("namelist")
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args(argv)
    cfg = RegCMConfig.from_file(args.namelist)
    out = args.output or os.path.join(
        cfg.out.dirout, f"{cfg.terrain.domname}_CLMBC.nc")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    return generate_clmbc(cfg, out)


if __name__ == "__main__":
    main()
