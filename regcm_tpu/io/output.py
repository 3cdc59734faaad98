"""Model output streams (ATM / SRF / RAD).

Mirrors the reference stream system (stream ids
``Main/mpplib/mod_ncout.F90:143-152``, packing ``Main/mod_output.F90:73``)
with CF/CORDEX variable names (``ua``, ``va``, ``ta``, ``hus``, ``clw``,
``ps``, ``ts``, ``pr``, …) so reference post-processing tooling reads the
files. One file per stream per run; records appended on the stream's
alarm (atmfrq/srffrq/radfrq).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..utils.calendar import Date
from .ncio import NCWriter

_EPOCH = Date(1949, 12, 1)


def _hours_since_epoch(date: Date) -> float:
    ref = Date(1949, 12, 1, calendar=date.calendar)
    return (date - ref) / 3600.0


class OutputStreams:
    """ATM/SRF/RAD NetCDF streams for a model run."""

    def __init__(self, model, outdir: str, domname: str = "domain"):
        self.model = model
        self.outdir = outdir
        os.makedirs(outdir, exist_ok=True)
        g = model.grid
        iy, jx, kz = g.iy, g.jx, g.kz
        dims = {"iy": iy - 1, "jx": jx - 1, "kz": kz}
        date0 = model.start_date
        tag = f"{date0.year:04d}{date0.month:02d}{date0.day:02d}"
        attrs = {"title": "regcm_tpu model output",
                 "projection": model.cfg.geo.iproj,
                 "experiment": domname}

        def mk(stream):
            w = NCWriter(os.path.join(
                outdir, f"{domname}_{stream}.{tag}00.nc"), dims, attrs)
            w.def_static("sigma", ("kz",), g.hsigma, "1",
                         "sigma at model layers")
            w.def_static("xlat", ("iy", "jx"),
                         g.xlat[:iy - 1, :jx - 1], "degrees_north",
                         "Latitude", "latitude")
            w.def_static("xlon", ("iy", "jx"),
                         g.xlon[:iy - 1, :jx - 1], "degrees_east",
                         "Longitude", "longitude")
            w.def_static("topo", ("iy", "jx"),
                         g.ht[:iy - 1, :jx - 1] / 9.80665, "m",
                         "Surface elevation", "surface_altitude")
            return w

        self.atm = mk("ATM")
        self.atm.def_time_var("ua", ("kz", "iy", "jx"), "m s-1",
                              "Eastward wind", "eastward_wind")
        self.atm.def_time_var("va", ("kz", "iy", "jx"), "m s-1",
                              "Northward wind", "northward_wind")
        self.atm.def_time_var("ta", ("kz", "iy", "jx"), "K",
                              "Air temperature", "air_temperature")
        self.atm.def_time_var("hus", ("kz", "iy", "jx"), "kg kg-1",
                              "Specific humidity", "specific_humidity")
        self.atm.def_time_var("clw", ("kz", "iy", "jx"), "kg kg-1",
                              "Cloud liquid water",
                              "mass_fraction_of_cloud_liquid_water_in_air")
        self.atm.def_time_var("ps", ("iy", "jx"), "hPa",
                              "Surface pressure", "surface_air_pressure")

        self.srf = mk("SRF")
        self.srf.def_time_var("ts", ("iy", "jx"), "K",
                              "Ground temperature", "surface_temperature")
        self.srf.def_time_var("pr", ("iy", "jx"), "kg m-2 s-1",
                              "Total precipitation flux",
                              "precipitation_flux")
        self.srf.def_time_var("hfls", ("iy", "jx"), "kg m-2 s-1",
                              "Surface moisture flux",
                              "water_evaporation_flux")
        self.srf.def_time_var("hfss", ("iy", "jx"), "W m-2",
                              "Surface sensible heat flux",
                              "surface_upward_sensible_heat_flux")
        self.srf.def_time_var("ps", ("iy", "jx"), "hPa",
                              "Surface pressure", "surface_air_pressure")

        self.rad = mk("RAD")
        self.rad.def_time_var("rsns", ("iy", "jx"), "W m-2",
                              "Surface absorbed shortwave",
                              "surface_net_downward_shortwave_flux")
        self.rad.def_time_var("rlns", ("iy", "jx"), "W m-2",
                              "Surface net longwave",
                              "surface_net_downward_longwave_flux")
        self.rad.def_time_var("tendh", ("kz", "iy", "jx"), "K s-1",
                              "Radiative heating rate")
        self._last_rain = 0.0

    def write_atm(self):
        m = self.model
        dec = m.decoupled()
        iy, jx = m.grid.iy, m.grid.jx
        cut = lambda a: a[..., : iy - 1, : jx - 1]
        self.atm.write_record(_hours_since_epoch(m.date), {
            "ua": cut(dec["u"]), "va": cut(dec["v"]),
            "ta": cut(dec["t"]), "hus": cut(dec["qv"]),
            "clw": cut(dec["qc"]), "ps": cut(dec["ps"])})

    def write_srf(self):
        m = self.model
        s = m.state
        dec = m.decoupled()
        iy, jx = m.grid.iy, m.grid.jx
        cut = lambda a: np.asarray(a)[..., : iy - 1, : jx - 1]
        rain = np.asarray(s.rainnc) + np.asarray(s.rainc)
        frq = m.cfg.out.srffrq * 3600.0
        pr = (cut(rain) - self._last_rain) / max(frq, 1.0)
        self._last_rain = cut(rain)
        self.srf.write_record(_hours_since_epoch(m.date), {
            "ts": cut(s.tg), "pr": pr, "hfls": cut(s.qfx),
            "hfss": cut(s.hfx), "ps": cut(dec["ps"])})

    def write_rad(self):
        m = self.model
        s = m.state
        iy, jx = m.grid.iy, m.grid.jx
        cut = lambda a: np.asarray(a)[..., : iy - 1, : jx - 1]
        self.rad.write_record(_hours_since_epoch(m.date), {
            "rsns": cut(s.swsfc), "rlns": cut(s.lwsfc),
            "tendh": cut(s.heatrt)})

    def close(self):
        self.atm.close()
        self.srf.close()
        self.rad.close()
