"""Solar geometry: declination and zenith angle.

Host-side equivalent of ``Main/mod_sun.F90`` (``solar1`` :258, ``zenitm``
:303). Round-1 uses the Spencer (1971) Fourier series for declination and
equation of time (the reference's full Berger orbital machinery
``Share/mod_sunorbit.F90`` is a later-round port); zenith angle follows
the standard spherical formula of zenitm.
"""
from __future__ import annotations

import numpy as np

from .calendar import Date, days_in_year
from .constants import degrad


def declination(date: Date) -> float:
    """Solar declination (radians), Spencer series."""
    ndays = days_in_year(date.year, date.calendar)
    frac = (date.year_fraction() - 1.0) / ndays
    th = 2.0 * np.pi * frac
    return (0.006918 - 0.399912 * np.cos(th) + 0.070257 * np.sin(th)
            - 0.006758 * np.cos(2 * th) + 0.000907 * np.sin(2 * th)
            - 0.002697 * np.cos(3 * th) + 0.001480 * np.sin(3 * th))


def eccentricity_factor(date: Date) -> float:
    """(r0/r)^2 solar distance factor."""
    ndays = days_in_year(date.year, date.calendar)
    th = 2.0 * np.pi * (date.year_fraction() - 1.0) / ndays
    return (1.000110 + 0.034221 * np.cos(th) + 0.001280 * np.sin(th)
            + 0.000719 * np.cos(2 * th) + 0.000077 * np.sin(2 * th))


def coszrs(date: Date, xlat: np.ndarray, xlon: np.ndarray) -> np.ndarray:
    """Cosine of solar zenith angle, clipped at 0 (zenitm,
    Main/mod_sun.F90:303-360)."""
    decl = declination(date)
    gmt_hours = date.hour + date.minute / 60.0 + date.second / 3600.0
    # hour angle: local solar time relative to solar noon
    ha = (gmt_hours / 24.0 * 2.0 * np.pi + xlon * degrad) - np.pi
    mu = (np.sin(xlat * degrad) * np.sin(decl)
          + np.cos(xlat * degrad) * np.cos(decl) * np.cos(ha))
    return np.maximum(mu, 0.0)
