"""Checkpoint/restart (SAV files).

Equivalent of ``Main/mod_savefile.F90`` (``write_savefile`` :764,
``read_savefile`` :564): the full prognostic + physics persistent state
is dumped so a restarted run reproduces the uninterrupted run bit-for-bit
(the reference's BuildBot monthly-chain contract, SURVEY §5.4).

Format: NetCDF-3 with one variable per HydroState field in float64 plus
run metadata (date, step counter, xbctime). Works for any mesh sharding:
arrays are gathered to host on save and resharded by the driver on load.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np
from scipy.io import netcdf_file

from ..core.state import HydroState
from ..utils.calendar import Date


def write_savefile(path: str, state: HydroState, date: Date,
                   nstep: int, xbctime: float):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    f = netcdf_file(path, "w", version=2)
    f.history = "regcm_tpu restart (SAV)"
    f.date_seconds = date.to_seconds()   # full second precision
    f.calendar = date.calendar
    f.nstep = nstep
    f.xbctime = float(xbctime)
    dimcache = {}

    def dims_for(shape):
        names = []
        for n, s in enumerate(shape):
            key = f"d{s}"
            if key not in dimcache:
                f.createDimension(key, s)
                dimcache[key] = True
            names.append(key)
        return tuple(names)

    for name in state._fields:
        arr = np.asarray(getattr(state, name), dtype=np.float64)
        v = f.createVariable(name, "d", dims_for(arr.shape))
        v[:] = arr
    f.close()


def read_savefile(path: str, dtype=None) -> Tuple[dict, Date, int, float]:
    f = netcdf_file(path, "r", mmap=False)
    fields = {}
    for name in f.variables:
        fields[name] = np.array(f.variables[name].data)
    cal = f.calendar.decode() if isinstance(f.calendar, bytes) \
        else f.calendar
    date = Date.from_seconds(int(f.date_seconds), cal)
    nstep = int(f.nstep)
    xbctime = float(f.xbctime)
    f.close()
    return fields, date, nstep, xbctime
