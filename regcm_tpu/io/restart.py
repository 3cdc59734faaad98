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
                   nstep: int, xbctime: float, bdy=None):
    """bdy: the live lateral-boundary pair object (BdyState/MolochBdy).
    The reference SAV carries the b0/b1 boundary arrays and the input
    cursor (Main/mod_savefile.F90:46-48) so a restart chain needs no
    re-wiring; fields are stored with a ``bdy_`` prefix."""
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

    def put(name, arr):
        arr = np.asarray(arr, dtype=np.float64)
        if arr.size == 0:
            # zero-size leaves (e.g. the ntr=0 tracer arrays) are not
            # representable in NetCDF-3; the reader restores them from
            # the model's own zero template
            return
        v = f.createVariable(name, "d", dims_for(arr.shape))
        v[:] = arr

    for name in state._fields:
        put(name, getattr(state, name))
    if bdy is not None:
        f.bdy_class = type(bdy).__name__
        for name in bdy._fields:
            val = getattr(bdy, name)
            if val is not None:
                put(f"bdy_{name}", val)
    f.close()


def read_savefile(path: str, dtype=None
                  ) -> Tuple[dict, Date, int, float, dict]:
    f = netcdf_file(path, "r", mmap=False)
    fields = {}
    bdy_fields = {}
    for name in f.variables:
        arr = np.array(f.variables[name].data)
        if name.startswith("bdy_"):
            bdy_fields[name[4:]] = arr
        else:
            fields[name] = arr
    cal = f.calendar.decode() if isinstance(f.calendar, bytes) \
        else f.calendar
    date = Date.from_seconds(int(f.date_seconds), cal)
    nstep = int(f.nstep)
    xbctime = float(f.xbctime)
    f.close()
    return fields, date, nstep, xbctime, bdy_fields
