"""SOM (slab-ocean q-flux) input generator.

The reference's slab ocean runs in two phases: (1) a restoring run
(``do_restore_sst``) whose SLABOC stream records the diagnosed
restoring heat flux, and (2) the free run, where the monthly
climatology of that flux is read back as the q-flux adjustment
(``<domname>_SOM.<date>.nc`` with 12 monthly ``qflx`` records;
``open_som``/``read_som``, ``Main/mod_ncio.F90:753-770,1130-1169``,
consumed by ``mod_slabocean.F90:125``).

``make_som`` builds that file from a SLABOC stream: group the
``qflx_restore`` records by calendar month and average.  Months never
simulated get zero adjustment (documented — the reference expects a
full annual cycle from a year-long restoring run).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..io.ncio import NCWriter, read_nc
from ..utils.calendar import Date


def make_som(slaboc_path: str, out_path: str) -> str:
    """Monthly-mean q-flux climatology from a SLABOC stream file."""
    d = read_nc(slaboc_path)
    if "qflx_restore" not in d:
        raise ValueError(
            f"{slaboc_path} has no qflx_restore variable — is it a "
            "SLABOC stream from a do_restore_sst run?")
    q = np.asarray(d["qflx_restore"], dtype=np.float64)
    times = np.asarray(d["time"], dtype=np.float64)
    epoch = Date(1949, 12, 1)
    months = np.array([epoch.add_hours(float(t)).month
                       for t in times])
    iy, jx = q.shape[-2:]
    qm = np.zeros((12, iy, jx))
    for m in range(1, 13):
        sel = months == m
        if sel.any():
            qm[m - 1] = q[sel].mean(axis=0)
    w = NCWriter(out_path, dims={"iy": iy, "jx": jx},
                 attrs={"title": "regcm_tpu SOM q-flux climatology",
                        "source": os.path.basename(slaboc_path)})
    w.def_time_var("qflx", ("iy", "jx"), "W m-2",
                   "Slab ocean q-flux adjustment")
    for m in range(12):
        w.write_record(float(m + 1), {"qflx": qm[m]})
    w.close()
    return out_path


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="SOM q-flux generator (monthly climatology from a "
                    "restoring-run SLABOC stream)")
    ap.add_argument("slaboc", help="SLABOC stream NetCDF file")
    ap.add_argument("-o", "--output", default="SOM.nc")
    args = ap.parse_args(argv)
    print("wrote", make_som(args.slaboc, args.output))
    return 0


if __name__ == "__main__":
    main()
