#!/usr/bin/env python
"""Benchmarks: per-chip throughput on the reference anchor + flagship.

Prints one JSON line per benchmark; the FIRST line is the headline
like-for-like metric: test_001 (34x64x18, dt=150 s) with the FULL
physics suite — Emanuel cumulus, Holtslag PBL, SUBEX, CCM3 spectral
radiation on its dtrad alarm, surface fluxes — the same configuration
as the reference's only published anchor (~1.9e5 grid-point·steps/s on
8 MPI ranks of a 2010 quad-core i7; BASELINE.md,
Doc/UserGuide/TestRun.tex:265).  Further lines: dynamics-only test_001
and the 3 km convection-permitting MOLOCH flagship (192x192x41).

Alarm costs are amortized honestly: the base step and every alarmed
physics class (cumulus/surface/radiation/absorptivity) are each timed
from scanned multi-step trajectories — never from single device
dispatches, whose host round-trip latency on the tunneled backend
would contaminate the (t_class - t_base) subtraction — and charged at
1/cadence per step.
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from regcm_tpu.utils.jaxcache import enable_cache
enable_cache()

BASELINE_GPS = 1.9e5   # grid-point·steps/s (machine-wide, 8 ranks)


def _emit(metric, gps, dt, per_step, extra=None):
    if extra:
        extra = {k: v for k, v in extra.items()
                 if not k.startswith("_")}
    rec = {
        "metric": metric,
        "value": round(gps, 1),
        "unit": "gp*steps/s",
        "vs_baseline": round(gps / BASELINE_GPS, 3),
        "ms_per_step": round(per_step * 1e3, 3),
        "sypd": round(dt / per_step / 365.0 / 86400.0 * 86400.0, 2),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def _time_fn(fn, arg, nrep, per_call_steps=1):
    out = fn(arg)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    cur = arg
    for _ in range(nrep):
        cur = fn(cur)
    jax.block_until_ready(jax.tree_util.tree_leaves(cur)[0])
    return (time.time() - t0) / (nrep * per_call_steps)


# per-chip peaks for the roofline line: (bf16 TFLOP/s, HBM GB/s).
# Sources: published TPU specs (v4 275/1228, v5e 197/819,
# v5p 459/2765, v6e 918/1640). f32 MXU rate is ~half bf16.
_CHIP_PEAKS = {
    "TPU v4": (275.0, 1228.0),
    "TPU v5 lite": (197.0, 819.0),
    "TPU v5e": (197.0, 819.0),
    "TPU v5p": (459.0, 2765.0),
    "TPU v5": (459.0, 2765.0),
    "TPU v6e": (918.0, 1640.0),
    "TPU v6 lite": (918.0, 1640.0),
}


def _roofline(metric, compiled, per_step, steps_per_call):
    """Achieved FLOP/s + HBM bytes/s from the compiled step's XLA cost
    analysis vs chip peak — the MFU/roofline record (one JSON line)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) / steps_per_call
        byts = float(ca.get("bytes accessed", 0.0)) / steps_per_call
    except Exception as e:            # cost analysis unsupported
        print(json.dumps({"metric": metric, "error": str(e)}),
              flush=True)
        return
    kind = jax.devices()[0].device_kind
    peak = None
    for k, v in _CHIP_PEAKS.items():
        if kind.lower().startswith(k.lower()):
            peak = v
            break
    tf = flops / per_step / 1e12
    gbs = byts / per_step / 1e9
    rec = {"metric": metric, "value": round(gbs, 1), "unit": "GB/s",
           "vs_baseline": 0.0,
           "device_kind": kind,
           "tflops_per_s": round(tf, 3),
           "flops_per_step": flops, "bytes_per_step": byts,
           "arith_intensity": round(flops / max(byts, 1.0), 3)}
    if peak:
        rec["mfu_bf16_peak"] = round(tf / peak[0], 4)
        rec["hbm_bw_frac"] = round(gbs / peak[1], 4)
    print(json.dumps(rec), flush=True)


def _alarmed_physics_timing(core, s, bdy, mu, cfg, dtsec, physics,
                            chunk, nsteps):
    """Time the base step + each alarmed physics class (cumulus on
    dtcum, surface on dtsrf, cached radiation on dtrad, full
    absorptivity refresh on dtabem) and amortize by their cadences —
    the reference's syncro_* alarm structure
    (Main/mpplib/mod_runparams.F90:51-75)."""
    import jax
    import jax.numpy as jnp
    from regcm_tpu.core.state import StepFlags

    xt = jnp.asarray(0.0, jnp.float32)
    dt = jnp.asarray(dtsec, jnp.float32)
    step = jax.jit(core.step, static_argnames=("flags",))
    base = StepFlags(do_rad=False, do_srf=False, do_cum=False)

    @jax.jit
    def multi(sc):
        def body(carry, _):
            ns, _ = step(carry, bdy, xt, dt, base, mu)
            return ns, ()
        out, _ = jax.lax.scan(body, sc, None, length=chunk)
        return out

    if physics:
        # warm the held-tendency + absorptivity caches (retry once on
        # transient tunnel faults)
        warm = StepFlags(do_rad=True, do_srf=True, do_cum=True,
                         do_abem=True)
        warm_fn = jax.jit(lambda sc: step(sc, bdy, xt, dt, warm,
                                          mu)[0])
        try:
            s = warm_fn(s)
            jax.block_until_ready(s)
        except Exception as e:
            print(f"# warm step failed ({type(e).__name__}); retry",
                  flush=True)
            import time as _t
            _t.sleep(5.0)
            s = warm_fn(s)
    t_base = _time_fn(multi, s, max(nsteps // chunk, 1), chunk)
    if not physics:
        return t_base, {}, multi, s

    # Every alarm class is timed from a SCANNED multi-step trajectory
    # (every step fires the class), so the per-step cost carries no
    # single-dispatch latency — on the tunneled TPU backend a lone
    # device call pays a host round-trip that used to inflate the
    # subtraction (t_class - t_base) by ~the dispatch cost.
    def one(flags, nrep):
        def body(carry, _):
            ns, _ = step(carry, bdy, xt, dt, flags, mu)
            return ns, ()
        fn = jax.jit(lambda sc: jax.lax.scan(
            body, sc, None, length=chunk)[0])
        try:
            return _time_fn(fn, s, nrep, chunk)
        finally:
            # drop the stage executable (and its temp arena) before
            # compiling the next one — the radiation stages at
            # flagship size otherwise push accumulated HBM arenas
            # into tunnel device errors
            try:
                fn.clear_cache()
            except Exception:
                pass

    # The tunneled TPU backend occasionally raises UNAVAILABLE device
    # errors under sustained flagship-sized load; a failed class
    # timing falls back to the base cost (i.e. zero extra for that
    # class) and is flagged in the record rather than killing the
    # whole bench.
    failed = []

    def one_safe(name, flags, nrep):
        import time as _t
        for attempt in range(2):
            try:
                return one(flags, nrep)
            except Exception as e:               # jax UNAVAILABLE etc
                print(f"# {name} timing attempt {attempt} failed: "
                      f"{type(e).__name__}", flush=True)
                _t.sleep(5.0)
        failed.append(name)
        return t_base

    t_cum = one_safe("cum", StepFlags(do_rad=False, do_srf=False,
                                      do_cum=True), 2)
    t_srf = one_safe("srf", StepFlags(do_rad=False, do_srf=True,
                                      do_cum=False), 2)
    t_rad = one_safe("rad", StepFlags(do_rad=True, do_srf=False,
                                      do_cum=False, do_abem=False), 2)
    t_abem = one_safe("abem", StepFlags(do_rad=True, do_srf=False,
                                        do_cum=False, do_abem=True), 1)
    ncum = max(int(round(max(cfg.time.dtcum, dtsec) / dtsec)), 1)
    nsrf = max(int(round(cfg.time.dtsrf / dtsec)), 1)
    nrad = max(int(round(cfg.time.dtrad_sec / dtsec)), 1)
    nabem = max(int(round(cfg.time.dtabem_sec / dtsec)), nrad)
    per_step = (t_base
                + max(t_cum - t_base, 0.0) / ncum
                + max(t_srf - t_base, 0.0) / nsrf
                + max(t_rad - t_base, 0.0) / nrad
                + max(t_abem - t_rad, 0.0) / nabem)
    extra = {"base_ms": round(t_base * 1e3, 3),
             **({"classes_failed": ",".join(failed)} if failed
                else {}),
             "cum_ms": round(t_cum * 1e3, 3), "ncum": ncum,
             "srf_ms": round(t_srf * 1e3, 3), "nsrf": nsrf,
             "rad_ms": round(t_rad * 1e3, 3), "nrad": nrad,
             "abem_ms": round(t_abem * 1e3, 3), "nabem": nabem,
             "_chunk": chunk}
    return per_step, extra, multi, s


def bench_hydro(physics, label):
    import numpy as np
    from regcm_tpu.config.params import RegCMConfig
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.core.state import StepFlags, bdy_from_state
    from regcm_tpu.driver import standard_atmosphere_state
    from regcm_tpu.dynamics.hydrostatic import HydroCore

    nml = "/root/reference/Testing/test_001.in"
    cfg = RegCMConfig.from_file(nml) if os.path.exists(nml) \
        else RegCMConfig()
    dtype = jnp.float32
    grid = build_grid(cfg)
    phys = None
    if physics:
        from regcm_tpu.physics.suite import PhysicsSuite
        phys = PhysicsSuite(cfg, grid)
    core = HydroCore(grid, cfg, dtype=dtype, physics=phys)
    s = standard_atmosphere_state(grid, cfg, dtype=dtype, perturb=0.3)
    s = core.init_split_storage(s)
    bdy = bdy_from_state(s)
    dtsec = cfg.dtsec                       # reference dt (150 s)
    xt = jnp.asarray(0.0, dtype)
    dt = jnp.asarray(dtsec, dtype)
    mu = jnp.full((grid.iy, grid.jx), 0.5, dtype)
    per_step, extra, multi, s = _alarmed_physics_timing(
        core, s, bdy, mu, cfg, dtsec, physics,
        chunk=int(os.environ.get("BENCH_CHUNK", "20")),
        nsteps=int(os.environ.get("BENCH_STEPS", "200")))
    gp = grid.iy * grid.jx * grid.kz
    _emit(label, gp / per_step, dtsec, per_step, extra)
    if physics and os.environ.get("BENCH_ROOFLINE", "1") != "0":
        _roofline("test_001 roofline (physics-on step, no alarms)",
                  multi.lower(s).compile(),
                  extra["base_ms"] * 1e-3, extra["_chunk"])


def bench_moloch():
    import numpy as np
    from regcm_tpu.config.params import RegCMConfig
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.core.state import StepFlags
    from regcm_tpu.dynamics.moloch import MolochCore
    from regcm_tpu.driver import moloch_bdy_from_state
    from regcm_tpu.physics.suite import PhysicsSuite

    nml = "/root/reference/Testing/test_001.in"
    cfg = RegCMConfig.from_file(nml) if os.path.exists(nml) \
        else RegCMConfig()
    cfg.core.idynamic = 3
    n = int(os.environ.get("BENCH_MOLOCH_N", "192"))
    cfg.dim.iy = cfg.dim.jx = n
    cfg.dim.kz = int(os.environ.get("BENCH_MOLOCH_KZ", "41"))
    cfg.geo.ds = 3.0
    cfg.time.dt = 30.0
    dtype = jnp.float32
    grid = build_grid(cfg)
    phys = PhysicsSuite(cfg, grid)
    core = MolochCore(grid, cfg, dtype=dtype, physics=phys)
    s = core.initial_state(perturb=0.3)
    bdy = moloch_bdy_from_state(s)
    xt = jnp.asarray(0.0, dtype)
    dt = jnp.asarray(cfg.time.dt, dtype)
    mu = jnp.full((grid.iy, grid.jx), 0.5, dtype)
    per_step, extra, multi, s = _alarmed_physics_timing(
        core, s, bdy, mu, cfg, cfg.time.dt, True,
        chunk=int(os.environ.get("BENCH_MOLOCH_CHUNK", "5")),
        nsteps=int(os.environ.get("BENCH_MOLOCH_STEPS", "20")))
    gp = cfg.dim.iy * cfg.dim.jx * cfg.dim.kz
    _emit(f"MOLOCH 3km {n}x{n}x{cfg.dim.kz} full physics",
          gp / per_step, cfg.time.dt, per_step, extra)
    if os.environ.get("BENCH_ROOFLINE", "1") != "0":
        _roofline("MOLOCH 3km roofline (physics-on step, no alarms)",
                  multi.lower(s).compile(),
                  extra["base_ms"] * 1e-3, extra["_chunk"])


def main():
    which = os.environ.get("BENCH_ONLY", "")
    if which in ("", "hydro"):
        bench_hydro(True, "test_001 hydrostatic FULL PHYSICS "
                          "(like-for-like vs reference anchor)")
    if which in ("", "dyn"):
        bench_hydro(False, "test_001 hydrostatic dynamics-only")
    if which in ("", "moloch") and \
            os.environ.get("BENCH_SKIP_MOLOCH", "") != "1":
        bench_moloch()
    return 0


if __name__ == "__main__":
    sys.exit(main())
