#!/usr/bin/env python
"""Benchmark: hydrostatic core throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's only published anchor — test_001 (34x64x18,
dt=150s) at ~1.9e5 grid-point·steps/s on 8 MPI ranks of a 2010 quad-core
i7 (BASELINE.md; Doc/UserGuide/TestRun.tex:265).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BASELINE_GPS = 1.9e5   # grid-point·steps/s (machine-wide, 8 ranks)


def main():
    import numpy as np
    from regcm_tpu.config.params import RegCMConfig
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.core.state import StepFlags, bdy_from_state
    from regcm_tpu.driver import standard_atmosphere_state
    from regcm_tpu.dynamics.hydrostatic import HydroCore

    nml = "/root/reference/Testing/test_001.in"
    if os.path.exists(nml):
        cfg = RegCMConfig.from_file(nml)
    else:
        cfg = RegCMConfig()
        cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 34, 64, 18
    dtype = jnp.float32
    grid = build_grid(cfg)
    core = HydroCore(grid, cfg, dtype=dtype)
    s = standard_atmosphere_state(grid, cfg, dtype=dtype, perturb=0.3,
                                  seed=0)
    s = core.init_split_storage(s)
    bdy = bdy_from_state(s)
    flags = StepFlags()
    step = jax.jit(core.step, static_argnames=("flags",))
    xt = jnp.asarray(0.0, dtype)
    dt = jnp.asarray(300.0, dtype)

    # scan-chained multi-step kernel: one dispatch per CHUNK steps (the
    # host loop only handles alarms; pure dynamics steps fuse on-device)
    chunk = int(os.environ.get("BENCH_CHUNK", "20"))

    @jax.jit
    def multi(sc):
        def body(carry, _):
            ns, _ = step(carry, bdy, xt, dt, flags)
            return ns, ()
        out, _ = jax.lax.scan(body, sc, None, length=chunk)
        return out

    s1 = multi(s)
    jax.block_until_ready(s1.ps_a)

    nsteps = int(os.environ.get("BENCH_STEPS", "400"))
    nchunks = max(nsteps // chunk, 1)
    nsteps = nchunks * chunk
    t0 = time.time()
    cur = s
    for _ in range(nchunks):
        cur = multi(cur)
    jax.block_until_ready(cur.ps_a)
    wall = time.time() - t0

    gp = cfg.dim.iy * cfg.dim.jx * cfg.dim.kz
    gps = gp * nsteps / wall
    print(json.dumps({
        "metric": "grid-point-steps/s per chip (test_001 hydrostatic)",
        "value": round(gps, 1),
        "unit": "gp*steps/s",
        "vs_baseline": round(gps / BASELINE_GPS, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
