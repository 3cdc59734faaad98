#!/usr/bin/env python
"""End-to-end smoke driver: build a model from a reference namelist,
run N steps, print diagnostics; exit nonzero on NaN/Inf.

Usage: python tools/drive_model.py [--steps N] [--namelist PATH]
       [--iy N --jx N] [--perturb K] [--dt S] [--f32]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", os.environ.get("RCM_PLATFORM", "cpu"))
from regcm_tpu.utils.jaxcache import enable_cache
enable_cache()


import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--namelist",
                    default="/root/reference/Testing/test_001.in")
    ap.add_argument("--iy", type=int, default=0)
    ap.add_argument("--jx", type=int, default=0)
    ap.add_argument("--perturb", type=float, default=0.5)
    ap.add_argument("--dt", type=float, default=0.0)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from regcm_tpu.config.params import RegCMConfig
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.driver import Model, standard_atmosphere_state

    cfg = RegCMConfig.from_file(args.namelist)
    if args.iy:
        cfg.dim.iy = args.iy
    if args.jx:
        cfg.dim.jx = args.jx
    if args.dt:
        cfg.time.dt = args.dt
    dtype = jnp.float32 if args.f32 else jnp.float64
    grid = build_grid(cfg)
    s = standard_atmosphere_state(grid, cfg, dtype=dtype,
                                  perturb=args.perturb, seed=1)
    m = Model(cfg, grid=grid, dtype=dtype, initial_state=s)
    print(f"domain {cfg.dim.iy}x{cfg.dim.jx}x{cfg.dim.kz} "
          f"ds={cfg.geo.ds}km dt={cfg.time.dt}s proj={cfg.geo.iproj} "
          f"dtype={dtype.__name__}")
    import time
    t0 = time.time()
    for n in range(args.steps):
        m.step()
    jax.block_until_ready(m.state.ps_a)
    wall = time.time() - t0
    dec = m.decoupled()
    ps = dec["ps"][:-1, :-1]
    t = dec["t"][:, :-1, :-1]
    print(f"{args.steps} steps in {wall:.2f}s "
          f"({wall / args.steps * 1000:.0f} ms/step incl. compile)")
    print(f"ps [{ps.min():.2f}, {ps.max():.2f}] hPa  "
          f"T [{t.min():.1f}, {t.max():.1f}] K  "
          f"|u|max {np.abs(dec['u']).max():.2f} m/s  "
          f"qc max {dec['qc'].max():.2e}")
    if not m.check_finite():
        print("FAIL: non-finite values in state", file=sys.stderr)
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
