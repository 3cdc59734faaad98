"""Observability: per-phase timing, mass budget, NaN/CFL watchdog.

TPU-native equivalents of the reference's auxiliary subsystems
(SURVEY §5):
- ``StepProfiler`` ↔ ``mod_service`` call-stack timers
  (``Main/mpplib/mod_service.F90:62-381``): wall-time per named section
  with report table; plus a hook into ``jax.profiler`` traces.
- ``mass_budget`` ↔ ``massck`` (``Main/mod_massck.F90:54``): global dry
  and water mass relative drift (a ``psum`` over the mesh when sharded).
- ``watchdog`` ↔ the syncro_rep NaN/CFL guard
  (``Main/mod_moloch.F90:437-460``): raises on non-finite ps.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class StepProfiler:
    """Named-section wall timer (mod_service equivalent)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            with jax.named_scope(name):
                yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        """time_print equivalent: per-section totals/averages."""
        lines = [f"{'section':<28}{'calls':>8}{'total_s':>12}{'avg_ms':>10}"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot = self.totals[name]
            cnt = self.counts[name]
            lines.append(f"{name:<28}{cnt:>8}{tot:>12.3f}"
                         f"{tot / max(cnt, 1) * 1e3:>10.2f}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()

    @contextmanager
    def trace(self, logdir: str):
        """Capture a jax.profiler device trace for this scope."""
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()


def mass_budget(state, grid, dsigma) -> Dict[str, jax.Array]:
    """Global dry-air and water mass (massck, Main/mod_massck.F90:54).

    Returns cb-weighted area sums; track drift relative to step 0.
    Pure/jittable: under a sharded mesh the sums become psums.
    """
    w = jnp.asarray(grid.m_cross / grid.msfx ** 2)
    dry = jnp.sum(state.ps_a * w)
    ds3 = jnp.asarray(dsigma)[:, None, None]
    water = jnp.sum(jnp.sum(state.qx_a, axis=0) * ds3 * w[None])
    return {"dry": dry, "water": water}


class MassTracker:
    """Drift reporting vs the initial state (debug_level>0 behaviour)."""

    def __init__(self, model):
        self.model = model
        b = mass_budget(model.state, model.grid, model.grid.dsigma)
        self.dry0 = float(b["dry"])
        self.water0 = float(b["water"])

    def drift(self) -> Dict[str, float]:
        b = mass_budget(self.model.state, self.model.grid,
                        self.model.grid.dsigma)
        return {
            "dry_rel": float(b["dry"]) / self.dry0 - 1.0,
            "water_rel": (float(b["water"]) / self.water0 - 1.0)
            if self.water0 != 0 else 0.0,
        }


def watchdog(model, context: str = ""):
    """NaN/CFL guard: raise like the reference fatal
    ('CFL VIOLATION', Main/mod_moloch.F90:443-450)."""
    ps = np.asarray(model.state.ps_a)
    iy, jx = ps.shape
    core = ps[1:iy - 2, 1:jx - 2]
    if not np.isfinite(core).all():
        raise FloatingPointError(
            f"CFL VIOLATION / NaN detected in surface pressure {context}"
            " — decrease dt")
    pmax, pmin = core.max(), core.min()
    if pmax > 200.0 or pmin < 20.0:       # cb sanity window
        raise FloatingPointError(
            f"surface pressure out of physical range "
            f"[{pmin:.2f}, {pmax:.2f}] cb {context}")
    return pmax, pmin
