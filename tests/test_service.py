"""Aux subsystem tests: profiler, mass budget, watchdog."""
import numpy as np
import jax.numpy as jnp
import pytest

from regcm_tpu.config.params import RegCMConfig
from regcm_tpu.core.grid import build_grid
from regcm_tpu.driver import Model, standard_atmosphere_state
from regcm_tpu.utils.service import (StepProfiler, MassTracker, watchdog,
                                     mass_budget)


@pytest.fixture(scope="module")
def model():
    cfg = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    cfg.dim.iy, cfg.dim.jx = 16, 24
    grid = build_grid(cfg)
    s = standard_atmosphere_state(grid, cfg, perturb=0.2, seed=4)
    return Model(cfg, grid=grid, initial_state=s, physics=False)


def test_profiler_sections(model):
    prof = StepProfiler()
    with prof.section("step"):
        model.step()
    with prof.section("step"):
        model.step()
    rep = prof.report()
    assert "step" in rep
    assert prof.counts["step"] == 2
    assert prof.totals["step"] > 0.0


def test_mass_tracker(model):
    mt = MassTracker(model)
    for _ in range(10):
        model.step()
    d = mt.drift()
    # dry mass conserved to high accuracy with fixed boundaries
    assert abs(d["dry_rel"]) < 1e-4
    assert abs(d["water_rel"]) < 1e-2


def test_watchdog_passes_and_raises(model):
    pmax, pmin = watchdog(model)
    assert 20.0 < pmin <= pmax < 200.0
    # poison the state → must raise (the reference fatal)
    bad = model.state._replace(ps_a=model.state.ps_a.at[5, 5].set(
        jnp.nan))
    class Dummy:
        pass
    dm = Dummy()
    dm.state = bad
    dm.grid = model.grid
    with pytest.raises(FloatingPointError):
        watchdog(dm)
