"""Core-option completion tests: ifupr=1 upper radiative BC,
ipgf=1 perturbation PGF, idiffu=2 4th-order diffusion, the
upstream-weighted advection mode, and their refusal paths."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcm_tpu.config.params import RegCMConfig
from regcm_tpu.driver import Model, nh_initial_state
from regcm_tpu.core.state import bdy_from_state

NML = "/root/reference/Testing/test_001.in"
needs_ref = pytest.mark.skipif(not os.path.exists(NML),
                               reason="reference Testing corpus absent")


def _run(ipgf=0, idiffu=1, upstream=False, steps=5):
    cfg = RegCMConfig.from_file(NML)
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 16, 20, 14
    cfg.physics.ipgf = ipgf
    cfg.physics.idiffu = idiffu
    # upstream + stability_enhance are the defaults now (the
    # reference forces both for idynamic<3, mod_params.F90:645-661);
    # upstream=False selects the centered variant for contrast
    if not upstream:
        cfg.physics.extras["upstream_mode"] = False
        cfg.physics.extras["stability_enhance"] = False
    m = Model(cfg, dtype=jnp.float64)
    for _ in range(steps):
        m.step()
    assert m.check_finite()
    return m


@needs_ref
def test_pgf_diffusion_advection_options():
    m0 = _run()
    m1 = _run(ipgf=1)
    m2 = _run(idiffu=2)
    m3 = _run(upstream=True)
    # each option is active (distinct trajectory) and stable
    assert float(jnp.abs(m1.state.u_a - m0.state.u_a).max()) > 0.0
    assert float(jnp.abs(m2.state.t_a - m0.state.t_a).max()) > 0.0
    assert float(jnp.abs(m3.state.t_a - m0.state.t_a).max()) > 0.0
    with pytest.raises(ValueError, match="idiffu"):
        _run(idiffu=3)


@needs_ref
def test_ifupr_radiative_top():
    """MM5-NH upper radiative BC (ifupr=1, mod_sound.F90:486-562):
    the top w is nonzero (waves radiate out) and the run stays
    stable; rigid lid (ifupr=0) keeps w(top)=0 exactly."""
    def nh(ifupr):
        cfg = RegCMConfig.from_file(NML)
        cfg.core.idynamic = 2
        cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 16, 20, 14
        cfg.geo.ds = 30.0
        cfg.time.dt = 90.0
        cfg.nonhydro.ifupr = ifupr
        m = Model(cfg, dtype=jnp.float64, physics=False)
        s0 = nh_initial_state(m.core, perturb=0.3)
        m.state = s0
        m.bdy = bdy_from_state(s0)
        for _ in range(6):
            m.step()
        assert m.check_finite()
        return m

    mrad = nh(1)
    mrig = nh(0)
    w_top_rad = float(jnp.abs(mrad.state.w_a[0]).max())
    w_top_rig = float(jnp.abs(mrig.state.w_a[0]).max())
    assert w_top_rig == 0.0
    assert w_top_rad > 0.0
    # trajectories genuinely differ below the top as well
    assert float(jnp.abs(mrad.state.w_a - mrig.state.w_a).max()) > 0.0
