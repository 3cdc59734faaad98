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
    m6 = _run(idiffu=3)
    # each option is active (distinct trajectory) and stable
    assert float(jnp.abs(m1.state.u_a - m0.state.u_a).max()) > 0.0
    assert float(jnp.abs(m2.state.t_a - m0.state.t_a).max()) > 0.0
    assert float(jnp.abs(m3.state.t_a - m0.state.t_a).max()) > 0.0
    assert float(jnp.abs(m6.state.t_a - m0.state.t_a).max()) > 0.0
    with pytest.raises(ValueError, match="idiffu"):
        _run(idiffu=4)


@needs_ref
def test_idiffu3_monotonic_oracle():
    """6th-order monotonic diffusion vs a literal f64 re-derivation of
    the Fortran flux loops (diffu_x3d idiffu==3 branch,
    Main/mod_diffusion.F90:736-860: h4 coefficients, index clamping,
    flux-limiter sign test on f/mpd; applied over the full interior —
    the reference's own loop covers a single row, see _diffu6
    docstring)."""
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.dynamics.hydrostatic import HydroCore
    cfg = RegCMConfig.from_file(NML)
    cfg.dim.iy, cfg.dim.jx = 12, 14
    cfg.physics.idiffu = 3
    grid = build_grid(cfg)
    core = HydroCore(grid, cfg, dtype=jnp.float64, physics=None)
    rng = np.random.default_rng(11)
    kz, iy, jx = 5, 12, 14
    f = rng.normal(size=(kz, iy, jx))
    mpd = np.asarray(grid.msfd)
    got = np.asarray(core._diffu6(
        jnp.asarray(f), jnp.asarray(f / mpd[None]),
        jnp.asarray(1.0), jnp.ones((iy, jx))))

    h1, h2, h3 = 10.0, -5.0, 1.0
    want = np.zeros_like(f)
    cl = lambda n, hi: min(max(n, 0), hi - 1)
    for k in range(kz):
        for i in range(iy):
            for j in range(jx):
                acc = 0.0
                for ax in (0, 1):            # x then y sweep
                    def g(n):
                        if ax == 0:
                            return f[k, i, cl(j + n, jx)]
                        return f[k, cl(i + n, iy), j]

                    def gl(n):
                        if ax == 0:
                            return f[k, i, cl(j + n, jx)] \
                                / mpd[i, cl(j + n, jx)]
                        return f[k, cl(i + n, iy), j] \
                            / mpd[cl(i + n, iy), j]
                    fp1 = (h1 * (g(1) - g(0)) + h2 * (g(2) - g(-1))
                           + h3 * (g(3) - g(-2)))
                    if fp1 * (gl(1) - gl(0)) <= 0.0:
                        fp1 = 0.0
                    fp0 = (h1 * (g(0) - g(-1)) + h2 * (g(1) - g(-2))
                           + h3 * (g(2) - g(-3)))
                    if fp0 * (gl(0) - gl(-1)) <= 0.0:
                        fp0 = 0.0
                    acc += fp1 - fp0
                want[k, i, j] = acc
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


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
