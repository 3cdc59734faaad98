"""Hydrostatic core tests: rest state, perturbation stability, mass,
vertical modes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcm_tpu.config.params import RegCMConfig
from regcm_tpu.core.grid import build_grid
from regcm_tpu.driver import Model, standard_atmosphere_state
from regcm_tpu.dynamics.vmodes import compute_vmodes, make_split_coeffs
from regcm_tpu.utils.vertical import sigma_levels

TEST001 = "/root/reference/Testing/test_001.in"


@pytest.fixture(scope="module")
def cfg():
    c = RegCMConfig.from_file(TEST001)
    # smaller domain for speed; same physics configuration
    c.dim.iy, c.dim.jx = 24, 32
    return c


@pytest.fixture(scope="module")
def model(cfg):
    # dynamics-only: the exact-rest invariant excludes radiative forcing
    return Model(cfg, physics=False)


def test_vmodes_structure():
    sf, _, _ = sigma_levels(18)
    vm = compute_vmodes(sf, 5.0)
    kz = 18
    # equivalent depths real, positive, descending
    assert vm.hbar.shape == (kz,)
    assert np.all(vm.hbar > 0)
    assert np.all(np.diff(vm.hbar) <= 1e-10)
    # mode matrix invertible and normalized: sum dsigma z^2 = 1
    np.testing.assert_allclose(vm.zmatx @ vm.zmatxr, np.eye(kz), atol=1e-10)
    dsig = np.diff(sf)
    norms = np.einsum("k,kl->l", dsig, vm.zmatx ** 2)
    np.testing.assert_allclose(norms, 1.0, atol=1e-10)
    # hydros/hydroc linearization identity (vmodes internal self-test):
    # hydros·tbarh == -tbarh·log(sigmah·pd+ptop) + hydroc·log(sigma p+pt)
    w1 = vm.hydros @ vm.tbarh
    logs = np.log(vm.sigmah * vm.pd + 5.0)
    w2 = -vm.tbarh * logs[:kz] + vm.hydroc @ logs
    np.testing.assert_allclose(w1, w2, rtol=1e-9)
    # fastest mode external: equivalent depth ~ rgas*T scale (1e5-3e5)
    assert 2.0e4 < vm.hbar[0] < 5.0e5


def test_split_coeffs():
    sf, _, _ = sigma_levels(18)
    sc = make_split_coeffs(sf, 5.0, 2, 150.0)
    assert sc.aam[0] == 4 and sc.aam[1] == 2
    assert sc.dtau[0] == pytest.approx(37.5)
    assert sc.dtau[1] == pytest.approx(75.0)


def test_rest_state_preserved(model):
    """A resting, horizontally-uniform standard atmosphere is an exact
    equilibrium: every tendency must vanish identically."""
    m = model
    s0 = m.state
    for _ in range(5):
        m.step()
    dec = m.decoupled()
    assert m.check_finite()
    assert float(np.abs(dec["u"]).max()) == 0.0
    assert float(np.abs(dec["v"]).max()) == 0.0
    ps = dec["ps"][:-1, :-1]
    assert ps.max() - ps.min() < 1e-10
    # restore for other tests
    m.state = s0
    m.nstep = 0
    m.xbctime = 0.0


def test_perturbation_stable(cfg):
    """0.5 K white noise: gravity waves must radiate/damp without blowup;
    the Bleck noise level (|dps/dt|) must shrink (mod_tendency noise
    parameter print)."""
    grid = build_grid(cfg)
    s = standard_atmosphere_state(grid, cfg, perturb=0.5, seed=1)
    m = Model(cfg, grid=grid, initial_state=s)
    ptens = []
    for _ in range(30):
        d = m.step()
        ptens.append(float(jnp.mean(jnp.abs(d["pten"]))))
    assert m.check_finite()
    dec = m.decoupled()
    assert np.abs(dec["u"]).max() < 10.0
    assert 990.0 < dec["ps"][:-1, :-1].min() < 1020.0
    assert dec["t"].max() < 350.0 and dec["t"][:, :-1, :-1].min() > 150.0
    # noise decays: late-time mean |ps tendency| below early peak
    assert np.mean(ptens[-5:]) < np.max(ptens[:5])


def test_mass_conservation_interior(cfg):
    """With fixed boundaries equal to the initial state, total dry mass
    (∝ Σ ps·/msfx²) drifts only weakly (massck analogue,
    Main/mod_massck.F90:54)."""
    grid = build_grid(cfg)
    s = standard_atmosphere_state(grid, cfg, perturb=0.2, seed=2)
    m = Model(cfg, grid=grid, initial_state=s)
    w = grid.m_cross / grid.msfx ** 2
    mass0 = float(np.sum(np.asarray(m.state.ps_a) * w))
    for _ in range(20):
        m.step()
    mass1 = float(np.sum(np.asarray(m.state.ps_a) * w))
    assert abs(mass1 - mass0) / mass0 < 1e-4


def test_nh_core_stable(cfg):
    """MM5 non-hydrostatic core (idynamic=2): rest state bounded, 0.5K
    perturbation damped by the Ikawa semi-implicit acoustic solver
    (Main/mod_sound.F90:163)."""
    import copy
    c2 = copy.deepcopy(cfg)
    c2.core.idynamic = 2
    c2.geo.ds = 10.0
    c2.time.dt = 30.0
    from regcm_tpu.driver import Model, nh_initial_state
    m = Model(c2, physics=False)
    m.state = nh_initial_state(m.core, perturb=0.5, seed=5)
    for _ in range(20):
        d = m.step()
    assert m.check_finite()
    assert float(d["wmax"]) < 5.0
    assert float(d["ppmax"]) < 500.0


def test_sponge_boundary(cfg):
    """Sponge lateral boundary (iboudy=4, Main/mod_bdycod.F90:237-251,
    2597-2663): tendencies in the boundary zone blend toward the
    large-scale tendency; with static boundaries the relaxation-zone
    evolution is damped relative to iboudy=5 and the model stays
    stable."""
    import copy
    c4 = copy.deepcopy(cfg)
    c4.physics.iboudy = 4
    grid = build_grid(c4)
    assert "sponge_wc" in grid.extras
    wc = grid.extras["sponge_wc"]
    # reference weights on the distance-2 ring and interior=1
    assert wc[1, 10] == pytest.approx(0.4)
    assert wc[2, 10] == pytest.approx(0.7)
    assert wc[10, 10] == 1.0
    s = standard_atmosphere_state(grid, c4, perturb=0.2, seed=3)
    m = Model(c4, grid=grid, initial_state=s, physics=False)
    for _ in range(15):
        m.step()
    assert m.check_finite()
    ps = np.asarray(m.state.ps_a)
    assert ps.max() < 200.0 and ps.min() > 20.0


def test_nh_rayleigh_damping(cfg):
    """Upper-level Rayleigh damping to BCs (ifrayd=1, default for
    idynamic=2; Main/mod_tendency.F90:356-364, tau at
    Main/mod_bdycod.F90:5115-5123): a top-level wind anomaly decays
    faster with the damper on."""
    import copy
    from regcm_tpu.driver import Model, nh_initial_state
    res = {}
    for ifrayd in (0, 1):
        c2 = copy.deepcopy(cfg)
        c2.core.idynamic = 2
        c2.dyn.extras["idynamic"] = 2
        c2.dyn.extras["ifrayd"] = ifrayd
        c2.geo.ds = 10.0
        c2.time.dt = 30.0
        m = Model(c2, physics=False)
        m.state = nh_initial_state(m.core, perturb=0.0, seed=7)
        u = m.state.u_a.at[:3].add(
            5.0 * np.asarray(m.state.ps_a)[None])
        m.state = m.state._replace(u_a=u, u_b=u)
        for _ in range(25):
            m.step()
        ua = np.asarray(m.state.u_a / m.state.ps_a[None])
        res[ifrayd] = float(np.abs(ua[:3, 2:-2, 2:-2]).max())
        assert m.check_finite()
    assert res[1] < res[0]


def test_inflow_outflow_boundary(cfg):
    """iboudy=3 (mod_bdycod.F90:1809-2230): edge qv/qc switch between
    the external value (inflow; 0 for hydrometeors) and the interior
    extrapolation (outflow) by the edge-normal wind."""
    import copy
    from regcm_tpu.core.state import bdy_from_state, IQC
    c3 = copy.deepcopy(cfg)
    c3.physics.iboudy = 3
    grid = build_grid(c3)
    s = standard_atmosphere_state(grid, c3, perturb=0.0)
    # uniform westerly wind + cloud water stripe near the west edge
    u = s.u_a + 5.0 * np.asarray(s.ps_a)[None]
    qx = s.qx_a.at[IQC, :, :, 1:4].set(
        1e-4 * np.asarray(s.ps_a)[None, :, 1:4])
    s = s._replace(u_a=u, u_b=u, qx_a=qx, qx_b=qx)
    m = Model(c3, grid=grid, initial_state=s, physics=False)
    for _ in range(8):
        m.step()
    assert m.check_finite()
    qc = np.asarray(m.state.qx_a[IQC] / m.state.ps_a[None])
    # westerly flow: west edge is inflow → hydrometeor edge forced 0
    assert float(np.abs(qc[:, 2:-2, 0]).max()) == 0.0
    # east edge is outflow → follows the interior (non-negative, finite)
    assert np.isfinite(qc[:, :, -2]).all()


def test_semilagrangian_advection():
    """isladvec=1 (mod_sladvection.F90): a qc blob advects downstream
    under SL transport with the QMSL limiter — no new extrema — and
    the model stays finite."""
    import numpy as np
    from regcm_tpu.config.params import RegCMConfig
    from regcm_tpu.core.state import bdy_from_state
    from regcm_tpu.driver import Model, standard_atmosphere_state
    from regcm_tpu.dynamics.stencil import cross2dot
    cfg = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 16, 30, 14
    cfg.geo.ds = 60.0
    cfg.time.dt = 120.0
    cfg.physics.isladvec = 1
    cfg.physics.ipptls = 0
    m = Model(cfg, dtype=jnp.float64, physics=False)
    s = m.state
    psd = cross2dot(s.ps_a)
    u = 25.0 * psd[None] * jnp.ones_like(s.u_a)
    qc = jnp.zeros_like(s.qx_a[1])
    qc = qc.at[:, 5:11, 6:10].set(1.0e-4) * s.ps_a[None]
    qx = s.qx_a.at[1].set(qc)
    s = s._replace(u_a=u, u_b=u, qx_a=qx, qx_b=qx)
    s = m.core.init_split_storage(s)
    m.state = s
    m.bdy = bdy_from_state(s)
    for _ in range(10):
        m.step()
    q1 = np.asarray(m.state.qx_a[1] / m.state.ps_a[None])
    assert np.isfinite(q1).all()
    # QMSL keeps the field within the initial range (+ small filter slop)
    assert q1.max() <= 1.05e-4
    assert q1.min() >= -1e-12
    # blob centroid moved east (downstream)
    q0 = np.asarray(qc / s.ps_a[None])
    x = np.arange(q1.shape[-1])
    c0 = (q0.sum(axis=(0, 1)) * x).sum() / max(q0.sum(), 1e-30)
    c1 = (q1.sum(axis=(0, 1)) * x).sum() / max(q1.sum(), 1e-30)
    assert c1 > c0 + 0.3
