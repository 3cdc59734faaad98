"""MOLOCH non-hydrostatic core tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcm_tpu.config.params import RegCMConfig
from regcm_tpu.core.grid import build_grid
from regcm_tpu.dynamics.moloch import MolochCore, HZITA


def _core(iy=20, jx=24, kz=23, ds=3.0, dt=20.0):
    cfg = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = iy, jx, kz
    cfg.geo.ds = ds
    cfg.time.dt = dt
    cfg.core.idynamic = 3
    grid = build_grid(cfg)
    return MolochCore(grid, cfg)


def _bdy(st):
    z = jnp.zeros_like
    return dict(pai0=st.pai, pait=z(st.pai), t0=st.t, tt=z(st.t),
                qv0=st.qx[0], qvt=z(st.t), u0=st.u, ut=z(st.u),
                v0=st.v, vt=z(st.v))


def test_zita_metrics():
    core = _core()
    # fmzf positive (0 at top), monotone-ish stretching; zeta decreasing
    # with k (index 0 = top)
    f = np.asarray(core.fmzf)
    assert f[0].max() == 0.0
    assert np.all(f[1:] > 0.0)
    z = np.asarray(core.zeta)
    assert np.all(np.diff(z[:, 5, 5]) < 0.0)
    assert z[-1, 5, 5] < 200.0          # lowest level near ground
    assert core.dz == pytest.approx(HZITA / core.kz)


def test_moloch_rest_state():
    """Resting balanced atmosphere: w residual stays small, ps steady
    (the analogue of the hydrostatic rest test for the NH core)."""
    core = _core()
    st = core.initial_state()
    bdy = _bdy(st)
    step = jax.jit(core.step)
    s = st
    for _ in range(30):
        s, d = step(s, bdy, 0.0)
    assert bool(jnp.all(jnp.isfinite(s.pai)))
    assert float(jnp.abs(s.w).max()) < 1.0
    assert float(jnp.abs(s.u).max()) < 0.1
    p_sfc = float(d["pmax"])
    assert 9.9e4 < p_sfc < 1.02e5


def test_waf_monotone_conservative():
    """WAF advection: square wave advects without new extrema and
    conserves mass (wafone, Main/mod_moloch.F90:1098)."""
    core = _core(iy=10, jx=60, kz=14, ds=1.0, dt=10.0)
    kz, iy, jx = core.kz, core.iy, core.jx
    u = jnp.full((kz, iy, jx), 10.0)
    v = jnp.zeros((kz, iy, jx))
    s = jnp.zeros((kz + 1, iy, jx))
    pp = jnp.zeros((kz, iy, jx)).at[:, :, 20:30].set(1.0)
    p1 = pp
    for _ in range(20):
        p1 = core._wafone(p1, u, v, s, 10.0)
    assert float(p1.max()) <= 1.0 + 1e-12
    assert float(p1.min()) >= -1e-12
    np.testing.assert_allclose(float(p1[7, 5, 1:-2].sum()),
                               float(pp[7, 5, 1:-2].sum()), rtol=1e-8)
    # the wave moved ~2 cells downstream
    c0 = float(jnp.argmax(jnp.cumsum(pp[7, 5]) >= 5.0))
    c1 = float(jnp.argmax(jnp.cumsum(p1[7, 5]) >= 5.0))
    assert 1.0 <= c1 - c0 <= 3.0


def test_moloch_model_with_physics():
    """idynamic=3 is a first-class Model target: full PhysicsSuite
    coupled through physical_parametrizations (mod_moloch.F90:1386),
    uncoupled tendencies, tenxtouvten wind staggering."""
    cfg = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    cfg.core.idynamic = 3
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 20, 24, 20
    cfg.geo.ds = 10.0
    cfg.time.dt = 60.0
    from regcm_tpu.driver import Model
    from regcm_tpu.dynamics.moloch import MolochCore as MC
    m = Model(cfg, dtype=jnp.float64)
    assert isinstance(m.core, MC)
    for _ in range(4):
        d = m.step()
    assert m.check_finite()
    dec = m.decoupled()
    assert 990.0 < dec["ps"].mean() < 1030.0
    # physics state was engaged (radiation ran on the first step)
    assert float(jnp.abs(m.state.heatrt).max()) > 0.0
    assert float(jnp.abs(m.state.hfx).max()) >= 0.0


def test_moloch_icbc_driven():
    """ICBC-driven MOLOCH: sigma-level records interpolated to zita
    (fields_from_sigma + paicompute, Main/mod_bdycod.F90:5125)."""
    import os
    import tempfile
    cfg = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    cfg.core.idynamic = 3
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 20, 24, 20
    cfg.geo.ds = 20.0
    cfg.time.dt = 60.0
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.driver import Model
    from regcm_tpu.preproc.icbc import (generate_synthetic_icbc,
                                        ICBCReader)
    from regcm_tpu.preproc.terrain import synthetic_topo
    topo, _, _ = synthetic_topo(cfg)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "icbc.nc")
        generate_synthetic_icbc(cfg, topo, path, jet=10.0)
        m = Model(cfg, dtype=jnp.float64)
        m.init_from_icbc(ICBCReader(path, cfg.globdat.calendar))
        # initialization is close to hydrostatic balance: surface p
        # from pai within ~2 hPa of the record ps
        dec = m.decoupled()
        assert 980.0 < dec["ps"].mean() < 1040.0
        m.run_icbc(4)
        assert m.check_finite()
        assert float(jnp.abs(m.state.w).max()) < 5.0


def test_warm_bubble_rises():
    """3 K bubble develops an ascending updraft (classic NH thermal)."""
    core = _core(iy=24, jx=30, kz=30, ds=1.0, dt=8.0)
    st = core.initial_state(bubble=(3.0, 12, 15, 3000.0, 1500.0))
    bdy = _bdy(st)
    step = jax.jit(core.step)
    s = st
    zpeak = []
    for n in range(60):
        s, d = step(s, bdy, 0.0)
        if (n + 1) % 20 == 0:
            w = np.asarray(s.w)
            kmax = np.unravel_index(np.argmax(w), w.shape)[0]
            zpeak.append(float(np.asarray(core.zetaf)[kmax, 12, 15]))
    assert bool(jnp.all(jnp.isfinite(s.w)))
    wmax = float(jnp.max(s.w))
    assert 0.3 < wmax < 30.0
    # updraft maximum ascends
    assert zpeak[-1] > zpeak[0]


def test_pallas_tridiag_w_equivalence():
    """The Pallas implicit-w kernel (interpret mode) is bit-identical
    to the lax.scan Thomas sweeps it replaces (sound,
    mod_moloch.F90:838-905)."""
    from regcm_tpu.dynamics.pallas_kernels import tridiag_w
    rng = np.random.default_rng(7)
    n, iy, jx = 40, 24, 40
    wexpl = jnp.asarray(rng.normal(size=(n, iy, jx)))
    zm = jnp.asarray(rng.uniform(0.01, 0.5, (n, iy, jx)))
    zp = jnp.asarray(rng.uniform(0.01, 0.5, (n, iy, jx)))
    wbot = jnp.asarray(rng.normal(size=(iy, jx)))
    got = np.asarray(tridiag_w(wexpl, zm, zp, wbot, interpret=True))

    def up_body(carry, K):
        w_kp1, wwkw_kp1 = carry
        i = K - 1
        zrapp = 1.0 / (1.0 + zm[i] + zp[i] - zm[i] * wwkw_kp1)
        w_k = zrapp * (wexpl[i] + zm[i] * w_kp1)
        return (w_k, zrapp * zp[i]), (w_k, zrapp * zp[i])

    kz = n + 1
    _, (wpr, wwr) = jax.lax.scan(
        up_body, (wbot, jnp.zeros_like(wbot)),
        jnp.arange(kz - 1, 0, -1))
    wprov, wwkw = jnp.flip(wpr, 0), jnp.flip(wwr, 0)

    def dn_body(w_km1, i):
        w_k = wprov[i] + wwkw[i] * w_km1
        return w_k, w_k

    _, want = jax.lax.scan(dn_body, jnp.zeros_like(wbot),
                           jnp.arange(kz - 1))
    np.testing.assert_array_equal(got, np.asarray(want))


def _waf_inputs(core, seed=11):
    """Random-but-smooth WAF operands on the core's grid."""
    rng = np.random.default_rng(seed)
    kz, iy, jx = core.kz, core.iy, core.jx
    sm = lambda sh: jnp.asarray(
        rng.normal(size=sh) + 10.0 * np.sin(
            np.linspace(0, 3, np.prod(sh)).reshape(sh)))
    fields = sm((3, kz, iy, jx))
    u = 8.0 + sm((kz, iy, jx)) * 0.5
    v = -5.0 + sm((kz, iy, jx)) * 0.5
    s = sm((kz + 1, iy, jx)) * 0.1
    return fields, u, v, s


def test_pallas_waf_equivalence():
    """The fused WAF kernel (interpret mode) matches the XLA _wafone
    path (wafone, mod_moloch.F90:1098-1361) to f64 roundoff."""
    from regcm_tpu.dynamics.pallas_kernels import waf_advect
    core = _core(iy=16, jx=16, kz=14)
    fields, u, v, s = _waf_inputs(core)
    dta = core.dtsec / core.nadv
    want = jax.vmap(lambda f: core._wafone(f, u, v, s, dta))(fields)
    got = waf_advect(fields, u * core.rmu[None], v * core.rmv[None],
                     s, core.fmz, core.fmzf, core.mx2, core.m_ci,
                     dta / core.dx, dta / core.dz, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


def test_pallas_waf_sharded_equivalence():
    """shard_map-wrapped WAF kernel (explicit ppermute halos,
    VERDICT r4 next #2) == the single-device kernel == the XLA path,
    on the 8-device CPU mesh."""
    from regcm_tpu.dynamics.pallas_kernels import (waf_advect,
                                                  waf_advect_sharded)
    from regcm_tpu.parallel.mesh import make_mesh
    core = _core(iy=16, jx=16, kz=14)
    fields, u, v, s = _waf_inputs(core)
    dta = core.dtsec / core.nadv
    args = (fields, u * core.rmu[None], v * core.rmv[None], s,
            core.fmz, core.fmzf, core.mx2, core.m_ci,
            dta / core.dx, dta / core.dz)
    want = waf_advect(*args, interpret=True)
    mesh = make_mesh()
    got = waf_advect_sharded(mesh, *args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


def test_pallas_tridiag_w_sharded_equivalence():
    """Column-local implicit-w solve under shard_map == single-device."""
    from regcm_tpu.dynamics.pallas_kernels import (tridiag_w,
                                                   tridiag_w_sharded)
    from regcm_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(3)
    n, iy, jx = 13, 16, 16
    wexpl = jnp.asarray(rng.normal(size=(n, iy, jx)))
    zm = jnp.asarray(rng.uniform(0.01, 0.5, (n, iy, jx)))
    zp = jnp.asarray(rng.uniform(0.01, 0.5, (n, iy, jx)))
    wbot = jnp.asarray(rng.normal(size=(iy, jx)))
    want = tridiag_w(wexpl, zm, zp, wbot, interpret=True)
    mesh = make_mesh()
    got = tridiag_w_sharded(mesh, wexpl, zm, zp, wbot, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_pbl_tridiag_equivalence():
    """The Pallas PBL implicit-diffusion kernel (interpret mode)
    matches the lax.scan Thomas sweeps (holtbl tridiagonal,
    mod_pbl_holtbl.F90:566-660), including non-tile-aligned edges."""
    from regcm_tpu.dynamics.pallas_kernels import pbl_tridiag
    from regcm_tpu.physics.pbl.holtslag import _tridiag_implicit
    rng = np.random.default_rng(3)
    ns, kz, iy, jx = 5, 18, 13, 21
    al = jnp.asarray(rng.uniform(0.1, 1.0, (kz, ns, iy, jx)))
    be = jnp.asarray(rng.uniform(0.1, 1.0, (kz, ns, iy, jx)))
    f = jnp.asarray(rng.normal(size=(kz, ns, iy, jx)))
    dt = 150.0
    ref = _tridiag_implicit(f, al, be, dt, 0.0)
    bkp = jnp.concatenate([be[1:], jnp.zeros_like(be[:1])], axis=0)
    c1 = dt * al * bkp
    c3 = (dt * al * be).at[0].set(0.0)
    c2 = 1.0 + c1 + c3
    tr = lambda a: jnp.swapaxes(a, 0, 1)
    got = tr(pbl_tridiag(tr(c1), tr(c2), tr(c3), tr(f),
                         interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)


def test_pallas_pbl_tridiag_sharded_equivalence():
    """shard_map'ped PBL solve == single-device (column-local)."""
    from regcm_tpu.dynamics.pallas_kernels import (pbl_tridiag,
                                                   pbl_tridiag_sharded)
    from regcm_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(4)
    ns, kz, iy, jx = 2, 9, 16, 16
    c1 = jnp.asarray(rng.uniform(0.0, 0.5, (ns, kz, iy, jx)))
    c3 = jnp.asarray(rng.uniform(0.0, 0.5, (ns, kz, iy, jx)))
    c2 = 1.0 + c1 + c3
    rhs = jnp.asarray(rng.normal(size=(ns, kz, iy, jx)))
    want = pbl_tridiag(c1, c2, c3, rhs, interpret=True)
    mesh = make_mesh()
    got = pbl_tridiag_sharded(mesh, c1, c2, c3, rhs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)
