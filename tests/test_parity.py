"""Fortran-parity harness (VERDICT r1 item #1).

Three layers of validation against the reference discretization:

1. **Per-phase oracles**: the hot dynamical-core phases (9-point
   B-grid advection of UV, flux-form scalar advection, vertical flux
   divergence, 4th-order diffusion, nudge3d, psc2psd staggering) are
   re-implemented here in plain NumPy float64 *directly from the
   Fortran loop indices* (``Main/mod_advection.F90``,
   ``Main/mod_diffusion.F90``, ``Main/mod_bdycod.F90``,
   ``Main/mpplib/mod_mppparam.F90:13811``) — an independent second
   derivation — and the jitted kernels must match to roundoff.

2. **Reference-schema ICBC ingestion**: a fixture file written with
   the reference preprocessor's exact schema (ps in hPa,
   ``PreProc/ICBC/mod_write.F90:167-196``; CF time units with an
   arbitrary epoch) must cold-start the model identically to the
   native-schema file.

3. **Golden N-step regression** (the BuildBot ncdiff-RMS equivalent,
   ``Tools/Scripts/BuildBot/nc_stuff.py:27-60``): a 10-step f64
   trajectory on the test_001 configuration is compared against a
   committed golden checksum; any change to the discretization fails
   the gate.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcm_tpu.config.params import RegCMConfig
from regcm_tpu.core.grid import build_grid
from regcm_tpu.driver import Model, standard_atmosphere_state
from regcm_tpu.dynamics.hydrostatic import HydroCore


@pytest.fixture(scope="module")
def core():
    cfg = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 18, 14
    cfg.geo.ds = 60.0
    cfg.time.dt = 150.0
    grid = build_grid(cfg)
    return HydroCore(grid, cfg, dtype=jnp.float64, physics=None)


def _rand(core, shape, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape)


# ---------------------------------------------------------------------
# 1. per-phase NumPy oracles (independent index-by-index re-derivation)
# ---------------------------------------------------------------------

def test_oracle_hadv_scalar(core):
    """hadv3d ind=0 (Main/mod_advection.F90:413-425): interior cross
    ften -= xmapf*(ua2*(f+f_east) - ua1*(f_west+f) + va2*(f+f_north)
    - va1*(f_south+f)). Oracle written with explicit j/i loops."""
    g = core.grid
    kz, iy, jx = g.kz, g.iy, g.jx
    f = _rand(core, (kz, iy, jx), 1)
    ua1 = _rand(core, (kz, iy, jx), 2)
    ua2 = _rand(core, (kz, iy, jx), 3)
    va1 = _rand(core, (kz, iy, jx), 4)
    va2 = _rand(core, (kz, iy, jx), 5)
    got = np.asarray(core._hadv_scalar(
        jnp.asarray(f), jnp.asarray(ua1), jnp.asarray(ua2),
        jnp.asarray(va1), jnp.asarray(va2)))
    xmapf = np.asarray(core.xmapf)
    want = np.zeros_like(f)
    # Fortran j (x) / i (y) loops over interior cross points
    for i in range(1, iy - 2):
        for j in range(1, jx - 2):
            fx1 = f[:, i, j - 1] + f[:, i, j]
            fx2 = f[:, i, j] + f[:, i, j + 1]
            fy1 = f[:, i - 1, j] + f[:, i, j]
            fy2 = f[:, i, j] + f[:, i + 1, j]
            want[:, i, j] = -xmapf[i, j] * (
                ua2[:, i, j] * fx2 - ua1[:, i, j] * fx1
                + va2[:, i, j] * fy2 - va1[:, i, j] * fy1)
    m = np.asarray(core.m_ci) > 0.5
    np.testing.assert_allclose(got[:, m], want[:, m], rtol=1e-13,
                               atol=1e-13)
    assert np.all(got[:, ~m] == 0.0)


def test_oracle_hadvuv(core):
    """hadvuv (Main/mod_advection.F90:124-305): 9-point monotone
    B-grid momentum advection. Oracle from the Fortran ucmon*/vcmon*
    definitions with explicit loops."""
    g = core.grid
    kz, iy, jx = g.kz, g.iy, g.jx
    ua = _rand(core, (kz, iy, jx), 11)     # coupled·msfd u
    va = _rand(core, (kz, iy, jx), 12)
    ud = _rand(core, (kz, iy, jx), 13)     # decoupled
    vd = _rand(core, (kz, iy, jx), 14)
    uc = _rand(core, (kz, iy, jx), 15)     # coupled
    vc = _rand(core, (kz, iy, jx), 16)
    svv = np.zeros((kz + 1, iy, jx))       # isolate horizontal part
    gu, gv = core._advection_uv(
        jnp.asarray(ua), jnp.asarray(va), jnp.asarray(ud),
        jnp.asarray(vd), jnp.asarray(uc), jnp.asarray(vc),
        jnp.asarray(svv))
    gu, gv = np.asarray(gu), np.asarray(gv)
    dmapf = np.asarray(core.dmapf)
    wu = np.zeros_like(ua)
    wv = np.zeros_like(va)
    # shift(a, dy, dx)[i,j] = a[i+dy, j+dx]; Fortran i±1 = y, j±1 = x
    for i in range(1, iy - 1):
        for j in range(1, jx - 1):
            ucmona = ua[:, i + 1, j] + 2.0 * ua[:, i, j] + ua[:, i - 1, j]
            ucmonb = (ua[:, i + 1, j + 1] + 2.0 * ua[:, i, j + 1]
                      + ua[:, i - 1, j + 1])
            ucmonc = (ua[:, i + 1, j - 1] + 2.0 * ua[:, i, j - 1]
                      + ua[:, i - 1, j - 1])
            vcmona = va[:, i, j + 1] + 2.0 * va[:, i, j] + va[:, i, j - 1]
            vcmonb = (va[:, i + 1, j + 1] + 2.0 * va[:, i + 1, j]
                      + va[:, i + 1, j - 1])
            vcmonc = (va[:, i - 1, j + 1] + 2.0 * va[:, i - 1, j]
                      + va[:, i - 1, j - 1])
            ucb = ucmona + ucmonb
            ucc = ucmonc + ucmona
            vcb = vcmona + vcmonb
            vcc = vcmonc + vcmona
            wu[:, i, j] = -dmapf[i, j] * (
                (ud[:, i, j + 1] + ud[:, i, j]) * ucb
                - (ud[:, i, j] + ud[:, i, j - 1]) * ucc
                + (ud[:, i + 1, j] + ud[:, i, j]) * vcb
                - (ud[:, i, j] + ud[:, i - 1, j]) * vcc)
            wv[:, i, j] = -dmapf[i, j] * (
                (vd[:, i, j + 1] + vd[:, i, j]) * ucb
                - (vd[:, i, j] + vd[:, i, j - 1]) * ucc
                + (vd[:, i + 1, j] + vd[:, i, j]) * vcb
                - (vd[:, i, j] + vd[:, i - 1, j]) * vcc)
    m = np.asarray(core.m_di) > 0.5
    np.testing.assert_allclose(gu[:, m], wu[:, m], rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_allclose(gv[:, m], wv[:, m], rtol=1e-12,
                               atol=1e-12)


def test_oracle_vadv_flux(core):
    """vadv3d vertical flux divergence (Main/mod_advection.F90:297-303):
    ften[k] = (F[k] − F[k+1])/Δσ[k] with interface fluxes F."""
    g = core.grid
    kz, iy, jx = g.kz, g.iy, g.jx
    fint = _rand(core, (kz - 1, iy, jx), 21)
    got = np.asarray(core._vadv_flux(jnp.asarray(fint),
                                     jnp.zeros((kz + 1, iy, jx))))
    ds = np.asarray(core.dsigma)
    want = np.zeros((kz, iy, jx))
    for k in range(kz - 1):
        # interface k+1 flux fint[k]: into layer k (−) and k+1 (+)
        want[k] -= fint[k] / ds[k]
        want[k + 1] += fint[k] / ds[k + 1]
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-14)


def test_oracle_diffusion_4th(core):
    """diffu_x3d idiffu=1 (Main/mod_diffusion.F90:658-790): 4th-order
    −K(∇⁴) in the doubly-interior region, 2nd-order +K∇² on the first
    interior ring."""
    g = core.grid
    kz, iy, jx = g.kz, g.iy, g.jx
    f = _rand(core, (kz, iy, jx), 31)
    xk = np.abs(_rand(core, (kz, iy, jx), 32))
    got = np.asarray(core._diffu_cross(jnp.asarray(f), jnp.asarray(xk)))
    want = np.zeros_like(f)
    for i in range(1, iy - 2):
        for j in range(1, jx - 2):
            s1 = (f[:, i, j + 1] + f[:, i, j - 1] + f[:, i + 1, j]
                  + f[:, i - 1, j])
            interior2 = (2 <= i < iy - 3) and (2 <= j < jx - 3)
            if interior2:
                s2 = (f[:, i, j + 2] + f[:, i, j - 2] + f[:, i + 2, j]
                      + f[:, i - 2, j])
                want[:, i, j] = -xk[:, i, j] * (s2 - 4.0 * s1
                                                + 12.0 * f[:, i, j])
            else:
                want[:, i, j] = xk[:, i, j] * (s1 - 4.0 * f[:, i, j])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_oracle_psc2psd(core):
    """psc2psd (Main/mpplib/mod_mppparam.F90:13811-13862): cross→dot
    4-point average with 2-point edges and 1-point corners."""
    from regcm_tpu.dynamics.stencil import cross2dot
    g = core.grid
    iy, jx = g.iy, g.jx
    rng = np.random.default_rng(41)
    pc = rng.standard_normal((iy, jx))
    # dead padding row/col edge-replicated, as the model maintains it
    pc[-1, :] = pc[-2, :]
    pc[:, -1] = pc[:, -2]
    got = np.asarray(cross2dot(jnp.asarray(pc)))
    want = np.zeros((iy, jx))
    for i in range(iy):
        for j in range(jx):
            im = max(i - 1, 0)
            jm = max(j - 1, 0)
            ii = min(i, iy - 2)      # clamp into valid cross region
            jj = min(j, jx - 2)
            im = min(im, iy - 2)
            jm = min(jm, jx - 2)
            want[i, j] = 0.25 * (pc[ii, jj] + pc[im, jj]
                                 + pc[ii, jm] + pc[im, jm])
    np.testing.assert_allclose(got, want, rtol=1e-14, atol=1e-14)


def test_oracle_nudge3d(core):
    """nudge3d (Main/mod_bdycod.F90:4218): F·Δ − G·∇²Δ inside the
    relaxation zone, zero outside."""
    g = core.grid
    kz, iy, jx = g.kz, g.iy, g.jx
    diff = _rand(core, (kz, iy, jx), 51)
    got = np.asarray(core._nudge3(jnp.asarray(diff), core.nfc,
                                  core.ngc))
    fmap = np.asarray(core.nfc)
    gmap = np.asarray(core.ngc)
    want = np.zeros_like(diff)
    for i in range(1, iy - 2):
        for j in range(1, jx - 2):
            lap = (diff[:, i, j - 1] + diff[:, i, j + 1]
                   + diff[:, i - 1, j] + diff[:, i + 1, j]
                   - 4.0 * diff[:, i, j])
            want[:, i, j] = (fmap[:, i, j] * diff[:, i, j]
                             - gmap[:, i, j] * lap)
    m = np.asarray(core.m_ci) > 0.5
    np.testing.assert_allclose(got[:, m], want[:, m], rtol=1e-12,
                               atol=1e-14)


# ---------------------------------------------------------------------
# 2. reference-schema ICBC ingestion
# ---------------------------------------------------------------------

def test_reference_schema_icbc(tmp_path):
    """A fixture file in the reference preprocessor's schema (ps in
    hPa, mod_write.F90:168; non-1949 CF epoch) cold-starts the model
    identically to the native-schema file."""
    from scipy.io import netcdf_file
    from regcm_tpu.preproc.icbc import (generate_synthetic_icbc,
                                        ICBCReader, synthetic_fields)
    from regcm_tpu.preproc.terrain import synthetic_topo
    from regcm_tpu.utils.calendar import Date

    cfg = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 18, 14
    cfg.geo.ds = 60.0
    cfg.time.dt = 150.0
    topo, _, _ = synthetic_topo(cfg)

    native = str(tmp_path / "native.nc")
    generate_synthetic_icbc(cfg, topo, native, jet=8.0)

    # write the same records in the REFERENCE schema
    refpath = str(tmp_path / "reference_style.nc")
    iy, jx, kz = cfg.dim.iy, cfg.dim.jx, cfg.dim.kz
    f = netcdf_file(refpath, "w", version=2)
    f.createDimension("time", None)
    f.createDimension("kz", kz)
    f.createDimension("iy", iy)
    f.createDimension("jx", jx)
    tv = f.createVariable("time", "d", ("time",))
    tv.units = b"hours since 1900-01-01 00:00:00"
    vs = {}
    for nm in ("u", "v", "t", "qv"):
        vs[nm] = f.createVariable(nm, "d", ("time", "kz", "iy", "jx"))
    vs["ps"] = f.createVariable("ps", "d", ("time", "iy", "jx"))
    vs["ps"].units = b"hPa"
    vs["ts"] = f.createVariable("ts", "d", ("time", "iy", "jx"))
    d0 = Date.from_int(cfg.globdat.gdate1, cfg.globdat.calendar)
    d1 = Date.from_int(cfg.globdat.gdate2, cfg.globdat.calendar)
    epoch1900 = Date(1900, 1, 1, calendar=cfg.globdat.calendar)
    d = d0
    n = 0
    while d <= d1:
        flds = synthetic_fields(cfg, topo, d, jet=8.0)
        tv[n] = (d - epoch1900) / 3600.0
        for nm in ("u", "v", "t", "qv", "ts"):
            vs[nm][n] = flds[nm]
        vs["ps"][n] = flds["ps"] / 100.0      # hPa like the reference
        n += 1
        d = d.add_hours(cfg.globdat.ibdyfrq)
    f.close()

    m1 = Model(cfg, dtype=jnp.float64)
    m1.init_from_icbc(ICBCReader(native, cfg.globdat.calendar))
    m2 = Model(cfg, dtype=jnp.float64)
    m2.init_from_icbc(ICBCReader(refpath, cfg.globdat.calendar))
    # tolerance bound: the native writer stores float32 records while
    # the reference-style fixture is float64 — agreement to f32
    # roundoff proves the schema/unit handling
    for name in ("ps_a", "t_a", "qx_a", "u_a", "v_a", "tg"):
        np.testing.assert_allclose(
            np.asarray(getattr(m1.state, name)),
            np.asarray(getattr(m2.state, name)), rtol=2e-6,
            atol=1e-5, err_msg=f"reference-schema ingest differs: {name}")
    # and the run proceeds equivalently
    m1.run_icbc(3)
    m2.run_icbc(3)
    np.testing.assert_allclose(np.asarray(m1.state.t_a),
                               np.asarray(m2.state.t_a),
                               rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------
# 3. golden N-step regression (BuildBot ncdiff-RMS equivalent)
# ---------------------------------------------------------------------

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "golden_test001.npz")


def _golden_trajectory():
    cfg = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 16, 20, 14
    cfg.geo.ds = 60.0
    cfg.time.dt = 150.0
    grid = build_grid(cfg)
    s0 = standard_atmosphere_state(grid, cfg, jnp.float64,
                                   perturb=0.3, seed=2024)
    m = Model(cfg, grid=grid, dtype=jnp.float64, initial_state=s0)
    for _ in range(10):
        m.step()
    dec = m.decoupled()
    return {k: np.asarray(dec[k]) for k in
            ("ps", "t", "qv", "u", "v")}


def test_golden_regression():
    """10-step full-physics f64 trajectory vs the committed golden
    fields — the acceptance gate: any discretization change must be
    deliberate (regenerate with tools/make_golden.py)."""
    got = _golden_trajectory()
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file missing — run tools/make_golden.py")
    want = np.load(GOLDEN)
    for k in ("ps", "t", "qv", "u", "v"):
        rms = float(np.sqrt(np.mean((got[k] - want[k]) ** 2)))
        scale = float(np.sqrt(np.mean(want[k] ** 2))) + 1e-30
        assert rms / scale < 1e-7, \
            f"golden regression: {k} RMS {rms:.3e} (rel {rms/scale:.2e})"


def test_oracle_hadv_upstream(core):
    """Courant-weighted upstream interface values (hadvt upstream
    branch, Main/mod_advection.F90:337-349): fx = (1+f1)·f_up +
    (1-f1)·f_down with f1 = ½·ul·(ua1+ua2)/ps, ul = uoffc·½·dt/dx.
    Index-by-index NumPy oracle; the defaults must select this path
    for the sigma-p cores exactly as mod_params.F90:646 forces."""
    g = core.grid
    kz, iy, jx = g.kz, g.iy, g.jx
    assert core.upstream_mode and core.stability_enhance
    assert core.t_extrema == 5.0 and core.q_rel_extrema == 0.20
    f = _rand(core, (kz, iy, jx), 11)
    ua1 = _rand(core, (kz, iy, jx), 12)
    ua2 = _rand(core, (kz, iy, jx), 13)
    va1 = _rand(core, (kz, iy, jx), 14)
    va2 = _rand(core, (kz, iy, jx), 15)
    ps = 96.0 + 0.1 * _rand(core, (iy, jx), 16)
    got = np.asarray(core._hadv_scalar(
        jnp.asarray(f), jnp.asarray(ua1), jnp.asarray(ua2),
        jnp.asarray(va1), jnp.asarray(va2), ps=jnp.asarray(ps)))
    xmapf = np.asarray(core.xmapf)
    ul = core.ul_adv
    want = np.zeros_like(f)
    for i in range(1, iy - 2):
        for j in range(1, jx - 2):
            f1 = 0.5 * ul * (ua2[:, i, j] + ua1[:, i, j]) / ps[i, j]
            f2 = 0.5 * ul * (va2[:, i, j] + va1[:, i, j]) / ps[i, j]
            fx1 = (1 + f1) * f[:, i, j - 1] + (1 - f1) * f[:, i, j]
            fx2 = (1 + f1) * f[:, i, j] + (1 - f1) * f[:, i, j + 1]
            fy1 = (1 + f2) * f[:, i - 1, j] + (1 - f2) * f[:, i, j]
            fy2 = (1 + f2) * f[:, i, j] + (1 - f2) * f[:, i + 1, j]
            want[:, i, j] = -xmapf[i, j] * (
                ua2[:, i, j] * fx2 - ua1[:, i, j] * fx1
                + va2[:, i, j] * fy2 - va1[:, i, j] * fy1)
    m = np.asarray(core.m_ci) > 0.5
    np.testing.assert_allclose(got[:, m], want[:, m], rtol=1e-13,
                               atol=1e-13)


def test_oracle_stability_guard(core):
    """stability_enhance extrema clamp (mod_advection.F90:354-387):
    a sharp local max may not warm further, a sharp local min may not
    cool further; smooth fields pass through untouched."""
    kz, iy, jx = core.grid.kz, core.grid.iy, core.grid.jx
    ps = jnp.full((iy, jx), 96.0)
    smooth = jnp.broadcast_to(
        jnp.linspace(280.0, 300.0, jx)[None, None, :] * 96.0,
        (kz, iy, jx))
    fg = jnp.ones((kz, iy, jx))
    out = core._stability_guard(fg, smooth, ps, "abs")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(fg))
    spike = smooth.at[:, 5, 5].add(96.0 * 10.0)    # +10 K local max
    out = core._stability_guard(fg, spike, ps, "abs")
    assert float(out[0, 5, 5]) == 0.0              # clamped to ≤ 0
    assert float(out[0, 5, 7]) == 1.0              # neighbors free
    dip = smooth.at[:, 5, 5].add(-96.0 * 10.0)
    out = core._stability_guard(-fg, dip, ps, "abs")
    assert float(out[0, 5, 5]) == 0.0              # min may not cool
