"""DUST chemistry tests: tables, emission, deposition budget, the
test_008 corpus case, and the aerosol direct effect.

Oracle strategy: table invariants (srel/frac normalization), a
closed tracer mass budget (burden change = accumulated emission −
deposition under calm conditions), and behavior checks on the real
``Testing/test_008.in`` configuration (dims reduced for CPU CI).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcm_tpu.config.params import RegCMConfig
from regcm_tpu.core.grid import build_grid
from regcm_tpu.driver import Model
from regcm_tpu.chem.species import build_species
from regcm_tpu.chem.dust import dust_tables, NATS, NSOIL

NML = "/root/reference/Testing/test_008.in"
needs_ref = pytest.mark.skipif(not os.path.exists(NML),
                               reason="reference Testing corpus absent")


def test_species_registry():
    s4 = build_species("DUST   ")
    assert s4.ntr == 4 and s4.names[0] == "DUST01"
    s12 = build_species("DU12")
    assert s12.ntr == 12
    with pytest.raises(ValueError):
        build_species("CBMZ")
    with pytest.raises(ValueError):
        build_species("SSLT")


def test_dust_tables_normalized():
    spec = build_species("DUST")
    t = dust_tables(spec.bin_size)
    assert t.srel.shape == (NSOIL, NATS)
    # srel is a normalized relative-surface distribution per texture
    s = t.srel.sum(axis=0)
    assert np.all((np.abs(s - 1.0) < 1e-6) | (s == 0.0))
    # Kok bin weights sum to 1 exactly (inidust renormalization)
    np.testing.assert_allclose(t.frac.sum(), 1.0, atol=1e-12)
    assert np.all(t.frac >= 0.0)
    # Alfaro fractions are sub-distributions of each mode
    for f in (t.frac1, t.frac2, t.frac3):
        assert np.all(f >= 0.0) and f.sum() <= 1.0 + 1e-9


def _build_model(mdate1=None, calm=True, desert=True, iy=20, jx=24):
    cfg = RegCMConfig.from_file(NML)
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = iy, jx, 18
    if mdate1:
        cfg.restart.mdate1 = mdate1
    grid = build_grid(cfg)
    if desert:
        lnd = np.asarray(grid.lndocn) > 0.5
        grid.extras["lveg"] = np.where(lnd, 8, 15)
    m = Model(cfg, grid=grid, dtype=jnp.float64)
    if not calm:
        from regcm_tpu.dynamics.stencil import cross2dot
        psd = cross2dot(m.state.ps_a)
        u = 12.0 * psd[None] * jnp.ones_like(m.state.u_a)
        m.state = m.state._replace(u_a=u, u_b=u)
    return m


def _burden(s, grid):
    """Total tracer mass per area summed over the grid (kg/m² × cells):
    coupled chi → Σ chi·Δσ·1000/g."""
    dsig = np.asarray(grid.dsigma)[None, :, None, None]
    return float((np.asarray(s.chi_a) * dsig).sum() * 1000.0 / 9.80665)


@needs_ref
def test_008_builds_and_emits():
    """The DUST corpus case builds from its exact namelist (no config
    refusal) and active dust tracers appear within a few steps."""
    m = _build_model(calm=False)
    assert m.core.ntr == 4
    assert m.core.physics.chem is not None
    # idirect=2 in test_008 → optics wired
    assert m.core.physics.aertab is not None
    for _ in range(4):
        m.step()
    assert m.check_finite()
    s = m.state
    assert float(s.chi_a.max()) > 0.0
    assert float(s.chemdiag[0].sum()) > 0.0          # emission accum
    # all four bins active
    for b in range(4):
        assert float(s.chi_a[b].max()) > 0.0, f"bin {b} empty"


@needs_ref
def test_dust_mass_budget_closed():
    """Calm run with an interior dust blob, nudging zeroed: burden loss
    must equal the accumulated dry deposition (settling+drydep are the
    only active sinks; no rain, no wind, no emission)."""
    cfg = RegCMConfig.from_file(NML)
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 20, 24, 18
    grid = build_grid(cfg)
    # kill lateral-boundary nudging so the budget is pure physics
    grid.nudge_fc[:] = 0.0
    grid.nudge_gc[:] = 0.0
    m = Model(cfg, grid=grid, dtype=jnp.float64)
    # smooth near-surface blob (no sharp edges: the RAW filter's
    # positivity floors would otherwise create spurious mass)
    iy, jx, kz = 20, 24, 18
    yy, xx = np.meshgrid(np.arange(iy), np.arange(jx), indexing="ij")
    horiz = np.exp(-(((yy - 10) / 3.0) ** 2 + ((xx - 12) / 3.0) ** 2))
    vert = np.exp(-((np.arange(kz) - (kz - 1)) / 2.0) ** 2)
    blob = 1e-5 * vert[:, None, None] * horiz[None]
    chi = jnp.asarray(blob)[None] * m.state.ps_a[None, None] \
        * jnp.ones((4, 1, 1, 1))
    m.state = m.state._replace(chi_a=chi, chi_b=chi)
    b0 = _burden(m.state, grid)
    for _ in range(6):
        m.step()
    assert m.check_finite()
    b1 = _burden(m.state, grid)
    lost = b0 - b1
    dd = float(np.asarray(m.state.chemdiag[1]).sum())
    em = float(np.asarray(m.state.chemdiag[0]).sum())
    wd = float(np.asarray(m.state.chemdiag[2]).sum())
    assert em == 0.0                      # calm: no emission
    assert dd > 0.0, "surface blob deposited nothing"
    # budget closure: the burden change must match −(drydep) up to the
    # small positivity-floor noise of the advection filters
    np.testing.assert_allclose(lost, dd + wd - em,
                               atol=2e-3 * b0, rtol=0.1)


@needs_ref
def test_chem_refusals_loud():
    cfg = RegCMConfig.from_file(NML)
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 12, 16, 18
    cfg.chem.chemsimtype = "CBMZ"
    with pytest.raises(ValueError, match="chemsimtype"):
        Model(cfg, dtype=jnp.float64)
    cfg.chem.chemsimtype = "DUST"
    cfg.chem.ichdrdepo = 2
    with pytest.raises(ValueError, match="ichdrdepo"):
        Model(cfg, dtype=jnp.float64)
    cfg.chem.ichdrdepo = 1
    cfg.core.idynamic = 2          # NH core: chem still refused
    with pytest.raises(ValueError, match="idynamic"):
        Model(cfg, dtype=jnp.float64)


@needs_ref
def test_dust_direct_effect_cuts_surface_sw():
    """idirect=2: a dust layer reduces surface SW at midday and leaves
    everything finite (aeroppt SW mixture + grey LW)."""
    m = _build_model(mdate1=2006060112, calm=False, iy=16, jx=20)
    chi = m.state.chi_a.at[:, 10:14].set(
        2e-5 * m.state.ps_a[None, None])
    m.state = m.state._replace(chi_a=chi, chi_b=chi)
    m.step()                       # includes do_rad + do_abem
    sw_dust = np.asarray(m.state.swsfc)
    assert m.check_finite()

    cfg2 = RegCMConfig.from_file(NML)
    cfg2.dim.iy, cfg2.dim.jx, cfg2.dim.kz = 16, 20, 18
    cfg2.restart.mdate1 = 2006060112
    cfg2.chem.idirect = 0
    g2 = build_grid(cfg2)
    lnd = np.asarray(g2.lndocn) > 0.5
    g2.extras["lveg"] = np.where(lnd, 8, 15)
    m2 = Model(cfg2, grid=g2, dtype=jnp.float64)
    from regcm_tpu.dynamics.stencil import cross2dot
    psd = cross2dot(m2.state.ps_a)
    u = 12.0 * psd[None] * jnp.ones_like(m2.state.u_a)
    m2.state = m2.state._replace(u_a=u, u_b=u, chi_a=chi, chi_b=chi)
    m2.step()
    sw_clean = np.asarray(m2.state.swsfc)
    assert (sw_clean - sw_dust).mean() > 0.5, \
        "dust direct effect did not reduce surface SW"


def test_cumtran_wellmixed_conserves():
    """cumtran (mod_che_cumtran.F90:73-118): blending toward the
    sigma-weighted mean conserves column tracer mass over the cloud
    span, makes the f=1 limit exactly well-mixed, and leaves
    no-cloud / no-transport columns untouched."""
    from regcm_tpu.chem.cumtran import cumtran
    rng = np.random.default_rng(3)
    kz, iy, jx = 12, 4, 5
    chi = jnp.asarray(rng.uniform(0.1, 2.0, (2, kz, iy, jx)))
    dsig = jnp.asarray(rng.uniform(0.5, 1.5, kz))
    f = np.zeros((kz, iy, jx))
    f[5:, :, :2] = 1.0            # cloud top at k=5, f=1 → well mixed
    f[5:, :, 2] = 0.3             # partial mixing
    dotran = np.ones((iy, jx), bool)
    dotran[:, 3] = False          # Emanuel/Tiedtke column: untouched
    (out,) = cumtran((chi,), jnp.asarray(f), dsig,
                     jnp.asarray(dotran))
    out = np.asarray(out)
    chi0 = np.asarray(chi)
    ds = np.asarray(dsig)
    # f=1 columns: uniform below cloud top, equal to the sigma mean
    bar = (chi0[:, 5:, :, 0] * ds[None, 5:, None]).sum(1) \
        / ds[5:].sum()
    np.testing.assert_allclose(out[:, 5:, :, 0],
                               np.broadcast_to(bar[:, None, :],
                                               (2, 7, iy)), rtol=1e-12)
    # mass conserved over the span in the partial column
    m0 = (chi0[:, 5:, :, 2] * ds[None, 5:, None]).sum(1)
    m1 = (out[:, 5:, :, 2] * ds[None, 5:, None]).sum(1)
    np.testing.assert_allclose(m0, m1, rtol=1e-12)
    # above cloud top and excluded columns unchanged
    np.testing.assert_array_equal(out[:, :5], chi0[:, :5])
    np.testing.assert_array_equal(out[..., 3], chi0[..., 3])
    np.testing.assert_array_equal(out[..., 4], chi0[..., 4])


@needs_ref
def test_chem_with_tiedtke_ctracer():
    """chem + icup=5: the Tiedtke internal tracer transport (ctracer)
    replaces cumtran for those columns; tracers stay finite and
    non-negative after convective impulses."""
    cfg = RegCMConfig.from_file(NML)
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 12, 16, 14
    cfg.time.dt = 120.0
    cfg.time.dtcum = 120.0
    cfg.physics.icup_lnd = 5
    cfg.physics.icup_ocn = 5
    m = Model(cfg, dtype=jnp.float64)
    chi = m.state.chi_a.at[:, 10:].set(1e-6 * m.state.ps_a[None, None])
    m.state = m.state._replace(chi_a=chi, chi_b=chi)
    for _ in range(2):
        m.step()
    for nm in ("chi_a", "chi_b", "t_a", "ps_a"):
        assert np.isfinite(np.asarray(getattr(m.state, nm))).all(), nm
    assert float(np.asarray(m.state.chi_b).min()) > -1e-10
