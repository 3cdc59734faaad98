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
    ss = build_species("SSLT")
    assert ss.ntr == 2 and ss.kind == ["sslt", "sslt"]
    su = build_species("SULF")
    assert su.names == ["SO2", "SO4"] and su.ioxclim == 1
    ae = build_species("AERO")
    assert ae.ntr == 12 and ae.iso2 == 4 and ae.aging_pairs
    dc = build_species("DCCB")
    assert dc.ntr == 50 and dc.isna == 1 and dc.igaschem == 1
    assert dc.names[-2:] == ["ANO3", "ANH4"]
    with pytest.raises(ValueError):
        build_species("MINE")


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
    cfg.chem.chemsimtype = "MINE"      # soil mineralogy: unsupported
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


class TestAerosolSpecies:
    """SSLT/CARB/SULF/POLLEN scheme physics (mod_che_seasalt/
    carbonaer/sox/pollen ports)."""

    def test_seasalt_emission_factors(self):
        """Monahan/Gong integration: accumulation-bin mass factor far
        smaller than coarse bin; flux scales as u^3.41 over ocean."""
        from regcm_tpu.chem.seasalt import SeasaltEmission
        se = SeasaltEmission()
        macc, mcor = se.emfac_mass
        assert 0.0 < macc < mcor
        # published Monahan-integrated magnitudes: coarse-mode factor
        # O(1e-13..1e-11) kg/m²/s per u^3.41 unit
        assert 1e-15 < macc < 1e-11
        assert 1e-14 < mcor < 1e-10
        u = jnp.asarray([[5.0, 10.0]])
        ocean = jnp.asarray([[1.0, 1.0]])
        f = se(u, ocean)
        ratio = float(f[1, 0, 1] / f[1, 0, 0])
        np.testing.assert_allclose(ratio, 2.0 ** 3.41, rtol=1e-6)
        # land points emit nothing
        assert float(se(u, jnp.zeros_like(ocean)).max()) == 0.0

    def test_so2_oh_rate_oracle(self):
        """Troe-form SO2+OH rate vs an independent f64 NumPy
        evaluation of the reference formula (rrate,
        mod_che_sox.F90:395-407)."""
        from regcm_tpu.chem.sox import so2_oh_rate
        cair, temp = 2.5e19, 288.0
        rkk = 3.0e-31 * cair * (temp / 300.0) ** (-3.3)
        rki = 1.5e-12
        expo = 1.0 / (1.0 + (np.log10(rkk / rki)) ** 2)
        expect = (rkk * rki / (rkk + rki)) * 0.6 ** expo
        got = float(so2_oh_rate(jnp.asarray(cair), jnp.asarray(temp)))
        np.testing.assert_allclose(got, expect, rtol=1e-12)
        # magnitude: ~1e-12 cm³/molec/s at surface conditions
        assert 5e-13 < got < 5e-12

    def test_chemsox_converts_so2_to_so4(self):
        """Gas + aqueous pathways move SO2 → 1.5×SO4 (molar-mass
        ratio); day faster than night."""
        from regcm_tpu.chem.sox import chemsox
        kz, iy, jx = 6, 2, 2
        shp = (kz, iy, jx)
        so2 = jnp.full(shp, 1e-9)
        so4 = jnp.zeros(shp)
        rho = jnp.full(shp, 1.0)
        temp = jnp.full(shp, 285.0)
        wl = jnp.zeros(shp).at[4].set(0.3)        # LS cloud layer
        fcc = jnp.zeros(shp).at[4].set(0.5)
        fracum = jnp.zeros(shp)
        kcumtop = jnp.full((iy, jx), -1, jnp.int32)
        rembc = jnp.zeros(shp)
        oh = jnp.full(shp, 2e6)
        h2o2 = jnp.full(shp, 1e-9)
        day = jnp.ones((iy, jx))
        night = jnp.zeros((iy, jx))
        out_d = chemsox(so2, so4, rho, temp, day, wl, fcc, fracum,
                        kcumtop, rembc, oh, h2o2, 600.0)
        out_n = chemsox(so2, so4, rho, temp, night, wl, fcc, fracum,
                        kcumtop, rembc, oh, h2o2, 600.0)
        # gas pathway: sink of SO2, 1.5× source of SO4 (clear layer 0)
        assert float(out_d.so2_ten[0, 0, 0]) < 0.0
        np.testing.assert_allclose(
            float(out_d.so4_ten[0, 0, 0]),
            -1.5 * float(out_d.so2_ten[0, 0, 0]), rtol=1e-12)
        # daytime OH 199x night
        assert float(-out_d.so2_ten[0, 0, 0]) > \
            50.0 * float(-out_n.so2_ten[0, 0, 0])
        # aqueous layer converts much faster than the gas layer
        assert float(-out_d.so2_ten[4, 0, 0]) > \
            5.0 * float(-out_d.so2_ten[0, 0, 0])

    def test_carbon_aging_conserves_mass(self):
        from regcm_tpu.chem.carbon import aging_tend
        chi = jnp.zeros((4, 3, 2, 2)).at[1].set(1e-8).at[3].set(2e-8)
        ten = aging_tend(chi, [(1, 0), (3, 2)], 600.0)
        total = float(jnp.abs(ten.sum(axis=0)).max())
        assert total < 1e-22          # pairwise exchange conserves
        assert float(ten[1].min()) < 0.0 < float(ten[0].max())
        # e-folding magnitude: dt/tau of the store per unit time
        expect = 1e-8 * (1 - np.exp(-600.0 / (1.15 * 86400.0))) / 600.0
        np.testing.assert_allclose(-float(ten[1][0, 0, 0]), expect,
                                   rtol=1e-10)

    def test_gas_drydep_velocity_magnitudes(self):
        """Zhang-scheme vd for SO2/O3/HNO3: HNO3 fastest (sticky),
        all within the observed 0.01-5 cm/s range over vegetation."""
        from regcm_tpu.chem.drydep_gas import gas_drydep_velocity
        iy, jx = 3, 3
        lcov = jnp.full((iy, jx), 6, jnp.int32)   # forest class
        ustar = jnp.full((iy, jx), 0.4)
        resa = jnp.full((iy, jx), 30.0)
        met = dict(prec=jnp.zeros((iy, jx)),
                   snow=jnp.zeros((iy, jx)),
                   srad=jnp.full((iy, jx), 500.0),
                   ts=jnp.full((iy, jx), 295.0),
                   t2=jnp.full((iy, jx), 293.0),
                   rh=jnp.full((iy, jx), 0.6),
                   coszen=jnp.full((iy, jx), 0.7))
        vd = gas_drydep_velocity(["SO2", "O3", "HNO3"], lcov, 6.5,
                                 ustar, resa, **met)
        v = np.asarray(vd)[:, 0, 0] * 100.0     # cm/s
        assert np.isfinite(v).all()
        assert (v > 0.01).all() and (v < 5.0).all()
        assert v[2] > v[0] and v[2] > v[1]      # HNO3 fastest

    def test_sulf_model_runs(self):
        """test_011 (SULF) builds from its exact namelist and produces
        SO4 from seeded SO2 over a short run."""
        cfg = RegCMConfig.from_file(
            "/root/reference/Testing/test_011.in")
        cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 16, 14
        grid = build_grid(cfg)
        m = Model(cfg, grid=grid, dtype=jnp.float64)
        chi = m.state.chi_b.at[0].set(1e-9 * m.state.ps_b[None])
        m.state = m.state._replace(chi_b=chi, chi_a=chi)
        for _ in range(3):
            m.step()
        s = m.state
        assert bool(jnp.isfinite(s.chi_a).all())
        assert float(jnp.max(s.chi_a[1])) > 0.0       # SO4 produced
        assert float(jnp.max(s.chi_a[0])) < 1.05e-9 * float(
            jnp.max(s.ps_a))                          # SO2 not growing

    def test_aero_model_builds(self):
        """The full AERO mix (12 tracers: carb+SO2/SO4+dust+sslt)
        builds and steps with all pathways active."""
        cfg = RegCMConfig.from_file(NML)
        cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 12, 14, 14
        cfg.chem.chemsimtype = "AERO"
        grid = build_grid(cfg)
        # half desert (dust source), half ocean (sea-salt source) —
        # the reduced test_008 window can be all-land
        lveg = np.full((12, 14), 8)
        lveg[:, 7:] = 15
        grid.extras["lveg"] = lveg
        m = Model(cfg, grid=grid, dtype=jnp.float64)
        from regcm_tpu.dynamics.stencil import cross2dot
        psd = cross2dot(m.state.ps_a)
        u = 12.0 * psd[None] * jnp.ones_like(m.state.u_a)
        m.state = m.state._replace(u_a=u, u_b=u)
        m.step()
        m.step()
        assert bool(jnp.isfinite(m.state.chi_a).all())
        assert m.state.chi_a.shape[0] == 12
        # sea salt emitted over ocean, dust over desert
        burden = np.asarray(m.state.chi_a).sum((1, 2, 3))
        assert burden[10] + burden[11] > 0.0          # SSLT bins
        assert burden[6] + burden[7] > 0.0            # DUST bins
