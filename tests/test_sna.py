"""SNA thermodynamic equilibrium (DCCB secondary inorganic aerosol)
tests: dissociation-constant oracle vs the published Mozurkewich
(1993) values, equilibrium properties (conservation, regime behavior,
Kp satisfaction against an independent root solve), and the full
DCCB chemsimtype model run (the reference's iisoropia path,
Main/chemlib/mod_che_isorropia.F90:64-161)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from regcm_tpu.chem.sna import (nh4no3_kp, sna_equilibrium, SnaDriver,
                                W_SO4, W_NH3, W_HNO3, W_ANO3, W_ANH4,
                                RGAS, DTAESOLV)

NML = "/root/reference/Testing/test_011.in"
needs_ref = pytest.mark.skipif(not os.path.exists(NML),
                               reason="reference Testing corpus absent")


def _kp_ppb2(t, rh, p_atm=1.0):
    """Kp in (ppb at p_atm)² for readability checks."""
    kp = float(nh4no3_kp(jnp.float64(t), jnp.float64(rh)))
    c1ppb = 1e-9 * p_atm * 101325.0 / (RGAS * t)   # mol/m³ per ppb
    return kp / c1ppb ** 2


class TestKp:
    def test_dry_298(self):
        """Mozurkewich (1993): Kp(298 K, dry) ≈ 42 nb² ≈ 40 ppb²."""
        assert 30.0 < _kp_ppb2(298.0, 0.30) < 60.0

    def test_temperature_sensitivity(self):
        """Strong exponential T dependence: ~×10 per ~15 K."""
        assert _kp_ppb2(288.0, 0.3) < 0.2 * _kp_ppb2(298.0, 0.3)
        assert _kp_ppb2(273.0, 0.3) < 1.0   # winter: sub-ppb²

    def test_rh_reduces_kp_above_drh(self):
        """Above DRH (61.8% at 298 K) the aqueous branch lowers the
        dissociation product; below DRH the dry value holds."""
        dry = _kp_ppb2(298.0, 0.50)
        assert _kp_ppb2(298.0, 0.55) == dry
        assert _kp_ppb2(298.0, 0.90) < dry
        assert _kp_ppb2(298.0, 0.97) < _kp_ppb2(298.0, 0.80)


class TestEquilibrium:
    def test_sulfate_rich_no_nitrate(self):
        """TA < 2·TS: all ammonia condenses, no aerosol nitrate."""
        gnh3, ghno3 = sna_equilibrium(
            jnp.float64(1e-7), jnp.float64(1e-7), jnp.float64(5e-8),
            jnp.float64(290.0), jnp.float64(0.5))
        assert float(gnh3) == 0.0
        np.testing.assert_allclose(float(ghno3), 5e-8)

    def test_mass_conservation_and_kp(self):
        """Sulfate-poor: gas product satisfies Kp (checked against an
        independent scipy brentq root of the equilibrium condition)
        and totals are conserved."""
        from scipy.optimize import brentq
        ts, ta, tn = 2e-8, 3e-7, 2e-7
        t, rh = 285.0, 0.4
        gnh3, ghno3 = sna_equilibrium(
            jnp.float64(ts), jnp.float64(ta), jnp.float64(tn),
            jnp.float64(t), jnp.float64(rh))
        gnh3, ghno3 = float(gnh3), float(ghno3)
        kp = float(nh4no3_kp(jnp.float64(t), jnp.float64(rh)))
        fa = ta - 2.0 * ts
        # independent root: f(x) = (fa-x)(tn-x) - kp on [0, min(fa,tn)]
        f = lambda x: (fa - x) * (tn - x) - kp
        if f(0.0) > 0.0:
            x_ref = brentq(f, 0.0, min(fa, tn), xtol=1e-18)
        else:
            x_ref = 0.0
        np.testing.assert_allclose(tn - ghno3, x_ref, rtol=1e-8)
        np.testing.assert_allclose(fa - gnh3, x_ref, rtol=1e-8)
        if gnh3 > 0 and ghno3 > 0 and x_ref > 0:
            np.testing.assert_allclose(gnh3 * ghno3, kp, rtol=1e-8)

    def test_cold_humid_favors_aerosol(self):
        """Lower T and higher RH both shift nitrate into the aerosol."""
        ts, ta, tn = 1e-8, 4e-7, 2e-7
        ano3 = {}
        for key, (t, rh) in dict(warm=(298.0, 0.4), cold=(278.0, 0.4),
                                 humid=(298.0, 0.95)).items():
            _, ghno3 = sna_equilibrium(
                jnp.float64(ts), jnp.float64(ta), jnp.float64(tn),
                jnp.float64(t), jnp.float64(rh))
            ano3[key] = tn - float(ghno3)
        assert ano3["cold"] > ano3["warm"]
        assert ano3["humid"] > ano3["warm"]
        assert ano3["cold"] > 0.5 * tn        # cold: mostly aerosol

    def test_batched_grid_shapes(self):
        rng = np.random.default_rng(0)
        shp = (5, 6, 7)
        gnh3, ghno3 = sna_equilibrium(
            jnp.asarray(rng.uniform(0, 1e-7, shp)),
            jnp.asarray(rng.uniform(0, 5e-7, shp)),
            jnp.asarray(rng.uniform(0, 3e-7, shp)),
            jnp.asarray(rng.uniform(260, 310, shp)),
            jnp.asarray(rng.uniform(0.05, 0.99, shp)))
        assert gnh3.shape == shp and ghno3.shape == shp
        assert bool(jnp.isfinite(gnh3).all())
        assert float(gnh3.min()) >= 0.0 and float(ghno3.min()) >= 0.0


class TestDriver:
    def _mini(self):
        from regcm_tpu.chem.species import build_species
        spec = build_species("DCCB")
        drv = SnaDriver(spec)
        kz, iy, jx = 3, 4, 5
        rng = np.random.default_rng(2)
        chib = jnp.asarray(rng.uniform(0, 1e-9, (spec.ntr, kz, iy, jx)))
        # 270 K: Kp ≈ 0.02 nb², well below the seeded ~0.5 ppb² gas
        # product, so NH4NO3 unambiguously forms
        atms = dict(
            rhob3=jnp.full((kz, iy, jx), 1.1),
            tb3=jnp.full((kz, iy, jx), 270.0),
            rhb3=jnp.full((kz, iy, jx), 0.7))
        cpl = jnp.ones((iy, jx))
        return spec, drv, chib, atms, cpl

    def test_molar_nitrogen_conservation(self):
        """The repartition moves moles between gas and aerosol slots
        without creating mass: molar NH3+ANH4 and HNO3+ANO3 tendency
        sums vanish; every non-SNA tracer tendency is exactly zero."""
        spec, drv, chib, atms, cpl = self._mini()
        ten = np.asarray(drv(atms, None, chib, cpl, 150.0))
        nh = ten[drv.inh3] / W_NH3 + ten[drv.ianh4] / W_ANH4
        no = ten[drv.ihno3] / W_HNO3 + ten[drv.iano3] / W_ANO3
        scale = np.abs(ten[drv.inh3] / W_NH3).max() + 1e-30
        assert np.abs(nh).max() < 1e-9 * scale + 1e-25
        assert np.abs(no).max() < 1e-9 * scale + 1e-25
        others = [i for i in range(spec.ntr)
                  if i not in (drv.ih2so4, drv.inh3, drv.ihno3,
                               drv.iano3, drv.ianh4)]
        assert np.abs(ten[others]).max() == 0.0
        # sulfate is non-volatile: equilibrium leaves it unchanged
        assert np.abs(ten[drv.ih2so4]).max() < 1e-20

    def test_relaxation_timescale(self):
        """Tendency magnitude is (eq − now)/900 s (aerodriver
        dtaesolv), independent of the model dt argument."""
        spec, drv, chib, atms, cpl = self._mini()
        t1 = np.asarray(drv(atms, None, chib, cpl, 150.0))
        t2 = np.asarray(drv(atms, None, chib, cpl, 600.0))
        np.testing.assert_array_equal(t1, t2)
        # cold humid grid: seeded NH3+HNO3 must form aerosol
        assert t1[drv.iano3].max() > 0.0 or \
            np.abs(t1[drv.ihno3]).max() == 0.0


@needs_ref
class TestModelDCCB:
    def test_dccb_model_runs(self):
        """chemsimtype='DCCB' (50 tracers) builds on the test_011
        grid and runs: seeded NH3 + the CBMZ NOx/O3 photochemistry
        produce secondary ANH4/ANO3, everything finite."""
        from regcm_tpu.config.params import RegCMConfig
        from regcm_tpu.core.grid import build_grid
        from regcm_tpu.driver import Model
        cfg = RegCMConfig.from_file(NML)
        cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 10, 12, 14
        cfg.chem.chemsimtype = "DCCB"
        cfg.restart.mdate1 = 1990060112
        grid = build_grid(cfg)
        m = Model(cfg, grid=grid, dtype=jnp.float64)
        spec = m.core.physics.chem.spec
        assert spec.ntr == 50
        idx = {n: spec.names.index(n)
               for n in ("NH3", "HNO3", "ANH4", "ANO3", "O3", "NO2")}
        chi = m.state.chi_b
        ps = m.state.ps_b[None]
        mmr = lambda ppb, mw: ppb * 1e-9 * mw / 28.97
        chi = chi.at[idx["NH3"]].set(mmr(5.0, 17.0) * ps)
        chi = chi.at[idx["HNO3"]].set(mmr(2.0, 63.0) * ps)
        chi = chi.at[idx["O3"]].set(mmr(50.0, 48.0) * ps)
        chi = chi.at[idx["NO2"]].set(mmr(10.0, 46.0) * ps)
        m.state = m.state._replace(chi_a=chi, chi_b=chi)
        for _ in range(2):
            m.step()
        s = m.state
        assert bool(jnp.isfinite(s.chi_a).all())
        # equilibrium formed secondary inorganic aerosol
        assert float(jnp.max(s.chi_a[idx["ANO3"]])) > 0.0
        assert float(jnp.max(s.chi_a[idx["ANH4"]])) > 0.0
