"""CCM3 radiation column tests.

Physical-oracle checks of the ported spectral scheme (radcsw/radclw,
Main/radlib/mod_rad_radiation.F90): flux magnitudes for a standard
mid-latitude column, the canonical CO2-doubling OLR forcing, day/night
behaviour, and cloud LW/SW effects.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcm_tpu.physics.radiation.ccm3.driver import ccm3_radiation
from regcm_tpu.physics.radiation.ccm3.tables import ghg_mmr

KZ, IY, JX = 18, 2, 2


def _column_raw(co2=355.0, cld=True, mu=0.5):
    """Column inputs + ghg dict (shared by the plain and cached runs)."""
    sig = np.linspace(0.025, 0.9875, KZ)
    ps = 101325.0
    pb = sig * ps
    pf = np.concatenate([[100.0], 0.5 * (pb[1:] + pb[:-1]), [ps]])
    t = np.maximum(288.0 + 6.5e-3 * (7000.0 * np.log(pb / ps)), 216.65)
    qv = np.minimum(0.8 * 0.622 * 610.8
                    * np.exp(17.27 * (t - 273.15) / (t - 35.85)) / pb,
                    0.02)
    qv = np.maximum(qv, 2e-6)
    dz = 287.0 * t / 9.81 * np.diff(np.log(pf))
    cldf = np.zeros(KZ)
    clw = np.zeros(KZ)
    if cld:
        cldf[12] = 0.5
        clw[12] = 0.2
    f3 = lambda a: jnp.asarray(
        np.broadcast_to(a[:, None, None], (KZ, IY, JX)))
    f3i = lambda a: jnp.asarray(
        np.broadcast_to(a[:, None, None], (KZ + 1, IY, JX)))
    f2 = lambda v: jnp.full((IY, JX), float(v))
    ghg = ghg_mmr(dict(co2=co2, ch4=1714.0, n2o=311.0,
                       cfc11=268.0, cfc12=503.0))
    args = (f3(t), f3(qv), f3(np.full(KZ, 1e-6)), f3(np.zeros(KZ)),
            f3(pb), f3i(pf), f3(np.full(KZ, 0.5)), f3(dz),
            f3(cldf), f3(clw), f2(mu), f2(t[-1]), f2(1.0), f2(45.0),
            f2(0.1), f2(0.1), f2(0.1), f2(0.1), f2(0.1), f2(0.1),
            f2(0.985))
    return args, ghg


def _column(co2=355.0, cld=True, mu=0.5):
    args, ghg = _column_raw(co2, cld, mu)
    return jax.jit(lambda *a: ccm3_radiation(*a, ghg)[0])(*args)


def test_abem_cache_equivalence():
    """getabetot dtabem cache: radiation with the cache built from the
    SAME column state must reproduce the full calculation to roundoff
    (the caching must only change WHEN the tensors refresh, not what
    radclw computes — Main/mod_rad_interface.F90:62-65). The two runs
    are different XLA programs, so the bound is codegen-ULP (~1e-13
    relative in f64), not bitwise."""
    args, ghg = _column_raw()
    full, cache = jax.jit(
        lambda *a: ccm3_radiation(*a, ghg, want_cache=True))(*args)
    assert cache is not None
    assert float(jnp.abs(cache["abstot"]).max()) > 0.0
    cached, none_out = jax.jit(
        lambda c, *a: ccm3_radiation(*a, ghg, cache=c))(cache, *args)
    assert none_out is None
    for f, a, b in zip(full._fields, full, cached):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-15, err_msg=f)


def test_flux_magnitudes():
    r = _column()
    flnt = float(r.flnt[0, 0])       # OLR
    flwds = float(r.flwds[0, 0])
    assert 180.0 < flnt < 320.0, flnt
    assert 250.0 < flwds < 420.0, flwds
    solin = float(r.solin[0, 0])
    np.testing.assert_allclose(solin, 1367.0 * 0.5, rtol=1e-6)
    fsns = float(r.swabs_sfc[0, 0])
    fsnt = float(r.fsnt[0, 0])
    assert 0.0 < fsns < fsnt < solin
    hr = np.asarray(r.heatrt) * 86400.0
    assert hr.min() > -20.0 and hr.max() < 20.0
    assert np.isfinite(hr).all()


def test_co2_doubling_reduces_olr():
    """2xCO2 instantaneous clear-ish forcing ~ 2-6 W/m2 (Kiehl &
    Briegleb 1991 band model)."""
    r1 = _column(co2=355.0, cld=False)
    r2 = _column(co2=710.0, cld=False)
    d_olr = float(r1.flnt[0, 0] - r2.flnt[0, 0])
    assert 1.0 < d_olr < 8.0, d_olr


def test_night_no_sw():
    r = _column(mu=0.0)
    assert float(r.solin[0, 0]) == 0.0
    assert float(r.swabs_sfc[0, 0]) == 0.0
    hr = np.asarray(r.heatrt) * 86400.0
    # pure LW: troposphere cools
    assert hr.mean() < 0.0


def test_cloud_effects():
    """Clouds raise downward LW at the surface and cut surface SW."""
    rc = _column(cld=True)
    r0 = _column(cld=False)
    assert float(rc.flwds[0, 0]) > float(r0.flwds[0, 0])
    assert float(rc.swabs_sfc[0, 0]) < float(r0.swabs_sfc[0, 0])
    # and reduce OLR (greenhouse effect of the cloud)
    assert float(rc.flnt[0, 0]) < float(r0.flnt[0, 0])


class TestSolarGeometry:
    """Berger orbital parameters + TSI wiring (solar1,
    Main/mod_sun.F90:258; orb_params/orb_decl,
    Share/mod_sunorbit.F90:85,496)."""

    def test_orbit_params_present_day(self):
        from regcm_tpu.utils.sun import orb_params
        o = orb_params(1990)
        # canonical present-day orbit: e≈0.0167, obliquity≈23.44°
        assert abs(o.eccen - 0.0167) < 4e-4
        assert abs(np.degrees(o.obliqr) - 23.44) < 0.02

    def test_eccf_seasonal_cycle(self):
        """±3.4% TOA cycle: perihelion (Jan 3) vs aphelion (Jul 4)."""
        from regcm_tpu.utils.sun import (orb_params, orb_decl,
                                         yearpoint)
        from regcm_tpu.utils.calendar import Date
        o = orb_params(1990)
        _, e_per = orb_decl(yearpoint(Date.from_int(1990010312)), o)
        _, e_aph = orb_decl(yearpoint(Date.from_int(1990070412)), o)
        assert 1.030 < e_per < 1.038
        assert 0.963 < e_aph < 0.970
        assert abs(e_per / e_aph - 1.069) < 0.004

    def test_declination_solstice_equinox(self):
        from regcm_tpu.utils.sun import (orb_params, orb_decl,
                                         yearpoint)
        from regcm_tpu.utils.calendar import Date
        o = orb_params(2000)
        d_jun, _ = orb_decl(yearpoint(Date.from_int(2000062112)), o)
        d_mar, _ = orb_decl(yearpoint(Date.from_int(2000032012)), o)
        assert abs(np.degrees(d_jun) - 23.44) < 0.15
        assert abs(np.degrees(d_mar)) < 0.5

    def test_tsi_table(self):
        """Lean-table TSI ~1361-1363 W/m² modern era (×0.9965 tsifac,
        Main/mod_sun.F90:40,374); isolconst pins 1367."""
        from regcm_tpu.utils.sun import solar_irradiance
        from regcm_tpu.utils.calendar import Date
        s = solar_irradiance(Date.from_int(1990060100))
        assert 1360.0 < s < 1364.0
        assert solar_irradiance(Date.from_int(1990060100),
                                isolconst=1) == 1367.0

    def test_solin_scales_with_eccf(self):
        """TOA incident flux carries the eccentricity factor
        (solin = scon·eccf·μ, mod_rad_radiation radinp)."""
        args, ghg = _column_raw()
        r_per = ccm3_radiation(*args, ghg, eccf=1.034)[0]
        r_aph = ccm3_radiation(*args, ghg, eccf=0.967)[0]
        ratio = float(r_per.solin[0, 0] / r_aph.solin[0, 0])
        assert abs(ratio - 1.034 / 0.967) < 1e-6

    def test_model_passes_eccf(self):
        """Driver threads the per-day solar state into the step (no
        hardcoded eccf=1 at the suite call site)."""
        from regcm_tpu.config.params import RegCMConfig
        from regcm_tpu.driver import Model
        cfg = RegCMConfig()
        cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 10, 12, 18
        cfg.restart.mdate1 = 1990010300      # perihelion
        m = Model(cfg)
        sol = m._solar()
        assert sol.eccf > 1.03
        m.step()
        # aphelion date → small eccf
        cfg2 = RegCMConfig()
        cfg2.dim.iy, cfg2.dim.jx, cfg2.dim.kz = 10, 12, 18
        cfg2.restart.mdate1 = 1990070400
        m2 = Model(cfg2)
        assert m2._solar().eccf < 0.97
