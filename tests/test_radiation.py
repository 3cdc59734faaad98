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
