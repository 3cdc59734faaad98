"""Kain-Fritsch (icup=6) tests: formula-level oracles for the lookup
tables / Gaussian mixing profile / fallout, column behavior (trigger,
CAPE-removal time scale, machine-zero water budget), and the full
Model run on a reference namelist.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcm_tpu.physics.cumulus.kain_fritsch import (
    KFTables, KFParams, kfpara, tpmix2dd, prof5, condload, envirtht,
    ALIQ, BLIQ, CLIQ, DLIQ, EP2, C1, C2, C4, P00)

NML = "/root/reference/Testing/test_001.in"
needs_ref = pytest.mark.skipif(not os.path.exists(NML),
                               reason="reference Testing corpus absent")


@pytest.fixture(scope="module")
def tab():
    return KFTables.build(5000.0)


def _thes_np(t, p, qs):
    pi = (P00 / p) ** (0.2854 * (1.0 - 0.28 * qs))
    return t * pi * np.exp((C1 / t - C2) * qs * (1.0 + C4 * qs))


class TestOracles:
    def test_lutab_inverts_thetaes(self, tab):
        """The (theta_es, p) → T table inverts the Bolton theta_es
        formula to < 5 mK over the troposphere (kf_lutab secant,
        mod_cu_kf.F90:2439-2528)."""
        for t, p in ((300.0, 95000.0), (280.0, 70000.0),
                     (255.0, 40000.0), (225.0, 20000.0)):
            es = ALIQ * np.exp((BLIQ * t - CLIQ) / (t - DLIQ))
            qs = EP2 * es / (p - es)
            thes = _thes_np(t, p, qs)
            tt, qq = tpmix2dd(tab, jnp.asarray(p), jnp.asarray(thes))
            assert abs(float(tt) - t) < 5e-3, (t, p)
            assert abs(float(qq) - qs) / qs < 1e-3

    def test_prof5_gaussian_oracle(self, tab):
        """prof5 vs a direct numerical integration of the KF90 Eq. 2
        Gaussian mixed-fraction distribution (σ=1/6, mean 0.5,
        renormalized over [0,1] with the e^{-4.5} baseline)."""
        sigma, e45, fe = 1.0 / 6.0, np.exp(-4.5), 0.202765151
        x = np.linspace(0.0, 1.0, 200001)
        phi = (np.exp(-0.5 * ((x - 0.5) / sigma) ** 2) - e45) \
            / (sigma * np.sqrt(2.0 * np.pi))
        for eq in (0.3, 0.5, 0.7, 0.9):
            # ee = ∫_0^eq f·φ df / norm; ud = ∫_eq^1 (1-f)·φ df / norm
            w = x <= eq
            ee_num = np.trapezoid(np.where(w, x * phi, 0.0), x) / fe \
                * sigma * np.sqrt(2.0 * np.pi)
            ud_num = np.trapezoid(np.where(~w, (1 - x) * phi, 0.0),
                                  x) / fe * sigma * np.sqrt(2 * np.pi)
            ee, ud = prof5(jnp.asarray(eq))
            assert abs(float(ee) - ee_num) < 2e-3, eq
            assert abs(float(ud) - ud_num) < 2e-3, eq
        # symmetry + limits
        e1, u1 = prof5(jnp.asarray(0.5))
        np.testing.assert_allclose(float(e1), float(u1), rtol=1e-10)

    def test_condload_conserves_condensate(self):
        """condload: Δ(qliq+qice) + fallout = fresh condensate
        (Ogura-Cho fallout, :2246-2308)."""
        qliq, qice = jnp.asarray(2e-3), jnp.asarray(1e-3)
        qnl, qni = jnp.asarray(5e-4), jnp.asarray(2e-4)
        ql2, qi2, wtw, qlo, qio = condload(
            qliq, qice, jnp.asarray(25.0), 600.0, 0.5, 0.1,
            qnl, qni, 0.03)
        before = float(qliq + qice + qnl + qni)
        after = float(ql2 + qi2 + qlo + qio)
        np.testing.assert_allclose(after, before, rtol=1e-12)
        assert float(qlo) > 0.0 and float(wtw) > 0.0

    def test_envirtht_matches_bolton(self, tab):
        """envirtht ≈ Bolton theta_e within the dewpoint-table
        discretization."""
        t, p, q = 295.0, 90000.0, 0.012
        got = float(envirtht(tab, jnp.asarray(p), jnp.asarray(t),
                             jnp.asarray(q)))
        # independent: tsat from e via exact log, then same formula
        e = q * p / (EP2 + q)
        tlog = np.log(e / ALIQ)
        tdpt = (CLIQ - DLIQ * tlog) / (BLIQ - tlog)
        tsat = tdpt - (0.212 + 1.571e-3 * (tdpt - 273.15)
                       - 4.36e-4 * (t - 273.15)) * (t - tdpt)
        want = (t * (P00 / p) ** (0.2854 * (1 - 0.28 * q))
                * np.exp((C1 / tsat - C2) * q * (1 + C4 * q)))
        np.testing.assert_allclose(got, want, rtol=2e-4)


def _sounding(nk=18, rh_lo=0.9, w=0.08):
    ps = 101325.0
    sig = np.linspace(0.9875, 0.025, nk)
    p0 = sig * ps
    t0 = np.maximum(302.0 + 6.2e-3 * 7500.0 * np.log(p0 / ps), 200.0)
    z0 = 287.0 * 260.0 / 9.81 * np.log(ps / p0)
    es = ALIQ * np.exp((BLIQ * t0 - CLIQ) / (t0 - DLIQ))
    qes = EP2 * es / (p0 - es)
    rh = np.clip(rh_lo - 0.5 * (z0 / 12000.0), 0.05, 0.95)
    q0 = rh * qes
    rho = p0 / (287.0 * t0 * (1 + 0.608 * q0))
    dzq = np.maximum(np.abs(np.diff(np.concatenate([[0.0], z0]))),
                     50.0)
    mk = lambda a: jnp.asarray(a[None])
    return dict(t0=mk(t0), q0=mk(q0), u0=mk(np.full(nk, 5.0)),
                v0=mk(np.zeros(nk)), z0=mk(z0), p0=mk(p0),
                rho=mk(rho), dzq=mk(dzq), w0avg=mk(np.full(nk, w)),
                tke=mk(np.full(nk, 5.0)),
                ql0=mk(np.zeros(nk)), qi0=mk(np.zeros(nk)))


class TestColumn:
    def test_deep_trigger_and_budget(self, tab):
        """Moist ascending column: deep convection triggers, warms
        aloft / dries the column, rains, and the column water budget
        closes to machine precision; subsidence column stays quiet."""
        par = KFParams()
        a = _sounding()
        out = kfpara(tab, par, **a, dt=150.0, dx=60e3, f_qi=False)
        assert bool(out.active[0]) and not bool(out.ishall[0])
        assert float(out.prate[0]) > 1e-5
        dt_prof = np.asarray(out.dtdt[0])
        assert dt_prof[5:12].min() > 0.0         # mid-level warming
        # CAPE-removal time scale within the namelist clamps
        assert 1800.0 <= float(out.timec[0]) <= 3600.0
        # machine-zero column water closure
        dp = np.asarray(a["rho"][0]) * 9.80665 * np.asarray(a["dzq"][0])
        dq = np.asarray(out.dqdt[0] + out.dqcdt[0] + out.dqidt[0]
                        + out.dqrdt[0] + out.dqsdt[0])
        col = (dq * dp).sum() / 9.80665
        np.testing.assert_allclose(col, -float(out.prate[0]),
                                   rtol=1e-10)
        # quiet case: subsidence
        q = _sounding(w=-0.05)
        out_q = kfpara(tab, par, **q, dt=150.0, dx=60e3, f_qi=False)
        assert not bool(out_q.active[0])
        assert float(jnp.abs(out_q.dtdt).max()) == 0.0

    def test_mixed_phase_feedback(self, tab):
        """f_qi=True: ice detrainment appears in dqidt; all-species
        budget still closes."""
        par = KFParams()
        a = _sounding()
        out = kfpara(tab, par, **a, dt=150.0, dx=60e3, f_qi=True)
        assert bool(out.active[0])
        assert float(jnp.abs(out.dqidt).max()) > 0.0
        dp = np.asarray(a["rho"][0]) * 9.80665 * np.asarray(a["dzq"][0])
        dq = np.asarray(out.dqdt[0] + out.dqcdt[0] + out.dqidt[0]
                        + out.dqrdt[0] + out.dqsdt[0])
        col = (dq * dp).sum() / 9.80665
        np.testing.assert_allclose(col, -float(out.prate[0]),
                                   rtol=1e-10)

    def test_shallow_fallback(self, tab):
        """Weak forcing + a shallow unstable layer → ishall with the
        TKE-scaled mass flux and zero surface rain (fbfrc=1)."""
        par = KFParams()
        a = _sounding(rh_lo=0.75, w=0.005)
        out = kfpara(tab, par, **a, dt=150.0, dx=60e3, f_qi=False)
        if bool(out.active[0]):
            assert bool(out.ishall[0])
            assert float(out.prate[0]) == 0.0
            assert float(out.timec[0]) == 600.0


@needs_ref
class TestModelKF:
    def test_icup6_model_runs(self):
        """icup=6 on the test_001 grid: builds, steps, stays finite,
        produces convective rain from a moistened low-level state."""
        from regcm_tpu.config.params import RegCMConfig
        from regcm_tpu.driver import Model
        cfg = RegCMConfig.from_file(NML)
        cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 16, 18
        cfg.physics.icup_lnd = 6
        cfg.physics.icup_ocn = 6
        m = Model(cfg, dtype=jnp.float64)
        qx = m.state.qx_a
        qx = qx.at[0, 12:].set(jnp.maximum(qx[0, 12:],
                                           0.012 * m.state.ps_a[None]))
        m.state = m.state._replace(qx_a=qx, qx_b=qx)
        for _ in range(4):
            m.step()
        s = m.state
        for f in ("t_a", "qx_a", "ps_a", "u_a", "rainc", "wavg"):
            assert np.isfinite(np.asarray(getattr(s, f))).all(), f
        assert float(jnp.max(s.rainc)) > 0.0
        assert float(jnp.max(jnp.abs(s.wavg))) > 0.0

    def test_kfparam_namelist_honored(self):
        from regcm_tpu.config.params import RegCMConfig
        cfg = RegCMConfig.from_string(
            "&kfparam\n kf_entrate = 0.05,\n kf_max_pef = 0.8,\n/\n")
        assert cfg.kf.kf_entrate == 0.05
        assert cfg.kf.kf_max_pef == 0.8
        assert cfg.kf.kf_dpp == 150.0
