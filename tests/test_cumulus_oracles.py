"""Cumulus formula-level oracles + drift fingerprints (VERDICT r3
item 5): NumPy f64 re-derivations of the scheme thermodynamics
(Tiedtke saturation machinery, Emanuel lifted parcel) plus frozen
numerical fingerprints of all three mass-flux drivers on fixed
convecting columns — any discretization drift fails these.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regcm_tpu.utils import constants as c
from regcm_tpu.utils.thermo import pfwsat


class TestTiedtkeFormulas:
    def test_fesat_fdqsat_oracle(self):
        """Mixed-phase saturation (foealfa/foeewm blend,
        mod_cu_tiedtke.F90 thermodynamic statement functions):
        alpha = min(1, ((T-Tice)/(Twat-Tice))²), es the alpha-blend
        of the liquid/ice Tetens forms; independent f64 NumPy."""
        from regcm_tpu.physics.cumulus.tiedtke import (
            fesat, fdqsat, xalpha, mlwocp, RTICE, RTWAT)
        t = np.linspace(230.0, 310.0, 41)
        a = np.minimum(1.0, ((np.clip(t, RTICE, RTWAT) - RTICE)
                             / (RTWAT - RTICE)) ** 2)
        es = c.c2es * (a * np.exp(c.c3les * (t - c.tzero)
                                  / (t - c.c4les))
                       + (1 - a) * np.exp(c.c3ies * (t - c.tzero)
                                          / (t - c.c4ies)))
        dq = (a * c.c5alvcp / (t - c.c4les) ** 2
              + (1 - a) * c.c5alscp / (t - c.c4ies) ** 2)
        lh = a * c.wlhvocp + (1 - a) * c.wlhsocp
        np.testing.assert_allclose(np.asarray(xalpha(jnp.asarray(t))),
                                   a, rtol=1e-13)
        np.testing.assert_allclose(np.asarray(fesat(jnp.asarray(t))),
                                   es, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(fdqsat(jnp.asarray(t))),
                                   dq, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(mlwocp(jnp.asarray(t))),
                                   lh, rtol=1e-13)

    def test_moistadj_oracle(self):
        """Saturation adjustment (moistadj, :5657): two Newton passes
        with the epsilon-corrected qs — independent NumPy
        re-derivation, unconditional mode."""
        from regcm_tpu.physics.cumulus.tiedtke import (
            _moistadj, QSMAX, RTICE, RTWAT)
        sp = np.array([95000.0, 70000.0, 50000.0])
        t = np.array([298.0, 280.0, 262.0])
        q = np.array([0.022, 0.009, 0.004])

        def np_qsat(tv):
            a = np.minimum(1.0, ((np.clip(tv, RTICE, RTWAT) - RTICE)
                                 / (RTWAT - RTICE)) ** 2)
            es = c.c2es * (a * np.exp(c.c3les * (tv - c.tzero)
                                      / (tv - c.c4les))
                           + (1 - a) * np.exp(
                               c.c3ies * (tv - c.tzero)
                               / (tv - c.c4ies)))
            qsr = np.minimum(QSMAX, es / sp)
            cor = 1.0 / (1.0 - c.ep1 * qsr)
            return qsr * cor, cor

        def np_dqsat(tv):
            a = np.minimum(1.0, ((np.clip(tv, RTICE, RTWAT) - RTICE)
                                 / (RTWAT - RTICE)) ** 2)
            return (a * c.c5alvcp / (tv - c.c4les) ** 2
                    + (1 - a) * c.c5alscp / (tv - c.c4ies) ** 2)

        def np_lh(tv):
            a = np.minimum(1.0, ((np.clip(tv, RTICE, RTWAT) - RTICE)
                                 / (RTWAT - RTICE)) ** 2)
            return a * c.wlhvocp + (1 - a) * c.wlhsocp

        tn, qn = t.copy(), q.copy()
        for _ in range(2):
            qsr, cor = np_qsat(tn)
            cond = (qn - qsr) / (1.0 + qsr * cor * np_dqsat(tn))
            tn = tn + np_lh(tn) * cond
            qn = qn - cond
        t1, q1 = _moistadj(jnp.asarray(sp), jnp.asarray(t),
                           jnp.asarray(q),
                           jnp.ones(3, bool), 0)
        np.testing.assert_allclose(np.asarray(t1), tn, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(q1), qn, rtol=1e-12)


class TestEmanuelFormulas:
    def test_tlift_oracle(self):
        """Lifted-parcel dry/wet virtual temperatures (tlift,
        mod_cu_em.F90:1185-1240): reversible-adiabat Newton solve on
        the liquid-water enthalpy — independent NumPy."""
        from regcm_tpu.physics.cumulus.emanuel import (
            _tlift, CL, CPVMCL)
        NL = 10
        p = np.linspace(1000.0, 300.0, NL)          # hPa
        t = np.maximum(300.0 * (p / 1000.0) ** 0.28, 210.0)[None]
        qsn = np.asarray(pfwsat(jnp.asarray(t),
                                jnp.asarray(p[None] * 100.0)))
        q = 0.85 * qsn
        gz = np.zeros((1, NL))
        for k in range(1, NL):
            tv = 0.5 * (t[0, k] + t[0, k - 1]) \
                * (1 + 0.608 * 0.5 * (q[0, k] + q[0, k - 1]))
            gz[0, k] = gz[0, k - 1] + c.rgas * tv \
                * np.log(p[k - 1] / p[k])
        nk = jnp.asarray([1])
        dry, tvd, wet, tvw, clw = _tlift(
            jnp.asarray(t), jnp.asarray(q), jnp.asarray(qsn),
            jnp.asarray(gz), jnp.asarray(p[None]), nk, NL)
        # NumPy re-derivation
        qnk, tnk, gznk = q[0, 1], t[0, 1], gz[0, 1]
        ah0 = (c.cpd * (1 - qnk) + CL * qnk) * tnk \
            + qnk * (c.wlhv - CPVMCL * (tnk - c.tzero)) + gznk
        cpp = c.cpd * (1 - qnk) + qnk * c.cpv
        tpk_dry = tnk - (gz[0] - gznk) / cpp
        np.testing.assert_allclose(np.asarray(dry[0]), tpk_dry,
                                   rtol=1e-12)
        tg, qg = t[0].copy(), qsn[0].copy()
        alv = c.wlhv - CPVMCL * (t[0] - c.tzero)
        for _ in range(2):
            s = 1.0 / (c.cpd + alv * alv * qg
                       / (c.rwat * t[0] * t[0]))
            ahg = c.cpd * tg + (CL - c.cpd) * qnk * t[0] \
                + alv * qg + gz[0]
            tg = np.maximum(tg + s * (ah0 - ahg), 35.0)
            qg = np.asarray(pfwsat(jnp.asarray(tg),
                                   jnp.asarray(p * 100.0)))
        tpk_wet = (ah0 - (CL - c.cpd) * qnk * t[0] - gz[0]
                   - alv * qg) / c.cpd
        np.testing.assert_allclose(np.asarray(wet[0]), tpk_wet,
                                   rtol=1e-12)
        assert float(clw.max()) > 0.0


# ---------------------------------------------------------------------------
# frozen driver fingerprints: any change to the scheme discretization
# fails these (regenerate deliberately with this file's __main__)
# ---------------------------------------------------------------------------

def _grell_setup():
    # finely-spaced near-surface sigma grid so the LFC sits within
    # pbcmax=50 hPa of the departure level (the reference's retry
    # cycle otherwise deactivates the column — verified against the
    # Fortran-loop oracle in test_grell_oracle.py)
    kz = 18
    x = np.linspace(0.0, 1.0, kz)
    sig = 0.995 - (0.995 - 0.03) * x ** 1.8
    psur = np.array([1013.0, 1013.0])
    p = sig[None] * (psur[:, None] - 50) + 50
    zz = 287.0 * 265.0 / 9.81 * np.log(psur[:, None] / p)
    t = np.maximum(302.0 - 0.0078 * np.minimum(zz, 7000.0)
                   - 0.0015 * np.maximum(zz - 7000.0, 0.0), 205.0)
    qs = np.asarray(pfwsat(jnp.asarray(t), jnp.asarray(p * 100)))
    q = qs * np.linspace(1.0, 0.25, kz)[None]
    q[0] *= 0.97
    q[1] *= 0.2
    vsp = np.tile(np.linspace(2, 15, kz), (2, 1))
    return (jnp.asarray(t), jnp.asarray(q), jnp.asarray(t),
            jnp.asarray(q), jnp.asarray(p), jnp.asarray(psur),
            jnp.zeros(2), jnp.asarray(vsp))


def _fingerprint_grell():
    from regcm_tpu.physics.cumulus.grell import cup
    out = cup(*_grell_setup(), 300.0, igcc=2)
    return (float(out.pratec[0]), float(jnp.sum(out.outt[0])),
            float(jnp.sum(out.outq[0])))


def _fingerprint_emanuel():
    from regcm_tpu.physics.cumulus.emanuel import cupeman
    kz = 18
    sig = np.linspace(0.995, 0.025, kz)
    ps = 1013.0
    ph = np.concatenate([[ps], 0.5 * (sig[1:] + sig[:-1]) * (ps - 50)
                         + 50, [50.0]])
    p = sig * (ps - 50) + 50
    t2 = np.tile(np.maximum(302.0 * (p / ps) ** 0.23, 200.0), (1, 1))
    qs = np.asarray(pfwsat(jnp.asarray(t2), jnp.asarray(p[None] * 100)))
    q = qs * np.concatenate([[0.9] * 4, [0.7] * 6, [0.3] * 8])[None]
    q = q / (1 + q)
    qs_s = qs / (1 + qs)
    zero = np.zeros((1, kz))
    cbmf = jnp.zeros(1)
    for _ in range(8):
        out = cupeman(jnp.asarray(t2), jnp.asarray(q),
                      jnp.asarray(qs_s), jnp.asarray(zero),
                      jnp.asarray(zero), jnp.asarray(p[None]),
                      jnp.asarray(ph[None]), cbmf, 300.0,
                      jnp.full(1, 1.1e-3), jnp.full(1, 0.999), 2)
        cbmf = out.cbmf
    return (float(out.precip[0]), float(out.cbmf[0]),
            float(jnp.sum(out.ft[0])))


def _fingerprint_tiedtke():
    from regcm_tpu.physics.cumulus.tiedtke import ntiedtke
    NK = 18
    sig = (np.arange(NK) + 0.5) / NK
    ps, ptop = 100500.0, 5000.0
    ph = ptop + sig * (ps - ptop)
    pf = ptop + np.arange(NK + 1) / NK * (ps - ptop)
    z = 287.0 * 260.0 / 9.81 * np.log(ps / ph)
    t = np.maximum(302.0 - 6.5e-3 * z, 200.0)[None]
    qsat = 0.622 * 610.78 * np.exp(
        17.27 * (t - 273.15) / (t - 35.86)) / ph[None]
    rh = np.interp(sig, [0.0, 0.5, 0.8, 1.0], [0.1, 0.4, 0.85, 0.92])
    q = qsat * rh[None]
    u = np.full((1, NK), 3.0)
    v = np.full((1, NK), -1.0)
    zf = np.zeros((1, NK + 1))
    za = np.zeros((1, NK))
    for k in range(NK - 1, -1, -1):
        tv = t[:, k] * (1 + 0.608 * q[:, k])
        zf[:, k] = zf[:, k + 1] + 287.0 * tv / 9.81 \
            * np.log(pf[k + 1] / pf[k])
        za[:, k] = 0.5 * (zf[:, k] + zf[:, k + 1])
    qhfl = np.zeros((1, NK + 1))
    qhfl[:, NK] = -8e-5
    ahfs = np.zeros((1, NK + 1))
    ahfs[:, NK] = -120.0
    j = jnp.asarray
    out = ntiedtke(j(t), j(q), j(u), j(v), j(np.zeros((1, NK))),
                   j(qhfl), j(ahfs), j(np.broadcast_to(ph, (1, NK))),
                   j(np.broadcast_to(pf, (1, NK + 1))),
                   j(za * c.egrav), j(zf * c.egrav),
                   j(np.full((1, NK), 2e-8)), j(np.zeros((1, NK))),
                   j(np.array([True])), dtcum=60.0, dx=25000.0,
                   pref=ph.copy())
    return (float(out.prate[0]), float(jnp.sum(out.tten[0])),
            float(jnp.sum(out.qten[0])))


# frozen values (f64, CPU; regenerate: python tests/test_cumulus_oracles.py)
FP_GRELL = (0.0010059489970386732, 6.335288056756288e-05, -3.0976852333703356e-06)
FP_EMANUEL = (0.0004014353598461984, 0.038221502329278345, 0.001171012023514073)
FP_TIEDTKE = (0.00027662068229764573, 0.0022717101422183375, -8.969216005952693e-07)


def _check(fp, frozen, name):
    assert frozen is not None, \
        f"{name} fingerprint not frozen — run this file as a script"
    for a, b in zip(fp, frozen):
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-30,
                                   err_msg=name)


def test_grell_fingerprint():
    _check(_fingerprint_grell(), FP_GRELL, "grell")


def test_emanuel_fingerprint():
    _check(_fingerprint_emanuel(), FP_EMANUEL, "emanuel")


def test_tiedtke_fingerprint():
    _check(_fingerprint_tiedtke(), FP_TIEDTKE, "tiedtke")


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    print("FP_GRELL =", _fingerprint_grell())
    print("FP_EMANUEL =", _fingerprint_emanuel())
    print("FP_TIEDTKE =", _fingerprint_tiedtke())


def _midlevel_profile():
    """Stable PBL, moist mid-troposphere with large-scale lifting —
    the mcbase (ktype=3) regime (mod_cu_tiedtke.F90:6255-6283)."""
    from regcm_tpu.physics.cumulus.tiedtke import ntiedtke  # noqa: F401
    NK = 24
    sig = (np.arange(NK) + 0.5) / NK
    ps, ptop = 100500.0, 5000.0
    ph = ptop + sig * (ps - ptop)
    pf = ptop + np.arange(NK + 1) / NK * (ps - ptop)
    z = 287.0 * 255.0 / 9.81 * np.log(ps / ph)
    # strongly stable lapse below 1 km (no PBL convection), moist
    # near-saturated layer between 500 and 1000 m geopotential height
    t = np.maximum(288.0 - 5.0e-3 * z, 200.0)[None]
    t[0, z > 11000] = 288.0 - 5.0e-3 * 11000
    qsat = 0.622 * 610.78 * np.exp(
        17.27 * (t - 273.15) / (t - 35.86)) / ph[None]
    rh = np.full(NK, 0.35)
    rh[(z > 450) & (z < 1100)] = 0.93
    q = qsat * rh[None]
    zf = np.zeros((1, NK + 1))
    za = np.zeros((1, NK))
    for k in range(NK - 1, -1, -1):
        tv = t[:, k] * (1 + 0.608 * q[:, k])
        zf[:, k] = zf[:, k + 1] + 287.0 * tv / 9.81 \
            * np.log(pf[k + 1] / pf[k])
        za[:, k] = 0.5 * (zf[:, k] + zf[:, k + 1])
    omega = np.where((z[None] > 300) & (z[None] < 3000), -1.2, 0.0)
    j = jnp.asarray
    base = dict(
        qctot=j(np.zeros((1, NK))), qhfl=j(np.zeros((1, NK + 1))),
        ahfs=j(np.zeros((1, NK + 1))),
        ph=j(np.broadcast_to(ph, (1, NK))),
        pf=j(np.broadcast_to(pf, (1, NK + 1))),
        geo=j(za * 9.80665), geof=j(zf * 9.80665),
        tenq_dyn=j(np.zeros((1, NK))), tent_dyn=j(np.zeros((1, NK))),
        ldland=j(np.array([True])), dtcum=600.0, dx=25000.0,
        pref=ph.copy())
    return j(t), j(q), j(omega), base


def test_tiedtke_midlevel_ktype3():
    """lmfmid starts a ktype=3 updraft from the moist lifting layer
    where the PBL-rooted search finds nothing; lmfmid=False suppresses
    it (mcbase, mod_cu_tiedtke.F90:6255-6283)."""
    from regcm_tpu.physics.cumulus.tiedtke import ntiedtke
    t, q, omega, kw = _midlevel_profile()
    zz = jnp.zeros_like(t)
    out_on = ntiedtke(t, q, zz, zz, omega=omega, lmfmid=True, **kw)
    out_off = ntiedtke(t, q, zz, zz, omega=omega, lmfmid=False, **kw)
    assert int(out_on.ktype[0]) == 3
    assert int(out_off.ktype[0]) != 3
    assert np.isfinite(np.asarray(out_on.tten)).all()
    assert float(jnp.abs(out_on.tten).max()) > 0.0
    # tracer transport is switched off for midlevel convection (:5347)
    assert not bool(out_on.ct_ldcum[0])


def test_tiedtke_lmfsmooth_finite():
    """lmfsmooth redistributes the tracer-transport fluxes at draught
    edges without breaking the implicit ctracer solve (:5387-5417)."""
    from regcm_tpu.physics.cumulus.tiedtke import ntiedtke, ctracer
    NK = 18
    sig = (np.arange(NK) + 0.5) / NK
    ps, ptop = 100500.0, 5000.0
    ph = ptop + sig * (ps - ptop)
    pf = ptop + np.arange(NK + 1) / NK * (ps - ptop)
    z = 287.0 * 260.0 / 9.81 * np.log(ps / ph)
    t = np.maximum(302.0 - 6.5e-3 * z, 200.0)[None]
    qsat = 0.622 * 610.78 * np.exp(
        17.27 * (t - 273.15) / (t - 35.86)) / ph[None]
    rh = np.interp(sig, [0.0, 0.5, 0.8, 1.0], [0.1, 0.4, 0.85, 0.92])
    q = qsat * rh[None]
    zf = np.zeros((1, NK + 1))
    za = np.zeros((1, NK))
    for k in range(NK - 1, -1, -1):
        tv = t[:, k] * (1 + 0.608 * q[:, k])
        zf[:, k] = zf[:, k + 1] + 287.0 * tv / 9.81 \
            * np.log(pf[k + 1] / pf[k])
        za[:, k] = 0.5 * (zf[:, k] + zf[:, k + 1])
    qhfl = np.zeros((1, NK + 1)); qhfl[:, NK] = -8e-5
    ahfs = np.zeros((1, NK + 1)); ahfs[:, NK] = -120.0
    j = jnp.asarray
    args = (j(t), j(q), j(np.full((1, NK), 3.0)),
            j(np.full((1, NK), -1.0)), j(np.zeros((1, NK))),
            j(qhfl), j(ahfs), j(np.broadcast_to(ph, (1, NK))),
            j(np.broadcast_to(pf, (1, NK + 1))),
            j(za * c.egrav), j(zf * c.egrav),
            j(np.full((1, NK), 2e-8)), j(np.zeros((1, NK))),
            j(np.array([True])))
    from functools import partial
    run = partial(ntiedtke, dtcum=60.0, dx=25000.0, pref=ph.copy())
    out_s = run(*args, lmfsmooth=True)
    out_n = run(*args, lmfsmooth=False)
    assert bool(out_s.ct_ldcum[0])
    qtr = j(np.full((1, NK, 2), 1e-9))
    for out in (out_s, out_n):
        tend = ctracer(qtr, out, j(np.broadcast_to(pf, (1, NK + 1))),
                       60.0)
        assert np.isfinite(np.asarray(tend)).all()
    # smoothing moves flux between mfu and the detrainment rate but
    # the draught-edge total is preserved at cloud top
    kt = int(out_s.kctop[0])
    tot_s = float(out_s.ct_mfu[0, kt] + out_s.ct_udrate[0, kt])
    tot_n = float(out_n.ct_mfu[0, kt] + out_n.ct_udrate[0, kt])
    np.testing.assert_allclose(tot_s, tot_n, rtol=1e-12)


def test_emanuel_tracer_transport():
    """cupeman's internal tracer transport (chemcutran, mod_cu_em.F90
    :454-1150): a uniform tracer feels no tendency (pure transport)
    and tracer mass is conserved exactly (:1142-1150)."""
    from regcm_tpu.physics.cumulus.emanuel import cupeman
    from regcm_tpu.utils.thermo import pfwsat
    kz = 18
    sig = np.linspace(0.995, 0.025, kz)
    ps = 1013.0
    ph = np.concatenate([[ps], 0.5 * (sig[1:] + sig[:-1]) * (ps - 50)
                         + 50, [50.0]])
    p = sig * (ps - 50) + 50
    t2 = np.tile(np.maximum(302.0 * (p / ps) ** 0.23, 200.0), (1, 1))
    qs = np.asarray(pfwsat(jnp.asarray(t2), jnp.asarray(p[None] * 100)))
    q = qs * np.concatenate([[0.9] * 4, [0.7] * 6, [0.3] * 8])[None]
    q = q / (1 + q)
    qs_s = qs / (1 + qs)
    zero = np.zeros((1, kz))
    # tracer 0 uniform; tracer 1 decays with height
    tra = np.stack([np.full(kz, 2.0e-9),
                    1.0e-8 * sig ** 2], axis=-1)[None]
    cbmf = jnp.zeros(1)
    out = None
    for _ in range(8):
        out = cupeman(jnp.asarray(t2), jnp.asarray(q),
                      jnp.asarray(qs_s), jnp.asarray(zero),
                      jnp.asarray(zero), jnp.asarray(p[None]),
                      jnp.asarray(ph[None]),
                      out.cbmf if out is not None else cbmf, 300.0,
                      jnp.full(1, 1.1e-3), jnp.full(1, 0.999), 2,
                      tra=jnp.asarray(tra))
    assert bool(out.active[0])
    ftra = np.asarray(out.ftra[0])
    assert np.isfinite(ftra).all()
    # uniform tracer: every mixing/downdraft difference vanishes
    np.testing.assert_allclose(ftra[:, 0], 0.0, atol=1e-22)
    # non-uniform tracer: transported but column mass conserved
    assert np.abs(ftra[:, 1]).max() > 0.0
    dph = ph[:-1] - ph[1:]
    col = float(np.sum(ftra[:, 1] * dph))
    assert abs(col) < 1e-12 * float(np.sum(np.abs(ftra[:, 1]) * dph))
