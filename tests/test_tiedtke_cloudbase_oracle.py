"""Tiedtke cloud-base departure-search oracle (VERDICT r4 item 5).

Independent NumPy f64 re-derivation of the reference's `cloudbase`
subroutine (mod_cu_tiedtke.F90:7043-7493) — literal sequential
Fortran loop structure: the outer departure-level sweep kk = nk..kt1,
per-column surface-flux trigger / elevated mixed-layer construction,
the entraining test-parcel ascent with moistadj (jcall=1) saturation
adjustment, the exact-LCL cloud-base backout, kinetic-energy
termination, and the first-deep-wins elevated override — compared
against the port's scan-based `cloudbase_search`.

This is NOT a fingerprint: every expected number here is derived from
the Fortran formulas by this file alone.
"""
import numpy as np
import jax.numpy as jnp

from regcm_tpu.utils import constants as c
from regcm_tpu.physics.cumulus.tiedtke import (
    cloudbase_search, QSMAX, RTICE, RTWAT, RKAP, RDEPTHS,
    ENTRPEN_LND)


# ------------------------- Fortran-formula thermodynamics ----------

def _alpha(t):
    return np.minimum(1.0, ((np.clip(t, RTICE, RTWAT) - RTICE)
                            / (RTWAT - RTICE)) ** 2)


def _fesat(t):
    a = _alpha(t)
    return c.c2es * (a * np.exp(c.c3les * (t - c.tzero)
                                / (t - c.c4les))
                     + (1 - a) * np.exp(c.c3ies * (t - c.tzero)
                                        / (t - c.c4ies)))


def _mlwocp(t):
    a = _alpha(t)
    return a * c.wlhvocp + (1 - a) * c.wlhsocp


def _moistadj1(sp, t, q):
    """moistadj jcall=1 (:5671-5704): condense-only, two explicit
    mixed-phase Newton corrections; scalar, one column, one level."""
    rp = 1.0 / sp
    zl = 1.0 / (t - c.c4les)
    zi = 1.0 / (t - c.c4ies)
    a = _alpha(t)
    qs = c.c2es * (a * np.exp(c.c3les * (t - c.tzero) * zl)
                   + (1 - a) * np.exp(c.c3ies * (t - c.tzero) * zi))
    qs = min(QSMAX, qs * rp)
    cor = 1.0 - c.ep1 * qs
    zf = a * c.c5alvcp * zl ** 2 + (1 - a) * c.c5alscp * zi ** 2
    cond = (q * cor ** 2 - qs * cor) / (cor ** 2 + qs * zf)
    if cond > 0.0:
        t = t + _mlwocp(t) * cond
        q = q - cond
        zl = 1.0 / (t - c.c4les)
        zi = 1.0 / (t - c.c4ies)
        a = _alpha(t)
        qs = c.c2es * (a * np.exp(c.c3les * (t - c.tzero) * zl)
                       + (1 - a) * np.exp(c.c3ies * (t - c.tzero)
                                          * zi))
        qs = min(QSMAX, qs * rp)
        cor = 1.0 - c.ep1 * qs
        zf = a * c.c5alvcp * zl ** 2 + (1 - a) * c.c5alscp * zi ** 2
        cond1 = (q * cor ** 2 - qs * cor) / (cor ** 2 + qs * zf)
        if abs(cond) < 1e-30:
            cond1 = 0.0
        t = t + _mlwocp(t) * cond1
        q = q - cond1
    return t, q


# ------------------------- the oracle ------------------------------

def cloudbase_oracle(t, q, tf, qf, qs, pf, geof, ahfs, qhfl,
                     entrpen, kt1, kt2):
    """Literal 0-based transcription of `cloudbase`
    (mod_cu_tiedtke.F90:7043-7493). All scalars, Python loops."""
    npx, nk = t.shape
    tu = tf.copy()
    qu = qf.copy()
    lu = np.zeros_like(t)
    ilab = np.zeros((npx, nk), np.int64)
    xsenh = c.cpd * tf + geof[:, :nk]
    xtu = tu.copy()
    xqu = qu.copy()
    xlu = lu.copy()
    suh = np.zeros_like(t)
    wu2h = np.zeros_like(t)
    buoh = np.zeros_like(t)
    iilab = ilab.copy()
    wubase = np.zeros(npx)
    llgo_on = np.ones(npx, bool)
    llfirst = np.ones(npx, bool)
    lldeep = np.zeros(npx, bool)
    idpl = np.full(npx, nk - 1, np.int64)
    kcbot = np.full(npx, -1, np.int64)
    ictop0 = np.full(npx, -1, np.int64)
    ldcum = np.zeros(npx, bool)
    c2, epsadd = 0.55, 1.0e-4

    for kk in range(nk - 1, kt1 - 1, -1):
        iidpl = np.full(npx, kk, np.int64)
        icbot = np.full(npx, kk, np.int64)
        ictop = np.full(npx, nk - 2, np.int64)
        lldcum = np.zeros(npx, bool)
        ll_ldbase = np.zeros(npx, bool)
        # ---- departure-level init (:7157-7227) --------------------
        for n in range(npx):
            if not llgo_on[n]:
                continue
            if kk == nk - 1:
                rho = pf[n, kk + 1] / (c.rgas * t[n, kk]
                                       * (1 + c.ep1 * q[n, kk]))
                khvfl = (ahfs[n, kk + 1] * c.rcpd
                         + c.ep1 * t[n, kk] * qhfl[n, kk + 1]) / rho
                ws = 0.001 - 1.5 * RKAP * khvfl \
                    * (geof[n, nk - 1] - geof[n, nk]) / t[n, nk - 1]
                if khvfl < 0.0:
                    ws = 1.2 * ws ** 0.3333
                    iilab[n, kk] = 1
                    texc = max(-1.5 * ahfs[n, kk + 1]
                               / (rho * ws * c.cpd), 0.0)
                    qexc = max(-1.5 * qhfl[n, kk + 1]
                               / (rho * ws), 0.0)
                    xqu[n, kk] = qf[n, kk] + qexc
                    suh[n, kk] = xsenh[n, kk] + c.cpd * texc
                    xtu[n, kk] = (xsenh[n, kk] - geof[n, kk]) \
                        * c.rcpd + texc
                    xlu[n, kk] = 0.0
                    wu2h[n, kk] = ws ** 2
                    tvenh = (1 + c.ep1 * qf[n, kk]) \
                        * (xsenh[n, kk] - geof[n, kk]) * c.rcpd
                    tvuh = (1 + c.ep1 * xqu[n, kk]) * xtu[n, kk]
                    buoh[n, kk] = (tvuh - tvenh) * c.egrav / tvenh
                else:
                    llgo_on[n] = False
            else:
                iilab[n, kk] = 1
                texc, qexc = 0.2, 1.0e-4
                xqu[n, kk] = qf[n, kk] + qexc
                suh[n, kk] = xsenh[n, kk] + c.cpd * texc
                xtu[n, kk] = (xsenh[n, kk] - geof[n, kk]) * c.rcpd \
                    + texc
                xlu[n, kk] = 0.0
                # mixed layer for parcels in the lowest 60 hPa
                # (:7200-7218; gate on the interface pressure)
                if pf[n, nk] - pf[n, kk - 1] < 60.0e2:
                    xqu[n, kk] = 0.0
                    suh[n, kk] = 0.0
                    w1 = 0.0
                    for k2 in (kk + 1, kk, kk - 1):
                        if w1 < 50.0e2:
                            w2 = pf[n, k2] - pf[n, k2 - 1]
                            w1 += w2
                            xqu[n, kk] += qf[n, k2] * w2
                            suh[n, kk] += xsenh[n, k2] * w2
                    xqu[n, kk] = xqu[n, kk] / w1 + qexc
                    suh[n, kk] = suh[n, kk] / w1 + c.cpd * texc
                    xtu[n, kk] = (suh[n, kk] - geof[n, kk]) \
                        * c.rcpd + texc
                wu2h[n, kk] = 1.0
                tvenh = (1 + c.ep1 * qf[n, kk]) \
                    * (xsenh[n, kk] - geof[n, kk]) * c.rcpd
                tvuh = (1 + c.ep1 * xqu[n, kk]) * xtu[n, kk]
                buoh[n, kk] = (tvuh - tvenh) * c.egrav / tvenh
        # ---- ascent until w² < 0 (:7236-7372) ---------------------
        for k in range(kk - 1, kt2 - 1, -1):
            zmix = np.zeros(npx)
            qold = np.zeros(npx)
            for n in range(npx):
                if not llgo_on[n]:
                    continue
                dz = (geof[n, k] - geof[n, k + 1]) * c.regrav
                xqf = 0.5 * (qf[n, k + 1] + qf[n, k])
                sf = 0.5 * (xsenh[n, k + 1] + xsenh[n, k])
                if kk == nk - 1:
                    eps = c2 / ((geof[n, k] - geof[n, nk])
                                * c.regrav) + epsadd
                    zmix[n] = 0.5 * dz * eps
                    xtmp = 1.0 / (1.0 + zmix[n])
                    xqu[n, k] = (xqu[n, k + 1] * (1 - zmix[n])
                                 + 2 * zmix[n] * xqf) * xtmp
                    suh[n, k] = (suh[n, k + 1] * (1 - zmix[n])
                                 + 2 * zmix[n] * sf) * xtmp
                else:
                    zmix[n] = 0.4 * entrpen[n] * dz * min(
                        1.0, (qs[n, k] / qs[n, nk - 1]) ** 3)
                    xqu[n, k] = xqu[n, k + 1] * (1 - zmix[n]) \
                        + xqf * zmix[n]
                    suh[n, k] = suh[n, k + 1] * (1 - zmix[n]) \
                        + sf * zmix[n]
                qold[n] = xqu[n, k]
                xtu[n, k] = (suh[n, k] - geof[n, k]) * c.rcpd
                xtu[n, k], xqu[n, k] = _moistadj1(
                    pf[n, k], xtu[n, k], xqu[n, k])
                dq = max(qold[n] - xqu[n, k], 0.0)
                xlu[n, k] = xlu[n, k + 1] + dq
                xlglac = dq * ((1 - _alpha(xtu[n, k]))
                               - (1 - _alpha(xtu[n, k + 1])))
                if kk == nk - 1:
                    xlu[n, k] = min(xlu[n, k], 5.0e-3)
                else:
                    xlu[n, k] = 0.5 * xlu[n, k]
                suh[n, k] = c.cpd * (xtu[n, k]
                                     + c.wlhfocp * xlglac) \
                    + geof[n, k]
                tvuh = (1 + c.ep1 * xqu[n, k] - xlu[n, k]) \
                    * xtu[n, k] + c.wlhfocp * xlglac
                tvenh = (1 + c.ep1 * qf[n, k]) \
                    * (xsenh[n, k] - geof[n, k]) * c.rcpd
                buoh[n, k] = (tvuh - tvenh) * c.egrav / tvenh
                buof = 0.5 * (buoh[n, k] + buoh[n, k + 1])
                xtmp = 1.0 / (1.0 + 2.0 * zmix[n])
                wu2h[n, k] = (wu2h[n, k + 1] * (1 - 2 * zmix[n])
                              + 2 * buof * dz) * xtmp
                # exact LCL cloud base (:7324-7360)
                if xlu[n, k] > 0.0 and iilab[n, k + 1] == 1:
                    ik = k + 1
                    qsu = min(QSMAX, _fesat(xtu[n, ik]) / pf[n, ik])
                    cor = 1.0 / (1.0 - c.ep1 * qsu)
                    qsu = qsu * cor
                    dq2 = min(0.0, xqu[n, ik] - qsu)
                    alfaw = _alpha(xtu[n, ik])
                    facw = c.c5les / (xtu[n, ik] - c.c4les) ** 2
                    faci = c.c5ies / (xtu[n, ik] - c.c4ies) ** 2
                    fac = alfaw * facw + (1 - alfaw) * faci
                    esdp = _fesat(xtu[n, ik]) / pf[n, ik]
                    cor = 1.0 / (1.0 - c.ep1 * esdp)
                    dqsdt = fac * cor * qsu
                    dtdp = c.rgas * xtu[n, ik] / (c.cpd * pf[n, ik])
                    cbase = pf[n, ik] + dq2 / (dqsdt * dtdp)
                    pdifftop = cbase - pf[n, k]
                    pdiffbot = pf[n, k + 1] - cbase
                    if pdifftop > pdiffbot and wu2h[n, k + 1] > 0.0:
                        kb = min(nk - 2, k + 1)
                        iilab[n, kb] = 2
                        iilab[n, k] = 2
                        ll_ldbase[n] = True
                        icbot[n] = kb
                        xlu[n, k + 1] = c.minqq
                    elif pdifftop <= pdiffbot and wu2h[n, k] > 0.0:
                        iilab[n, k] = 2
                        ll_ldbase[n] = True
                        icbot[n] = k
                # termination on negative kinetic energy
                if wu2h[n, k] < 0.0:
                    llgo_on[n] = False
                    if xlu[n, k + 1] > 0.0:
                        ictop[n] = k
                        lldcum[n] = True
                    else:
                        lldcum[n] = False
                elif xlu[n, k] > 0.0:
                    iilab[n, k] = 2
                else:
                    iilab[n, k] = 1
        # ---- round bookkeeping (:7383-7487) -----------------------
        if kk == nk - 1:
            for n in range(npx):
                llgo_on[n] = False
                kt, kb = ictop[n], icbot[n]
                deep = pf[n, kb] - pf[n, kt] > RDEPTHS
                if deep:
                    lldcum[n] = False   # no deep from surface level
                llgo_on[n] = True
                if lldcum[n]:
                    kcbot[n] = icbot[n]
                    ictop0[n] = ictop[n]
                    idpl[n] = iidpl[n]
                    ldcum[n] = True
                    wubase[n] = np.sqrt(max(wu2h[n, kb], 0.0))
                else:
                    ictop0[n] = -1
                    kcbot[n] = -1
                    idpl[n] = nk - 2
                    ldcum[n] = False
                    wubase[n] = 0.0
            for k in range(nk - 1, -1, -1):
                for n in range(npx):
                    if k >= ictop[n]:
                        ilab[n, k] = iilab[n, k]
                        tu[n, k] = xtu[n, k]
                        qu[n, k] = xqu[n, k]
                        lu[n, k] = xlu[n, k]
        else:
            llresetn = np.zeros(npx, bool)
            for n in range(npx):
                if not lldeep[n]:
                    kt, kb = ictop[n], icbot[n]
                    lldeep[n] = pf[n, kb] - pf[n, kt] >= RDEPTHS
                llresetn[n] = lldeep[n] and llfirst[n]
            for k in range(nk - 1, -1, -1):
                for n in range(npx):
                    if llresetn[n]:
                        kt, kb = ictop[n], iidpl[n]
                        if kt <= k <= kb:
                            ilab[n, k] = iilab[n, k]
                            tu[n, k] = xtu[n, k]
                            qu[n, k] = xqu[n, k]
                            lu[n, k] = xlu[n, k]
                        else:
                            ilab[n, k] = 1
                            tu[n, k] = tf[n, k]
                            qu[n, k] = qf[n, k]
                            lu[n, k] = 0.0
                        if k < kt:
                            ilab[n, k] = 0
            for n in range(npx):
                if lldeep[n] and llfirst[n]:
                    idpl[n] = iidpl[n]
                    ictop0[n] = ictop[n]
                    kcbot[n] = icbot[n]
                    ldcum[n] = lldcum[n]
                    kb = kcbot[n]
                    wubase[n] = np.sqrt(max(wu2h[n, kb], 0.0))
                    llfirst[n] = False
                llgo_on[n] = not lldeep[n]
    return ldcum, kcbot, ictop0, idpl, wubase, tu, qu, lu, ilab


# ------------------------- test fixtures ---------------------------

def _prepared_inputs():
    """6 columns, nk=18, exercising every branch of the search:
    columns 0/3/5 conditionally unstable + moist (deep accept from an
    ELEVATED departure level; column 3 has khvfl >= 0, i.e. no surface
    trigger at all), columns 1/4 capped by a low inversion (SHALLOW
    surface-round accept, depth < 200 hPa), column 2 stable and dry
    (non-convective). tf/qf are the initcum static-energy-max
    half-level fields the port prepares before cloudbase_search."""
    rng = np.random.default_rng(7)
    npx, nk = 6, 18
    x = np.linspace(0.0, 1.0, nk + 1)
    sig = 1.0 - (1.0 - x) ** 1.45        # fine near-surface spacing
    pfr = (0.012 + sig * 0.988) * c.stdp
    pfr[-1] = c.stdp
    pf = np.tile(pfr, (npx, 1))
    ph = 0.5 * (pf[:, 1:] + pf[:, :-1])
    ts = np.array([303.0, 299.0, 288.0, 301.0, 296.0, 302.0])
    gam_lo = np.array([0.0080, 0.0078, 0.0050, 0.0082, 0.0078,
                       0.0079])
    gam_hi = np.array([0.0035, 0.0005, 0.0035, 0.0035, 0.0003,
                       0.0035])
    ztr = np.array([5000.0, 1500.0, 5000.0, 5000.0, 1400.0, 5000.0])
    rh0 = np.array([0.95, 0.90, 0.30, 0.92, 0.90, 0.93])
    rhdec = np.array([4500.0, 1500.0, 1500.0, 4000.0, 1300.0,
                      4200.0])
    t = np.zeros((npx, nk))
    geo = np.zeros((npx, nk))
    geof = np.zeros((npx, nk + 1))
    for n in range(npx):
        zf = np.zeros(nk + 1)
        tv = ts[n]
        for k in range(nk, 0, -1):
            dz = c.rgas * tv / c.egrav * np.log(pf[n, k]
                                                / pf[n, k - 1])
            zf[k - 1] = zf[k] + dz
            zm = zf[k - 1]
            tv = max(ts[n] - (gam_lo[n] * min(zm, ztr[n])
                              + gam_hi[n] * max(zm - ztr[n], 0.0)),
                     200.0)
        z = 0.5 * (zf[1:] + zf[:-1])
        t[n] = np.maximum(
            ts[n] - (gam_lo[n] * np.minimum(z, ztr[n])
                     + gam_hi[n] * np.maximum(z - ztr[n], 0.0)),
            200.0)
        geo[n] = c.egrav * z
        geof[n] = c.egrav * zf
    es = _fesat(t) / ph
    qs = es / (1.0 - c.ep1 * es)
    zmid = geo / c.egrav
    rhprof = rh0[:, None] * np.exp(
        -np.maximum(zmid - 1500.0, 0.0) / rhdec[:, None])
    q = np.clip(rhprof * qs, 1e-6, None)
    t += rng.normal(0.0, 0.05, t.shape)
    ahfs = np.zeros((npx, nk + 1))
    qhfl = np.zeros((npx, nk + 1))
    ahfs[:, nk] = -120.0                 # upward heat flux (trigger)
    qhfl[:, nk] = -6e-5
    ahfs[2, nk] = 40.0                   # khvfl >= 0: no trigger
    qhfl[2, nk] = 1e-6
    ahfs[3, nk] = 35.0                   # elevated-only column
    qhfl[3, nk] = 0.0
    # initcum half-level fields exactly as ntiedtke prepares them
    tf = np.zeros_like(t)
    qf = np.zeros_like(q)
    tf[:, 0] = t[:, 0]
    qf[:, 0] = q[:, 0]
    for k in range(1, nk):
        s = np.maximum(c.cpd * t[:, k - 1] + geo[:, k - 1],
                       c.cpd * t[:, k] + geo[:, k])
        tf[:, k] = (s - geof[:, k]) * c.rcpd
        qf[:, k] = q[:, k - 1]
    tf[:, nk - 1] = (c.cpd * t[:, nk - 1] + geo[:, nk - 1]
                     - geof[:, nk - 1]) * c.rcpd
    qf[:, nk - 1] = q[:, nk - 1]
    for k in range(nk - 2, 0, -1):
        s = np.maximum(c.cpd * tf[:, k] + geof[:, k],
                       c.cpd * tf[:, k + 1] + geof[:, k + 1])
        tf[:, k] = (s - geof[:, k]) * c.rcpd
    # pnorm convention: the port gates the elevated mixed layer on
    # stdp - pnorm[kk-1] where the reference uses the INTERFACE
    # pressure pf[n, kk-1] (ntiedtke feeds the full-level hsigma
    # profile there — a documented deviation). Feeding the upper
    # interfaces as pnorm makes the port's gate formula IDENTICAL to
    # the reference's, so the oracle pins the search logic itself.
    pnorm = pf[0, :nk]
    return t, q, tf, qf, qs, pf, geof, ahfs, qhfl, pnorm


def test_cloudbase_search_vs_fortran_oracle():
    (t, q, tf, qf, qs, pf, geof, ahfs, qhfl,
     pnorm) = _prepared_inputs()
    npx, nk = t.shape
    entrpen = np.full(npx, ENTRPEN_LND)
    kt1 = int(np.argmax(pf[0, 1:] > 350.0e2))
    kt2 = int(np.argmax(pf[0, 1:] > 60.0e2))

    exp = cloudbase_oracle(t, q, tf, qf, qs, pf, geof, ahfs, qhfl,
                           entrpen, kt1, kt2)
    (ldcum_e, kcbot_e, ictop0_e, idpl_e, wubase_e, tu_e, qu_e, lu_e,
     ilab_e) = exp

    got = cloudbase_search(
        jnp.asarray(t), jnp.asarray(q), jnp.asarray(tf),
        jnp.asarray(qf), jnp.asarray(qs), jnp.asarray(pf),
        jnp.asarray(geof), jnp.asarray(ahfs), jnp.asarray(qhfl),
        jnp.asarray(entrpen), kt1, kt2, pnorm)
    (ldcum, kcbot, ictop0, idpl, wubase, tu, qu, lu, ilab) = [
        np.asarray(x) for x in got]

    # the fixture must actually exercise the scheme's branches
    assert ldcum_e.any(), "no convecting column in fixture"
    assert (~ldcum_e).any(), "no non-convecting column in fixture"
    assert (idpl_e[ldcum_e] < nk - 1).any(), \
        "no elevated departure accepted"
    assert (idpl_e[ldcum_e] == nk - 1).any(), \
        "no shallow surface-round accept"

    np.testing.assert_array_equal(ldcum, ldcum_e)
    # the port maps the reference's -1 sentinels to nk-2 after the
    # search (consumed by the closure); compare where defined
    np.testing.assert_array_equal(kcbot[ldcum_e], kcbot_e[ldcum_e])
    np.testing.assert_array_equal(ictop0[ldcum_e],
                                  ictop0_e[ldcum_e])
    np.testing.assert_array_equal(kcbot[~ldcum_e],
                                  np.full((~ldcum_e).sum(), nk - 2))
    np.testing.assert_array_equal(idpl, idpl_e)
    np.testing.assert_array_equal(ilab, ilab_e)
    np.testing.assert_allclose(wubase, wubase_e, rtol=5e-6,
                               atol=1e-12)
    np.testing.assert_allclose(tu, tu_e, rtol=5e-6)
    np.testing.assert_allclose(qu, qu_e, rtol=5e-6, atol=1e-12)
    np.testing.assert_allclose(lu, lu_e, rtol=5e-6, atol=1e-12)


def test_cloudbase_oracle_deep_shallow_split():
    """Physical sanity of the ORACLE itself: moist unstable columns
    are deep FROM AN ELEVATED departure level, capped columns are
    shallow from the surface round, the dry column is off."""
    (t, q, tf, qf, qs, pf, geof, ahfs, qhfl,
     pnorm) = _prepared_inputs()
    npx, nk = t.shape
    entrpen = np.full(npx, ENTRPEN_LND)
    kt1 = int(np.argmax(pf[0, 1:] > 350.0e2))
    kt2 = int(np.argmax(pf[0, 1:] > 60.0e2))
    (ldcum, kcbot, ictop0, idpl, wubase, tu, qu, lu,
     ilab) = cloudbase_oracle(t, q, tf, qf, qs, pf, geof, ahfs,
                              qhfl, entrpen, kt1, kt2)
    assert not ldcum[2], "stable dry column must not convect"
    assert ldcum[[0, 1, 3, 4, 5]].all()
    ar = np.arange(npx)
    depth = np.where(ldcum, pf[ar, np.maximum(kcbot, 0)]
                     - pf[ar, np.maximum(ictop0, 0)], 0.0)
    deep = ldcum & (depth >= RDEPTHS)
    shal = ldcum & ~deep
    assert deep[[0, 3, 5]].all() and shal[[1, 4]].all()
    assert (idpl[deep] < nk - 1).all(), \
        "deep acceptance must come from an elevated departure level"
    assert (idpl[shal] == nk - 1).all(), \
        "shallow acceptance must come from the surface round"
    # column 3 never had a surface trigger (khvfl >= 0) yet convects
    assert ldcum[3] and idpl[3] < nk - 1
