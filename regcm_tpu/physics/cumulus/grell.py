"""Grell cumulus scheme (icup=2) with AS74/FC80 closures.

Faithful jax port of ``Main/cumlib/mod_cu_grell.F90`` (``cuparan`` :207,
``cup`` :460-1235): single-cloud updraft/downdraft ensemble with
moist-static-energy cloud work functions evaluated on three states
(current, large-scale-forced, and cloud-modified), wind-shear dependent
precipitation efficiency, and either the Arakawa-Schubert (igcc=1)
quasi-equilibrium or Fritsch-Chappell (igcc=2) ABE-removal closure.

TPU-native form: the per-column pointloop with retry/cycle control flow
becomes masked dense algebra over (ncol, kz) bottom-up arrays; level
searches are masked argmax/argmin reductions; the in-cloud water
cascades are lax.scans over k. Parameters follow grellparam defaults
(Main/mod_params.F90:379-400).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c
from ...utils.thermo import pfwsat

# grellparam defaults
SHRMIN, SHRMAX = 0.30, 0.90
EDTMIN, EDTMAX = 0.20, 0.80
PBCMAX = 50.0
MINCLD = 50.0
HTMIN, HTMAX = -250.0, 500.0
SKBMAX = 0.4
DTAUC = 60.0 * 60.0          # s (namelist is minutes)
ZDETR = 650.0
XACACT = -0.99999


class GrellOut(NamedTuple):
    outt: jax.Array      # (ncol, kz) bottom-up T tendency (K/s)
    outq: jax.Array      # qv (mixing ratio) tendency
    pratec: jax.Array    # precip rate (kg/m2/s)
    cldfrc: jax.Array
    kbcon: jax.Array
    ktop: jax.Array
    active: jax.Array


def _first_true(mask, ii, default):
    """Smallest index with mask True, else default (per column)."""
    idx = jnp.where(mask, ii, 10 ** 6)
    out = jnp.min(idx, axis=1)
    return jnp.where(out >= 10 ** 6, default, out)


def cup(t, q, tn, qo, p, psur, ter11, vsp, dtime, igcc=2,
        kbmax=None) -> GrellOut:
    """Grell cup. All (ncol, kz) BOTTOM-UP (index 0 = lowest level);
    t/q current state; tn/qo large-scale-forced state; p (hPa), psur
    (hPa), ter11 terrain (m), vsp wind speed; dtime leapfrog dt.
    kbmax: highest 0-based departure level (the reference derives it
    from hsigma > skbmax, mod_params.F90:2283-2285); defaults to a
    pressure-ratio approximation."""
    ncol, kz = t.shape
    ii = jnp.arange(kz)[None, :]
    take = lambda a, k: jnp.take_along_axis(a, k[:, None], axis=1)[:, 0]
    mid = lambda a: 0.5 * (a + jnp.concatenate([a[:, 1:], a[:, -1:]],
                                               axis=1))   # ½(f_k+f_{k+1})
    mbdt = dtime * 5.0e-3

    def env(tt, qq):
        qes = jnp.maximum(pfwsat(tt, p * 100.0), c.minqq)
        qq = jnp.minimum(qq, qes)
        tv = tt * (1.0 + c.ep1 * qq)
        # heights: z1 from surface, then log-p hydrostatic upward
        z = jnp.zeros_like(tt)
        z0 = ter11 - (jnp.log(p[:, 0]) - jnp.log(psur)) * c.rgas \
            * tv[:, 0] * c.regrav
        def zstep(zprev, k):
            tvbar = 0.5 * (tv[:, k] + tv[:, k - 1])
            zk = zprev - (jnp.log(p[:, k]) - jnp.log(p[:, k - 1])) \
                * c.rgas * tvbar * c.regrav
            return zk, zk
        _, zs = jax.lax.scan(zstep, z0, jnp.arange(1, kz))
        z = jnp.concatenate([z0[:, None], zs.T], axis=1)
        he = c.egrav * z + c.cpd * tt + c.wlhv * qq
        hes = c.egrav * z + c.cpd * tt + c.wlhv * qes
        he = jnp.minimum(he, hes)
        return qes, qq, tv, z, he, hes

    qes, q, tv, z, he, hes = env(t, q)
    qeso, qo, tvo, zo, heo, heso = env(tn, qo)

    # kdet: highest 0-based level with z > zdetr + terrain (:513);
    # the reference's 1-based kdet equals this + 1
    kdet = jnp.max(jnp.where(z > ZDETR + ter11[:, None], ii, 0), axis=1)
    # dkk (:565-568): Fortran k=1..kdet: kk=kdet−k+1,
    # dkk(k)=1−kk/kdet → 0-based kp≤kdet: dkk[kp]=kp/(kdet+1),
    # 1.0 above
    dkk = jnp.where(ii <= kdet[:, None],
                    ii / (kdet[:, None] + 1.0), 1.0)

    if kbmax is None:
        # approximate sigma > skbmax via pressure: p > skbmax·psur
        kbmax = jnp.max(jnp.where(p > SKBMAX * psur[:, None], ii, 0),
                        axis=1)
        kbmax = jnp.maximum(kbmax, 2)
    else:
        kbmax = jnp.broadcast_to(jnp.asarray(kbmax, jnp.int32),
                                 (ncol,))

    # k22: level of max he below kbmax (maximi2 from 1..kbmax → 0-based)
    hem = jnp.where(ii <= kbmax[:, None], he, -1e18)
    k22 = jnp.argmax(hem, axis=1)
    act = k22 < kbmax

    hkb = take(mid(he), k22)
    qkb = take(mid(q), k22)
    hkbo = take(mid(heo), k22)
    qkbo = take(mid(qo), k22)
    hes_mid = mid(hes)
    heso_mid = mid(heso)

    kbcon = k22
    # cloud base search with lid removal and pbcdif retry (:560-612):
    # bounded retries, masked
    for _ in range(6):
        cand = (ii >= kbcon[:, None]) & (hkb[:, None] >= hes_mid)
        kbcon_new = _first_true(cand, ii, kbmax + 1)
        kbcon = kbcon_new
        cand_o = (ii >= kbcon[:, None]) & (hkbo[:, None] >= heso_mid)
        kbcono = _first_true(cand_o, ii, kbmax + 1)
        kbcon = kbcono
        bad = kbcon > kbmax
        act = act & (~bad)
        pbcdif = take(p, jnp.minimum(k22, kz - 1)) \
            - take(p, jnp.minimum(kbcon, kz - 1))
        retry = act & (pbcdif > PBCMAX)
        k22 = jnp.where(retry, k22 + 1, k22)
        act = act & (k22 < kbmax)
        hkb = jnp.where(retry, take(mid(he), jnp.minimum(k22, kz - 1)),
                        hkb)
        qkb = jnp.where(retry, take(mid(q), jnp.minimum(k22, kz - 1)),
                        qkb)
        hkbo = jnp.where(retry, take(mid(heo), jnp.minimum(k22, kz - 1)),
                         hkbo)
        qkbo = jnp.where(retry, take(mid(qo), jnp.minimum(k22, kz - 1)),
                         qkbo)
        # the reference restarts the base search from kb = k22 after a
        # pbcdif retry (:565-566 `kb(n) = k22(n); kbcon(n) = kb(n)`) —
        # the new hkb can qualify BELOW the failed kbcon
        kbcon = jnp.where(retry, k22, kbcon)

    kbcon = jnp.minimum(kbcon, kz - 2)
    # buoyancy and cloud top (:620-650)
    dby = hkb[:, None] - hes_mid
    dbyo = hkbo[:, None] - heso_mid
    dby = dby.at[:, kz - 1].set(hkb - hes[:, kz - 1])
    dbyo = dbyo.at[:, kz - 1].set(hkbo - heso[:, kz - 1])
    topc = (ii >= kbcon[:, None]) & (dby <= 0.0)
    ktop = _first_true(topc, ii, kz - 1)
    act = act & (take(p, kbcon) - take(p, ktop) >= MINCLD) \
        & jnp.any(topc, axis=1)
    ktop = jnp.clip(ktop, 2, kz - 1)

    # kmin: level of min he in [kb, ktop] (minimi2)
    hemin = jnp.where((ii >= k22[:, None]) & (ii <= ktop[:, None]),
                      he, 1e18)
    kmin = jnp.argmin(hemin, axis=1)
    # reference rejects kmin <= 3 (1-based, :668) -> 0-based <= 2
    act = act & (kmin > 2)
    kmin = jnp.clip(kmin, 3, kz - 2)

    # updraft water cascade + cloud work function (:672-716) — scan k
    def updraft(qck0, state, dbyX, qesX, tX, zX):
        """Returns (pwc, pwcav, xac_cwf) via scan over k."""
        agam = c.wlhvocp * (c.wlhv / (c.rwat * tX ** 2)) * qesX
        def body(carry, k):
            qck, pwcav, cwf = carry
            inlayer = (k > kbcon) & (k < ktop) & act
            qrch = qesX[:, k] + c.rwlhv * (agam[:, k]
                                           / (1.0 + agam[:, k])) * dbyX[:, k]
            pwc_k = jnp.where(inlayer, qck - qrch, 0.0)
            qck = jnp.where(inlayer, qrch, qck)
            pwcav = pwcav + pwc_k
            dz1 = zX[:, k] - zX[:, jnp.maximum(k - 1, 0)]
            tbar = 0.5 * (tX[:, k] + tX[:, jnp.maximum(k - 1, 0)])
            gbar = 0.5 * (agam[:, k] + agam[:, jnp.maximum(k - 1, 0)])
            cwf = cwf + jnp.where(
                inlayer,
                dz1 * (c.egrav / (c.cpd * tbar)) * dbyX[:, k - 1]
                / (1.0 + gbar), 0.0)
            return (qck, pwcav, cwf), pwc_k
        z0c = jnp.zeros((ncol,), t.dtype)
        (qck, pwcav, cwf), pwcs = jax.lax.scan(
            body, (qck0, z0c, z0c), jnp.arange(1, kz - 1))
        pwc = jnp.concatenate(
            [jnp.zeros((ncol, 1), t.dtype), pwcs.T,
             jnp.zeros((ncol, 1), t.dtype)], axis=1)
        # cloud-top fallout (:718-733)
        pwc_top = qck - take(qesX, ktop)
        pwc = pwc.at[jnp.arange(ncol), ktop].set(pwc_top)
        pwcav = pwcav + pwc_top
        return pwc, pwcav, cwf, qck

    pwc, pwcav, xac, _ = updraft(qkb, None, dby, qes, t, z)
    pwco, pwcavo, xao, _ = updraft(qkbo, None, dbyo, qeso, tn, zo)

    # shear-dependent precipitation efficiency (:738-760)
    shr_lay = (ii >= kbcon[:, None]) & (ii <= jnp.minimum(
        ktop, kz - 2)[:, None])
    p_kp1 = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    v_kp1 = jnp.concatenate([vsp[:, 1:], vsp[:, -1:]], axis=1)
    z_kp1 = jnp.concatenate([z[:, 1:], z[:, -1:]], axis=1)
    vshear = jnp.sum(jnp.where(
        shr_lay, (v_kp1 - vsp / jnp.maximum(z_kp1 - z, 1.0))
        * (p - p_kp1), 0.0), axis=1)
    sdp = jnp.maximum(jnp.sum(jnp.where(shr_lay, p - p_kp1, 0.0),
                              axis=1), 1.0)
    vshear = vshear * 1000.0 / sdp
    edt = 1.0 - (1.591 - 0.639 * vshear + 0.0953 * vshear ** 2
                 - 0.00496 * vshear ** 3)
    edt = jnp.clip(edt, SHRMIN, SHRMAX)
    edto = edt

    # downdraft properties (:756-795) — scan downward from kmin
    def downdraft(hcd0, qcd0, heX, hesX, qesX, tX, zX):
        agam_m = c.wlhvocp * (c.wlhv / (c.rwat * mid(tX) ** 2)) * mid(qesX)
        hes_m = mid(hesX)
        qes_m = mid(qesX)
        def body(carry, kk):
            qcd, bu, pwcev = carry
            # kk runs kz-2 .. 0; active where kk < kmin
            ind = kk < kmin
            dz = -0.5 * (zX[:, kk] - zX[:, jnp.minimum(kk + 2, kz - 1)])
            dh = hcd0 - hes_m[:, kk]
            bu = bu + jnp.where(ind & act, dz * dh, 0.0)
            qrcd = qes_m[:, kk] + c.rwlhv * (agam_m[:, kk]
                                             / (1.0 + agam_m[:, kk])) * dh
            pwcd_k = jnp.where(ind & act,
                               dkk[:, kk] * (qcd - qrcd), 0.0)
            qcd = jnp.where(ind & act, qrcd, qcd)
            pwcev = pwcev + pwcd_k
            # the qrcd PROFILE: mid(qes) init (:532) overwritten below
            # kmin with the draught value (:780) — dellaq reads it
            qrcd_k = jnp.where(ind & act, qrcd, qes_m[:, kk])
            return (qcd, bu, pwcev), (pwcd_k, qrcd_k)
        z0c = jnp.zeros((ncol,), t.dtype)
        (qcd, bu, pwcev), (pwcds, qrcds) = jax.lax.scan(
            body, (qcd0, z0c, z0c), jnp.arange(kz - 2, -1, -1))
        pwcd = jnp.concatenate(
            [jnp.flip(pwcds.T, axis=1), jnp.zeros((ncol, 1), t.dtype)],
            axis=1)
        qrcd_prof = jnp.concatenate(
            [jnp.flip(qrcds.T, axis=1), qesX[:, -1:]], axis=1)
        return qcd, bu, pwcev, pwcd, qrcd_prof

    hcd = take(mid(he), kmin)
    qcd0 = take(mid(q), kmin)
    hcdo = take(mid(heo), kmin)
    qcdo0 = take(mid(qo), kmin)
    _, bu, pwcev, pwcd, qrcd_prof = downdraft(hcd, qcd0, he, hes,
                                              qes, t, z)
    _, buo, pwcevo, pwcdo, _ = downdraft(hcdo, qcdo0, heo, heso,
                                         qeso, tn, zo)

    act = act & (bu < 0.0) & (buo < 0.0) & (pwcev < 0.0) & (pwcevo < 0.0)
    edt_shear = edt       # edtx rescales from the RAW shear edt (:752)
    edt = jnp.clip(-edt * pwcav / jnp.where(pwcev == 0, -1.0, pwcev),
                   EDTMIN, EDTMAX)
    edto = jnp.clip(-edto * pwcavo / jnp.where(pwcevo == 0, -1.0, pwcevo),
                    EDTMIN, EDTMAX)

    # tendencies per unit mass flux: dellah/dellaq (:815-905)
    he_m = mid(he)
    q_m = mid(q)
    he_mm1 = jnp.concatenate([he[:, :1], he_m[:, :-1]], axis=1)  # ½(k,k-1)
    q_mm1 = jnp.concatenate([q[:, :1], q_m[:, :-1]], axis=1)
    dkk_p1 = jnp.concatenate([dkk[:, 1:], dkk[:, -1:]], axis=1)
    aup = jnp.where(ii > k22[:, None], 1.0, 0.0)
    adw = jnp.where(ii <= kmin[:, None], 1.0, 0.0)
    p_km1 = jnp.concatenate([p[:, :1], p[:, :-1]], axis=1)
    dpinv = 1.0 / (50.0 * jnp.maximum(p_km1 - p_kp1, 0.1))
    # NOTE: the reference's detdo (:849) indexes dkk with the STALE
    # loop variable kk (= kz after the shear loop), an out-of-bounds
    # read; we follow detdoq's intended dkk(k+1) pattern instead
    detdo = (dkk_p1 - dkk) * (hcd[:, None] - he)
    detdoq = (dkk_p1 - dkk) * (qrcd_prof - q)
    dellah = ((aup - adw * dkk_p1 * edt[:, None]) * (he_m - he)
              + (aup - adw * dkk * edt[:, None]) * (he - he_mm1)) \
        * c.egrav * dpinv + adw * edt[:, None] * detdo * c.egrav * dpinv
    dellaq = ((aup - adw * dkk_p1 * edt[:, None]) * (q_m - q)
              + (aup - adw * dkk * edt[:, None]) * (q - q_mm1)) \
        * c.egrav * dpinv + adw * edt[:, None] * detdoq * c.egrav * dpinv
    # lowest level (:817-830)
    dp_s0 = 50.0 * (psur - p[:, 1])
    dellah0 = edt * (dkk[:, 1] * hcd - dkk[:, 1] * he_m[:, 0]) \
        * c.egrav / dp_s0
    dellaq0 = edt * (dkk[:, 1] * qrcd_prof[:, 1] - dkk[:, 0] * q_m[:, 0]) \
        * c.egrav / dp_s0
    dellah = dellah.at[:, 0].set(dellah0)
    dellaq = dellaq.at[:, 0].set(dellaq0)
    # cloud top (:907-920)
    dp_top = 100.0 * jnp.maximum(take(p_km1, ktop) - take(p, ktop), 0.1)
    dellah_t = (hkb - take(he_mm1, ktop)) * c.egrav / dp_top
    dellaq_t = (take(qes, ktop) - take(q_mm1, ktop)) * c.egrav / dp_top
    dellah = dellah.at[jnp.arange(ncol), ktop].set(dellah_t)
    dellaq = dellaq.at[jnp.arange(ncol), ktop].set(dellaq_t)
    incl = ii <= ktop[:, None]
    dellah = jnp.where(incl, dellah, 0.0)
    dellaq = jnp.where(incl, dellaq, 0.0)
    dellat = c.rcpd * (dellah - c.wlhv * dellaq)

    # cloud-modified state (x arrays, :855-948): xhe accumulates the
    # tendency on the CAPPED he (not recomposed from xt/xq), xq floors
    # to minqq only when <= 0, xqes has no minqq floor
    xt = t + mbdt * dellat
    xq_raw = q + mbdt * dellaq
    xq = jnp.where(xq_raw <= 0.0, c.minqq, xq_raw)
    xqes = pfwsat(xt, p * 100.0)
    xq = jnp.minimum(xq, xqes)
    xtv = xt * (1.0 + c.ep1 * xq)
    xz0 = ter11 - (jnp.log(p[:, 0]) - jnp.log(psur)) * c.rgas \
        * xtv[:, 0] * c.regrav
    def xzstep(zprev, k):
        tvbar = 0.5 * (xtv[:, k] + xtv[:, k - 1])
        zk = zprev - (jnp.log(p[:, k]) - jnp.log(p[:, k - 1])) \
            * c.rgas * tvbar * c.regrav
        return zk, zk
    _, xzs = jax.lax.scan(xzstep, xz0, jnp.arange(1, kz))
    xz = jnp.concatenate([xz0[:, None], xzs.T], axis=1)
    xhes = c.egrav * xz + c.cpd * xt + c.wlhv * xqes
    xhe = jnp.minimum(he + mbdt * dellah, xhes)
    xhkb = hkb + mbdt * take(dellah, kbcon)
    xqkb_raw = qkb + mbdt * take(dellaq, kbcon)
    xqkb = jnp.where(xqkb_raw <= 0.0, c.minqq, xqkb_raw)
    xhes_mid = mid(xhes)
    xdby = xhkb[:, None] - xhes_mid
    _, xpwcav_, xxac, _ = updraft(xqkb, None, xdby, xqes, xt, xz)
    xhcd = take(mid(xhe), kmin)
    xqcd0 = take(mid(xq), kmin)
    _, xbu, xpwcev, _, _ = downdraft(xhcd, xqcd0, xhe, xhes, xqes,
                                     xt, xz)
    act = act & (xbu < 0.0)
    # edtx rescales the raw shear edt, guarded on |xpwcev| (:1030-1036)
    edtx = jnp.where(jnp.abs(xpwcev) > 1.0e-20,
                     -edt_shear * xpwcav_ / xpwcev, edt_shear)
    edtx = jnp.clip(edtx, EDTMIN, EDTMAX)

    # downdraft cloud work contributions (:1030-1080)
    def dd_cwf2(edtX, hcdX, tX, qesX, hesX, zX):
        agam = c.wlhvocp * (c.wlhv / (c.rwat * tX ** 2)) * qesX
        agam_m = mid(agam)
        hes_m = mid(hesX)
        t_m = mid(tX)
        z_kp1c = jnp.concatenate([zX[:, 1:], zX[:, -1:]], axis=1)
        dzv = (zX - z_kp1c) * dkk
        mask = ii < kmin[:, None]
        contrib = jnp.where(mask,
                            edtX[:, None] * dzv
                            * (c.egrav / (c.cpd * t_m))
                            * ((hcdX[:, None] - hes_m)
                               / (1.0 + agam_m)), 0.0)
        return jnp.sum(contrib, axis=1)

    xac = xac + dd_cwf2(edt, hcd, t, qes, hes, z)
    xao = xao + dd_cwf2(edto, hcdo, tn, qeso, heso, zo)
    xxac = xxac + dd_cwf2(edtx, xhcd, xt, xqes, xhes, xz)

    # closure (:1086-1102); only columns whose total cloud work
    # function is non-negative close (`if xac >= 0`, :1087)
    act_c = act & (xac >= 0.0)
    if igcc == 1:
        fcl = (xao - xac) / dtime
    else:
        fcl = xac / DTAUC
    xk = (xxac - xac) / mbdt
    xmb = jnp.where((fcl <= 0.0) | (xk >= 0.0), 0.0, -fcl / xk)
    xmb = jnp.where(act_c, xmb, 0.0)

    # heating bound feedback (:1108-1118)
    outtes = dellat * xmb[:, None] * c.secpd
    fac_hi = jnp.where((outtes > HTMAX) & incl,
                       1.001 * HTMAX / jnp.maximum(outtes, 1e-10), 1.0)
    fac_lo = jnp.where((outtes < HTMIN) & incl,
                       1.001 * HTMIN / jnp.minimum(outtes, -1e-10), 1.0)
    scale = jnp.min(jnp.minimum(fac_hi, fac_lo), axis=1)
    xmb = xmb * jnp.clip(scale, 0.0, 1.0)

    outt = jnp.where(incl, dellat * xmb[:, None], 0.0)
    outq = jnp.where(incl, dellaq * xmb[:, None], 0.0)
    pratec = jnp.maximum(jnp.sum(jnp.where(
        incl, (pwc + edt[:, None] * pwcd) * xmb[:, None], 0.0),
        axis=1), 0.0)

    # cloud fraction (:1125-1140)
    mflx = jnp.maximum(100.0 * (p / (c.rgas * t)) * dellah
                       * xmb[:, None], 0.0)
    deep = (take(z, ktop) - take(z, kbcon)) > 2000.0
    from .emanuel import K2_CONST, KFAC_DEEP, KFAC_SHAL
    cf_deep = jnp.clip(KFAC_DEEP * jnp.log1p(K2_CONST * mflx), 0.01, 0.6)
    cf_shal = jnp.clip(KFAC_SHAL * jnp.log1p(K2_CONST * mflx), 0.01, 0.2)
    incb = (ii >= kbcon[:, None]) & incl
    # the reference emits the 0.01 cloud-fraction floor in the cloud
    # layer even when xmb = 0 (mflx=0 -> log1p(0) -> clipped to 0.01,
    # :1125-1140) — gate on act_c, not on xmb > 0
    cldfrc = jnp.where(incb & act_c[:, None],
                       jnp.where(deep[:, None], cf_deep, cf_shal), 0.0)

    actf = act_c & (xmb > 0.0)
    am = actf[:, None]
    return GrellOut(outt=jnp.where(am, outt, 0.0),
                    outq=jnp.where(am, outq, 0.0),
                    pratec=jnp.where(actf, pratec, 0.0),
                    cldfrc=jnp.where(act_c[:, None], cldfrc, 0.0),
                    kbcon=kbcon, ktop=ktop, active=actf)
