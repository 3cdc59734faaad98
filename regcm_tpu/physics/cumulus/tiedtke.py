"""Tiedtke mass-flux cumulus convection (icup=5, iconv=4 "new
Tiedtke" — the reference default scheme variant).

TPU re-derivation of ``Main/cumlib/mod_cu_tiedtke.F90`` (``ntiedtke``
:4508-5520 with its internal subroutines initcum :5524, cloudbase
:7056, ascent :5818, entrainm :6221, mcbase :6255, lfs :6291,
ddrafdsc :6389, dtdqc :6521, dudvx :6694, cfluxes :6840, moistadj
:5657, solver :5611): the per-point gathered column loops become dense
(np, nk) whole-grid algebra; level recursions stay as Python loops
over the small static ``nk`` (each iteration is one fused dense
update); every conditional is `jnp.where` masking.

Feature flags (&tiedtkeparam, defaults mod_params.F90:450-457):
* lmfmid (default on): midlevel convection (mcbase, ktype=3) starts a
  fresh updraft inside the ascent scan where no convection exists;
  requires ``omega`` — without it midlevel is disabled;
* lmfsmooth (default off): smooths the tracer-transport mass fluxes
  at draught edges (:5387-5417) before ``ctracer``;
* the ctracer convective tracer transport IS ported (``ctracer``
  below, mod_cu_tiedtke.F90:7549; exercised by tests/test_chem.py) and
  excludes ktype=3 columns like the reference (:5347).

Scope notes (documented deviations):
* llconscheck diagnostics omitted;
* lmfwstar=.false. (reference default);
* the reference picks its 350/60/950 hPa marker levels (and the
  cmcptop midlevel ceiling) from the instantaneous domain-mean
  column; under jit those must be static, so they come from the
  standard-atmosphere sigma profile instead.
All tunables take the reference's mod_params defaults (:427-458).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import constants as c

# mod_constants.F90:218-222
RTBER = c.tzero - 5.0
RTICE = c.tzero - 23.0
RTWAT = c.tzero
RTWAT_RTICE_R = 1.0 / (RTWAT - RTICE)
# mod_cu_tiedtke.F90:51-107 fixed parameters
RKAP = 0.4
QSMAX = 0.5
CWDRAG = (3.0 / 8.0) * 0.506 / 0.200
RMFSOLUV = 1.0
RMFSOLTQ = 1.0
RMFLIC = 1.0
RMFLIA = 0.0
RTAUMEL = 5.0 * 3600.0 * 1.5
RDEPTHS = 2.0e4
RMFDEPS = 0.3
CMFCMAX = 1.0
CMFCMIN = 1.0e-10
# mod_params.F90:427-458 defaults
ENTRPEN_LND = 1.75e-3
ENTRPEN_OCN = 1.75e-3
DETRPEN = 0.75e-4
ENTSHALP = 2.0
ENTRDD = 3.0e-4
RPRC = 1.4e-3
RHEBC = 0.8
RCUC = 0.05
RCPEC = 5.55e-5
CEVAPU = 0.0     # cevapcu unused in this path


def xalpha(t):
    return jnp.minimum(
        1.0, ((jnp.clip(t, RTICE, RTWAT) - RTICE) * RTWAT_RTICE_R) ** 2)


def fesat(t):
    a = xalpha(t)
    return c.c2es * (a * jnp.exp(c.c3les * (t - c.tzero)
                                 / (t - c.c4les))
                     + (1.0 - a) * jnp.exp(c.c3ies * (t - c.tzero)
                                           / (t - c.c4ies)))


def fdqsat(t):
    a = xalpha(t)
    return (a * c.c5alvcp / (t - c.c4les) ** 2
            + (1.0 - a) * c.c5alscp / (t - c.c4ies) ** 2)


def mlwocp(t):
    a = xalpha(t)
    return a * c.wlhvocp + (1.0 - a) * c.wlhsocp


def mlw(t):
    a = xalpha(t)
    return a * c.wlhv + (1.0 - a) * c.wlhs


def _moistadj(sp, t, q, flag, mode):
    """Saturation adjustment (moistadj, :5657-5807). sp (np,) Pa;
    t/q (np,) at one level; flag active mask; mode the jcall
    semantics: 1 = condense only (cond>0 gate, mixed-phase explicit
    es), 2 = evaporate only (cond<0, wet-bulb), else unconditional."""
    rp = 1.0 / sp

    def qsat(tv):
        qs = jnp.minimum(QSMAX, fesat(tv) * rp)
        cor = 1.0 / (1.0 - c.ep1 * qs)
        return qs * cor, cor

    if mode == 1:
        zl = 1.0 / (t - c.c4les)
        zi = 1.0 / (t - c.c4ies)
        a = xalpha(t)
        qs = c.c2es * (a * jnp.exp(c.c3les * (t - c.tzero) * zl)
                       + (1.0 - a) * jnp.exp(c.c3ies * (t - c.tzero)
                                             * zi)) * rp
        qs = jnp.minimum(QSMAX, qs)
        cor = 1.0 - c.ep1 * qs
        zf = a * c.c5alvcp * zl ** 2 + (1.0 - a) * c.c5alscp * zi ** 2
        cond = (q * cor ** 2 - qs * cor) / (cor ** 2 + qs * zf)
        cond = jnp.where(flag & (cond > 0.0), cond, 0.0)
        t1 = t + mlwocp(t) * cond
        q1 = q - cond
        zl = 1.0 / (t1 - c.c4les)
        zi = 1.0 / (t1 - c.c4ies)
        a = xalpha(t1)
        qs = c.c2es * (a * jnp.exp(c.c3les * (t1 - c.tzero) * zl)
                       + (1.0 - a) * jnp.exp(c.c3ies * (t1 - c.tzero)
                                             * zi)) * rp
        qs = jnp.minimum(QSMAX, qs)
        cor = 1.0 - c.ep1 * qs
        zf = a * c.c5alvcp * zl ** 2 + (1.0 - a) * c.c5alscp * zi ** 2
        cond1 = (q1 * cor ** 2 - qs * cor) / (cor ** 2 + qs * zf)
        cond1 = jnp.where(flag & (jnp.abs(cond) > 1e-30), cond1, 0.0)
        return t1 + mlwocp(t1) * cond1, q1 - cond1

    qs, cor = qsat(t)
    cond = (q - qs) / (1.0 + qs * cor * fdqsat(t))
    if mode == 2:
        cond = jnp.minimum(cond, 0.0)
    cond = jnp.where(flag, cond, 0.0)
    t1 = t + mlwocp(t) * cond
    q1 = q - cond
    qs, cor = qsat(t1)
    cond1 = (q1 - qs) / (1.0 + qs * cor * fdqsat(t1))
    if mode == 2:
        cond1 = jnp.where(jnp.abs(cond) < 1e-30,
                          jnp.minimum(cond1, 0.0), cond1)
    cond1 = jnp.where(flag, cond1, 0.0)
    return t1 + mlwocp(t1) * cond1, q1 - cond1


class TiedtkeOut(NamedTuple):
    tten: jax.Array      # K/s
    qten: jax.Array      # kg/kg/s (specific humidity basis)
    lten: jax.Array      # detrained liquid (kg/kg/s)
    iten: jax.Array      # detrained ice
    uten: jax.Array
    vten: jax.Array
    prate: jax.Array     # surface rain+snow (kg/m²/s)
    qdetr: jax.Array     # detrained water per step (kg/kg)
    raincc: jax.Array    # rain flux profile (kg/m²/s)
    cldfra: jax.Array    # Xu-Krueger cloud fraction
    ktype: jax.Array
    kctop: jax.Array
    kcbot: jax.Array
    # tracer-transport interface (section 11, :5344-5380): CFL-
    # rescaled draught fluxes + detrainment rates for ctracer
    ct_mfu: jax.Array
    ct_mfd: jax.Array
    ct_udrate: jax.Array
    ct_ddrate: jax.Array
    ct_ldcum: jax.Array
    ct_lddraf: jax.Array
    idtop: jax.Array


def cloudbase_search(t, q, tf, qf, qs, pf, geof, ahfs, qhfl,
                     entrpen, kt1, kt2, pnorm):
    """Departure-level cloud-base search — the reference's
    `cloudbase` (mod_cu_tiedtke.F90:7043-7493).

    The surface departure level (kk = nk-1) may only yield SHALLOW
    convection (:7391-7394, "No deep allowed for KLEV") and the
    search always continues upward; the first ELEVATED departure
    level whose cloud reaches rdepths wins and overrides any prior
    shallow accept, resetting the profile outside its span
    (:7449-7486). The departure-level sweep is an outer lax.scan
    whose body runs one inner ascent scan — O(nk) trace instead of
    the reference's O(nk2) unrolled loops.

    Inputs are top-down (np, nk) columns: tf/qf the half-level
    static-energy-max temperature / humidity from initcum, qs the
    full-level saturation humidity, pf (np, nk+1) interface Pa,
    geof interface geopotential, ahfs/qhfl turbulent heat/moisture
    flux (surface slot nk), kt1/kt2 the 350/60 hPa marker levels,
    pnorm the normalized static pressure profile (for the 60 hPa
    mixed-layer gate). Returns (ldcum, kcbot, ictop0, idpl,
    wubase, tu, qu, lu, ilab).
    """
    npx, nk = t.shape
    tu = tf
    qu = qf
    lu = jnp.zeros_like(t)
    ilab = jnp.zeros((npx, nk), jnp.int32)
    ar = jnp.arange(npx)
    karr = jnp.arange(nk)[None, :]
    idpl = jnp.full(npx, nk - 1, jnp.int32)
    kcbot = jnp.full(npx, -1, jnp.int32)
    ictop0 = jnp.full(npx, -1, jnp.int32)
    ldcum = jnp.zeros(npx, bool)
    wubase = jnp.zeros(npx)
    llfirst = jnp.ones(npx, bool)
    llgo_on = jnp.ones(npx, bool)
    lldeep = jnp.zeros(npx, bool)
    xsenh = c.cpd * tf + geof[:, :nk]
    pnorm_j = jnp.asarray(pnorm, t.dtype)
    # ascent scratch state persists ACROSS departure levels (:7106)
    xtu = tu
    xqu = qu
    xlu = jnp.zeros_like(t)
    suh = jnp.zeros_like(t)
    wu2h = jnp.zeros_like(t)
    buoh = jnp.zeros_like(t)
    iilab = jnp.zeros((npx, nk), jnp.int32)

    def _ascent_step(st, k, kk, surface):
        """One level of the test-parcel ascent (:7241-7372).
        `surface` selects the 1/z-entrainment shallow variant;
        `kk` is the departure level (traced for elevated rounds)."""
        (xtu, xqu, xlu, suh, wu2h, buoh, iilab, icbot, ll_ldbase,
         ictop, lldcum, go) = st
        act = go & (k <= kk - 1)
        dz = (geof[:, k] - geof[:, k + 1]) * c.regrav
        qfm = 0.5 * (qf[:, k + 1] + qf[:, k])
        sfm = 0.5 * (xsenh[:, k + 1] + xsenh[:, k])
        if surface:
            eps = 0.55 / jnp.maximum(
                (geof[:, k] - geof[:, nk]) * c.regrav, 1.0) + 1.0e-4
            zmix = 0.5 * dz * eps
            xtmp = 1.0 / (1.0 + zmix)
            quk = (xqu[:, k + 1] * (1.0 - zmix)
                   + 2.0 * zmix * qfm) * xtmp
            shk = (suh[:, k + 1] * (1.0 - zmix)
                   + 2.0 * zmix * sfm) * xtmp
        else:
            zmix = 0.4 * entrpen * dz * jnp.minimum(
                1.0, (qs[:, k] / qs[:, nk - 1]) ** 3)
            quk = xqu[:, k + 1] * (1.0 - zmix) + qfm * zmix
            shk = suh[:, k + 1] * (1.0 - zmix) + sfm * zmix
        qold = quk
        tk = (shk - geof[:, k]) * c.rcpd
        tk, quk = _moistadj(pf[:, k], tk, quk, act, 1)
        dq = jnp.maximum(qold - quk, 0.0)
        luk = xlu[:, k + 1] + dq
        xlglac = dq * (xalpha(xtu[:, k + 1]) - xalpha(tk))
        if surface:
            luk = jnp.minimum(luk, 5.0e-3)
        else:
            luk = 0.5 * luk
        shk = c.cpd * (tk + c.wlhfocp * xlglac) + geof[:, k]
        tvuh = (1.0 + c.ep1 * quk - luk) * tk + c.wlhfocp * xlglac
        tvenh = (1.0 + c.ep1 * qf[:, k]) \
            * (xsenh[:, k] - geof[:, k]) * c.rcpd
        bk = (tvuh - tvenh) * c.egrav / tvenh
        buof = 0.5 * (bk + buoh[:, k + 1])
        xtmp = 1.0 / (1.0 + 2.0 * zmix)
        w2k = (wu2h[:, k + 1] * (1.0 - 2.0 * zmix)
               + 2.0 * buof * dz) * xtmp
        # exact cloud base (:7324-7360): back out the LCL pressure
        # from dq/(dqsdt·dtdp) at the level below and choose the
        # nearest model level
        first_liq = act & (luk > 0.0) & (iilab[:, k + 1] == 1)
        tik = xtu[:, k + 1]
        qik = xqu[:, k + 1]
        es = fesat(tik) / pf[:, k + 1]
        qsu0 = jnp.minimum(QSMAX, es)
        qsu = qsu0 / (1.0 - c.ep1 * qsu0)
        dq2 = jnp.minimum(0.0, qik - qsu)
        a2 = xalpha(tik)
        fac = a2 * c.c5les / (tik - c.c4les) ** 2 \
            + (1.0 - a2) * c.c5ies / (tik - c.c4ies) ** 2
        dqsdt = fac * qsu / (1.0 - c.ep1 * es)
        dtdp = c.rgas * tik / (c.cpd * pf[:, k + 1])
        cbase = pf[:, k + 1] + dq2 / jnp.maximum(dqsdt * dtdp, 1e-10)
        pdifftop = cbase - pf[:, k]
        pdiffbot = pf[:, k + 1] - cbase
        base_up = first_liq & (pdifftop > pdiffbot) \
            & (wu2h[:, k + 1] > 0.0)
        base_here = first_liq & (pdifftop <= pdiffbot) & (w2k > 0.0)
        kb1 = jnp.minimum(nk - 2, k + 1)
        newb = (base_up | base_here) & ~ll_ldbase
        icbot = jnp.where(newb & base_up, kb1, icbot)
        icbot = jnp.where(newb & base_here & ~base_up, k, icbot)
        ll_ldbase = ll_ldbase | newb
        # store while active (go at loop entry)
        upd = act
        xtu = xtu.at[:, k].set(jnp.where(upd, tk, xtu[:, k]))
        xqu = xqu.at[:, k].set(jnp.where(upd, quk, xqu[:, k]))
        xlu = xlu.at[:, k].set(jnp.where(upd, luk, xlu[:, k]))
        xlu = xlu.at[:, k + 1].set(jnp.where(
            base_up, c.minqq, xlu[:, k + 1]))
        suh = suh.at[:, k].set(jnp.where(upd, shk, suh[:, k]))
        buoh = buoh.at[:, k].set(jnp.where(upd, bk, buoh[:, k]))
        wu2h = wu2h.at[:, k].set(jnp.where(upd, w2k, wu2h[:, k]))
        # label semantics (:7340-7372): the exact-base block sets
        # iilab(k)=2 in BOTH branches; on termination (w2k<0) the
        # label is left as-is, NOT zeroed
        lab_base = jnp.where(base_up | base_here, 2, iilab[:, k])
        lab_k = jnp.where(
            upd,
            jnp.where(w2k < 0.0, lab_base,
                      jnp.where((luk > 0.0) | base_here | base_up,
                                2, 1)),
            iilab[:, k])
        iilab = iilab.at[:, k].set(lab_k)
        iilab = iilab.at[:, kb1].set(jnp.where(
            base_up, 2, iilab[:, kb1]))
        # termination: kinetic energy negative (:7364-7372)
        stopd = act & (w2k < 0.0)
        ictop = jnp.where(stopd, k, ictop)
        lldcum = jnp.where(stopd, xlu[:, k + 1] > 0.0, lldcum)
        go = go & ~stopd
        return (xtu, xqu, xlu, suh, wu2h, buoh, iilab, icbot,
                ll_ldbase, ictop, lldcum, go)

    ks_in = jnp.arange(nk - 2, kt2 - 1, -1, dtype=jnp.int32)

    # ---- surface departure round (kk = nk-1), peeled ----------------
    kk = nk - 1
    icbot = jnp.full(npx, kk, jnp.int32)
    ictop = jnp.full(npx, nk - 2, jnp.int32)
    lldcum = jnp.zeros(npx, bool)
    ll_ldbase = jnp.zeros(npx, bool)
    go = llgo_on
    rho_s = pf[:, nk] / (c.rgas * t[:, nk - 1]
                         * (1.0 + c.ep1 * q[:, nk - 1]))
    khvfl = (ahfs[:, nk] * c.rcpd
             + c.ep1 * t[:, nk - 1] * qhfl[:, nk]) / rho_s
    ws0 = 0.001 - 1.5 * RKAP * khvfl \
        * (geof[:, nk - 1] - geof[:, nk]) / t[:, nk - 1]
    go = go & (khvfl < 0.0)
    # reference exponent is the literal 0.3333, not 1/3 (:7165)
    ws = 1.2 * jnp.maximum(ws0, 1e-10) ** 0.3333
    texc = jnp.maximum(-1.5 * ahfs[:, nk] / (rho_s * ws * c.cpd),
                       0.0)
    qexc = jnp.maximum(-1.5 * qhfl[:, nk] / (rho_s * ws), 0.0)
    quk = qf[:, kk] + qexc
    shk = xsenh[:, kk] + c.cpd * texc
    tuk = (xsenh[:, kk] - geof[:, kk]) * c.rcpd + texc
    xqu = xqu.at[:, kk].set(jnp.where(go, quk, xqu[:, kk]))
    suh = suh.at[:, kk].set(jnp.where(go, shk, suh[:, kk]))
    xtu = xtu.at[:, kk].set(jnp.where(go, tuk, xtu[:, kk]))
    xlu = xlu.at[:, kk].set(jnp.where(go, 0.0, xlu[:, kk]))
    wu2h = wu2h.at[:, kk].set(jnp.where(go, ws ** 2, wu2h[:, kk]))
    iilab = iilab.at[:, kk].set(jnp.where(go, 1, iilab[:, kk]))
    tvenh = (1.0 + c.ep1 * qf[:, kk]) \
        * (xsenh[:, kk] - geof[:, kk]) * c.rcpd
    tvuh = (1.0 + c.ep1 * xqu[:, kk]) * xtu[:, kk]
    buoh = buoh.at[:, kk].set(jnp.where(
        go, (tvuh - tvenh) * c.egrav / tvenh, buoh[:, kk]))

    st = (xtu, xqu, xlu, suh, wu2h, buoh, iilab, icbot, ll_ldbase,
          ictop, lldcum, go)
    st, _ = jax.lax.scan(
        lambda s, k: (_ascent_step(s, k, nk - 1, True), None),
        st, ks_in)
    (xtu, xqu, xlu, suh, wu2h, buoh, iilab, icbot, ll_ldbase,
     ictop, lldcum, go) = st

    depth = pf[ar, icbot] - pf[ar, ictop]
    # surface departure: shallow/Sc only (:7388-7394); the search
    # continues for every column
    lldcum = lldcum & ~(depth > RDEPTHS)
    ldcum = lldcum
    kcbot = jnp.where(lldcum, icbot, -1)
    ictop0 = jnp.where(lldcum, ictop, -1)
    idpl = jnp.where(lldcum, nk - 1, nk - 2).astype(jnp.int32)
    wubase = jnp.where(
        lldcum, jnp.sqrt(jnp.maximum(wu2h[ar, icbot], 0.0)), 0.0)
    span = karr >= ictop[:, None]
    tu = jnp.where(span, xtu, tu)
    qu = jnp.where(span, xqu, qu)
    lu = jnp.where(span, xlu, lu)
    ilab = jnp.where(span, iilab, ilab)
    llgo_on = jnp.ones(npx, bool)

    # ---- elevated departure rounds (outer scan over kk) -------------
    def _elev_round(carry, kk):
        (llgo_on, llfirst, lldeep, ldcum, kcbot, ictop0, idpl,
         wubase, tu, qu, lu, ilab, xtu, xqu, xlu, suh, wu2h, buoh,
         iilab) = carry
        icbot = jnp.full(npx, 1, jnp.int32) * kk
        ictop = jnp.full(npx, nk - 2, jnp.int32)
        lldcum = jnp.zeros(npx, bool)
        ll_ldbase = jnp.zeros(npx, bool)
        go = llgo_on
        texc, qexc = 0.2, 1.0e-4
        quk = qf[ar, kk] + qexc
        shk = xsenh[ar, kk] + c.cpd * texc
        tuk = (xsenh[ar, kk] - geof[ar, kk]) * c.rcpd + texc
        # mixed layer for parcels in the lowest 60 hPa (level gate
        # from the static pnorm profile: see module scope notes)
        w1 = jnp.zeros(npx)
        qm = jnp.zeros(npx)
        sm = jnp.zeros(npx)
        for off in (1, 0, -1):            # k2 = kk+1, kk, kk-1
            k2 = kk + off
            w2 = pf[ar, k2] - pf[ar, k2 - 1]
            take = w1 < 50.0e2
            qm = qm + jnp.where(take, qf[ar, k2] * w2, 0.0)
            sm = sm + jnp.where(take, xsenh[ar, k2] * w2, 0.0)
            w1 = w1 + jnp.where(take, w2, 0.0)
        qmix = qm / jnp.maximum(w1, 1.0) + qexc
        smix = sm / jnp.maximum(w1, 1.0) + c.cpd * texc
        tmix = (smix - geof[ar, kk]) * c.rcpd + texc  # :7218
        mixed = (c.stdp - pnorm_j[kk - 1]) < 60.0e2
        quk = jnp.where(mixed, qmix, quk)
        shk = jnp.where(mixed, smix, shk)
        tuk = jnp.where(mixed, tmix, tuk)
        xqu = xqu.at[ar, kk].set(jnp.where(go, quk, xqu[ar, kk]))
        suh = suh.at[ar, kk].set(jnp.where(go, shk, suh[ar, kk]))
        xtu = xtu.at[ar, kk].set(jnp.where(go, tuk, xtu[ar, kk]))
        xlu = xlu.at[ar, kk].set(jnp.where(go, 0.0, xlu[ar, kk]))
        wu2h = wu2h.at[ar, kk].set(jnp.where(go, 1.0,
                                             wu2h[ar, kk]))
        iilab = iilab.at[ar, kk].set(jnp.where(go, 1,
                                               iilab[ar, kk]))
        tvenh = (1.0 + c.ep1 * qf[ar, kk]) \
            * (xsenh[ar, kk] - geof[ar, kk]) * c.rcpd
        tvuh = (1.0 + c.ep1 * xqu[ar, kk]) * xtu[ar, kk]
        buoh = buoh.at[ar, kk].set(jnp.where(
            go, (tvuh - tvenh) * c.egrav / tvenh, buoh[ar, kk]))

        st = (xtu, xqu, xlu, suh, wu2h, buoh, iilab, icbot,
              ll_ldbase, ictop, lldcum, go)
        st, _ = jax.lax.scan(
            lambda s, k: (_ascent_step(s, k, kk, False), None),
            st, ks_in)
        (xtu, xqu, xlu, suh, wu2h, buoh, iilab, icbot, ll_ldbase,
         ictop, lldcum, go) = st

        depth = pf[ar, icbot] - pf[ar, ictop]
        # first deep-depth elevated level wins (:7438-7486)
        accept = llgo_on & llfirst & (depth >= RDEPTHS)
        llfirst = llfirst & ~accept
        lldeep = lldeep | accept
        idpl = jnp.where(accept, kk, idpl).astype(jnp.int32)
        ictop0 = jnp.where(accept, ictop, ictop0)
        kcbot = jnp.where(accept, icbot, kcbot)
        ldcum = jnp.where(accept, lldcum, ldcum)
        wubase = jnp.where(
            accept, jnp.sqrt(jnp.maximum(wu2h[ar, icbot], 0.0)),
            wubase)
        acc2 = accept[:, None]
        span = (karr <= kk) & (karr >= ictop[:, None])
        env_lab = jnp.where(karr < ictop[:, None], 0, 1)
        tu = jnp.where(acc2, jnp.where(span, xtu, tf), tu)
        qu = jnp.where(acc2, jnp.where(span, xqu, qf), qu)
        lu = jnp.where(acc2, jnp.where(span, xlu, 0.0), lu)
        ilab = jnp.where(acc2, jnp.where(span, iilab, env_lab),
                         ilab)
        llgo_on = ~lldeep
        return (llgo_on, llfirst, lldeep, ldcum, kcbot, ictop0,
                idpl, wubase, tu, qu, lu, ilab, xtu, xqu, xlu, suh,
                wu2h, buoh, iilab), None

    carry_cb = (llgo_on, llfirst, lldeep, ldcum, kcbot, ictop0,
                idpl, wubase, tu, qu, lu, ilab, xtu, xqu, xlu, suh,
                wu2h, buoh, iilab)
    carry_cb, _ = jax.lax.scan(
        _elev_round, carry_cb,
        jnp.arange(nk - 2, kt1 - 1, -1, dtype=jnp.int32))
    (llgo_on, llfirst, lldeep, ldcum, kcbot, ictop0, idpl, wubase,
     tu, qu, lu, ilab, xtu, xqu, xlu, suh, wu2h, buoh,
     iilab) = carry_cb

    kcbot = jnp.where(ldcum, jnp.maximum(kcbot, 0), nk - 2)
    ictop0 = jnp.where(ldcum, jnp.maximum(ictop0, 0), nk - 2)
    return (ldcum, kcbot, ictop0, idpl, wubase, tu, qu, lu,
            ilab)


def ntiedtke(t, q, u, v, qctot, qhfl, ahfs, ph, pf, geo, geof,
             tenq_dyn, tent_dyn, ldland, dtcum, dx, pref,
             omega=None, lmfmid=True, lmfsmooth=False):
    """One Tiedtke call on (np, nk) columns (top-down ordering).

    t/q (K, specific humidity), ph/pf layer/interface Pa, geo/geof
    geopotential, omega (Pa/s), qhfl/ahfs turbulent moisture/heat flux
    (surface value in slot nk), tenq_dyn/tent_dyn the dynamic
    tendencies (for moisture-convergence closures). Returns pure
    CUMULUS tendencies (not including the input dynamics)."""
    npx, nk = t.shape
    dt = dtcum
    rdt = 1.0 / dt
    cons2 = (3.0 if dx >= 17747.5 else 5.0) / (c.egrav * dtcum)
    cons = 1.0 / (c.egrav * dtcum)
    rtau_s = min(3.0, 1.0 + 264.0 / max(dx / 1000.0, 1.0))

    # static marker levels from the normalized profile `pref`
    # (hsigma·stdp; reference uses the instantaneous domain mean)
    pnorm = np.asarray(pref) / np.asarray(pref)[nk - 1] * c.stdp

    def _first_below(plev):
        m = pnorm > plev
        return int(np.argmax(m)) if m.any() else nk - 1

    nk350 = _first_below(350.0e2)
    nk060 = _first_below(60.0e2)
    nk950 = _first_below(950.0e2)
    nmctop0 = _first_below(300.0e2)   # cmcptop=300 hPa (:111, :331-342)
    if omega is None:
        lmfmid = False

    qs = jnp.minimum(QSMAX, fesat(t) / ph)
    qs = qs / (1.0 - c.ep1 * qs)

    entrpen = jnp.where(ldland, ENTRPEN_LND, ENTRPEN_OCN)

    # ---------------- initcum (:5524) ---------------------------------
    # per-level interpolation is independent → fully vectorized; the
    # downward static-energy max cascade is a lax.scan
    karr_i = jnp.arange(1, nk)[None, :]
    tf_mid = (jnp.maximum(c.cpd * t[:, :-1] + geo[:, :-1],
                          c.cpd * t[:, 1:] + geo[:, 1:])
              - geof[:, 1:nk]) * c.rcpd
    tma, qma = _moistadj(pf[:, 1:nk], tf_mid, qs[:, :-1],
                         jnp.ones((npx, nk - 1), bool), 3)
    qf_ma = jnp.maximum(jnp.minimum(q[:, :-1], qs[:, :-1])
                        + (qma - qs[:, :-1]), 0.0)
    ma_span = (karr_i >= nk060) & (karr_i < nk - 2)
    tf = jnp.concatenate(
        [t[:, :1], jnp.where(ma_span, tma, tf_mid)], axis=1)
    qf = jnp.concatenate(
        [q[:, :1], jnp.where(ma_span, qf_ma, q[:, :-1])], axis=1)
    tf = tf.at[:, nk - 1].set(
        (c.cpd * t[:, nk - 1] + geo[:, nk - 1] - geof[:, nk - 1])
        * c.rcpd)
    qf = qf.at[:, nk - 1].set(q[:, nk - 1])

    def _senmax_body(tf, k):
        zs = jnp.maximum(c.cpd * tf[:, k] + geof[:, k],
                         c.cpd * tf[:, k + 1] + geof[:, k + 1])
        return tf.at[:, k].set((zs - geof[:, k]) * c.rcpd), None

    tf, _ = jax.lax.scan(_senmax_body, tf,
                         jnp.arange(nk - 2, 0, -1, dtype=jnp.int32))

    td = tf
    qd = qf
    uu = jnp.concatenate([u[:, :1], u[:, :-1]], axis=1)
    vu = jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)
    ud = uu
    vd = vu

    # ---------------- cloudbase (:7056): departure-level search -------
    (ldcum, kcbot, ictop0, idpl, wubase, tu, qu, lu,
     ilab) = cloudbase_search(t, q, tf, qf, qs, pf, geof, ahfs,
                              qhfl, entrpen, nk350, nk060, pnorm)

    # ---------------- moisture convergence + cloud type ---------------
    dqcv = jnp.zeros(npx)
    dhpbl = jnp.zeros(npx)
    karr = jnp.arange(nk)[None, :]
    dpk = pf[:, 1:] - pf[:, :-1]
    dqcv = jnp.sum(jnp.where(karr >= nk060,
                             jnp.maximum(0.0, tenq_dyn) * dpk, 0.0),
                   axis=1)
    below_base = karr >= kcbot[:, None]
    dhpbl = jnp.sum(jnp.where(below_base & ldcum[:, None],
                              (c.wlhv * tenq_dyn
                               + c.cpd * tent_dyn) * dpk, 0.0), axis=1)
    depth = pf[jnp.arange(npx), kcbot] - pf[jnp.arange(npx), ictop0]
    ktype = jnp.where(ldcum, jnp.where(depth >= RDEPTHS, 1, 2), 0)

    # initial cloud-base mass flux
    ar = jnp.arange(npx)
    mfmax_b = (pf[ar, kcbot] - pf[ar, kcbot - 1]) * cons2 * RMFLIC \
        + RMFLIA
    qumqe = qu[ar, kcbot] + lu[ar, kcbot] - qf[ar, kcbot]
    dqmin = jnp.maximum(0.01 * qf[ar, kcbot], 1.0e-10)
    dhb = c.cpd * (tu[ar, kcbot] - tf[ar, kcbot]) + c.wlhv * qumqe
    dhb = c.egrav * jnp.maximum(dhb, 1.0e5 * dqmin)
    mfub_shal = jnp.where(dhpbl > 0.0,
                          jnp.minimum(dhpbl / dhb, mfmax_b),
                          mfmax_b * 0.1)
    ldcum = jnp.where((ktype == 2) & (dhpbl <= 0.0), False, ldcum)
    mfub = jnp.where(ktype == 1, mfmax_b * 0.1,
                     jnp.where(ktype == 2, mfub_shal, 0.0))
    mfub = jnp.where(ldcum, mfub, 0.0)

    # ---------------- ascent (:5818) ----------------------------------
    kctop = kcbot
    mfu = jnp.zeros_like(t)
    mfus = jnp.zeros_like(t)
    mfuq = jnp.zeros_like(t)
    mful = jnp.zeros_like(t)
    lude = jnp.zeros_like(t)
    lglac = jnp.zeros_like(t)
    dmfup = jnp.zeros_like(t)
    xrain = jnp.zeros_like(t)
    kineu = jnp.zeros_like(t)
    mfude_rate = jnp.zeros_like(t)
    wmean = jnp.zeros(npx)
    dpmean = jnp.zeros(npx)
    zoentr = jnp.zeros(npx)
    luold = jnp.zeros(npx)

    lu = jnp.where((karr == kcbot[:, None]), lu, 0.0)
    base2 = ldcum[:, None] & (karr == kcbot[:, None])
    mfu = jnp.where(base2, mfub[:, None], 0.0)
    mfus = jnp.where(base2, mfub[:, None]
                     * (c.cpd * tu + geof[:, :nk]), 0.0)
    mfuq = jnp.where(base2, mfub[:, None] * qu, 0.0)
    mful = jnp.where(base2, mfub[:, None] * lu, 0.0)
    kineu = jnp.where(base2, 0.5 * wubase[:, None] ** 2, 0.0)

    dnoprc = jnp.where(ldland, 5.0e-4, 3.0e-4)
    prcdgw = jnp.where(ldland, RPRC, RPRC) * c.regrav

    def _ascent_body(carry, k):
        (mfu, mfus, mfuq, mful, lude, lglac, dmfup, xrain, kineu,
         mfude_rate, tu, qu, lu, ilab, kctop, wmean, dpmean,
         zoentr, ldcum, kcbot, ktype, mfub) = carry
        if lmfmid:
            # midlevel cloud base (mcbase, :6255-6283): start a fresh
            # ktype=3 updraft where no convection exists yet
            mc = (~ldcum) & (ilab[:, k + 1] == 0) \
                & (k < nk - 2) & (k > nmctop0) \
                & (geo[:, k] > 5000.0) & (geo[:, k] < 10000.0) \
                & (q[:, k] > 0.8 * qs[:, k])
            mfub_mc = jnp.clip(-omega[:, k] * c.regrav,
                               CMFCMIN, CMFCMAX)
            tu_mc = (c.cpd * t[:, k] + geo[:, k]
                     - geof[:, k + 1]) * c.rcpd
            setk1 = lambda a, v: a.at[:, k + 1].set(
                jnp.where(mc, v, a[:, k + 1]))
            tu = setk1(tu, tu_mc)
            qu = setk1(qu, q[:, k])
            lu = setk1(lu, jnp.zeros(npx))
            mfu = setk1(mfu, mfub_mc)
            mfus = setk1(mfus, mfub_mc * (c.cpd * tu_mc
                                          + geof[:, k + 1]))
            mfuq = setk1(mfuq, mfub_mc * q[:, k])
            mful = setk1(mful, jnp.zeros(npx))
            dmfup = setk1(dmfup, jnp.zeros(npx))
            xrain = setk1(xrain, jnp.zeros(npx))
            kcbot = jnp.where(mc, k, kcbot)
            ilab = ilab.at[:, k + 1].set(
                jnp.where(mc, 1, ilab[:, k + 1]))
            ktype = jnp.where(mc, 3, ktype)
            mfub = jnp.where(mc, mfub_mc, mfub)
            # cap midlevel base mass flux (:5942-5952)
            cap = (ktype == 3) & (k == kcbot)
            mfmax_mc = (pf[:, k] - pf[:, k - 1]) * cons2 * RMFLIC \
                + RMFLIA
            fac_mc = jnp.where(cap & (mfub > mfmax_mc),
                               mfmax_mc / jnp.maximum(mfub, CMFCMIN),
                               1.0)
            mfu = mfu.at[:, k + 1].multiply(fac_mc)
            mfus = mfus.at[:, k + 1].multiply(fac_mc)
            mfuq = mfuq.at[:, k + 1].multiply(fac_mc)
            mfub = jnp.where(cap, jnp.minimum(mfub, mfmax_mc), mfub)
        # midlevel first saturated step enters via ilab==1 (:5930-5931)
        mid1 = (ktype == 3) & (ilab[:, k + 1] == 1)
        active = (ldcum & (ilab[:, k + 1] == 2)) | mid1
        # entrainment/detrainment (entrainm + organized)
        below = k < kcbot
        mfterm = mfu[:, k + 1] * (geof[:, k] - geof[:, k + 1]) \
            * c.regrav
        dmfen0 = jnp.where(below, entrpen * mfterm, 0.0)
        dmfde0 = jnp.where(below, DETRPEN * mfterm, 0.0)
        dmfde0 = jnp.minimum(dmfde0, 0.75 * mfu[:, k + 1])
        atbase = k == kcbot
        zoentr = jnp.where(
            atbase,
            jnp.minimum(
                0.4, -entrpen * (jnp.minimum(1.0, q[:, k] / qs[:, k])
                                 - 1.0)
                * (geof[:, k] - geof[:, k + 1]) * c.regrav)
            * mfu[:, k + 1],
            zoentr)
        mfmax = (pf[:, k] - pf[:, k - 1]) * cons2 * RMFLIC + RMFLIA
        zxs = jnp.maximum(mfu[:, k + 1] - mfmax, 0.0)
        wmean = wmean + jnp.where(active & below,
                                  kineu[:, k + 1]
                                  * (ph[:, k + 1] - ph[:, k]), 0.0)
        dpmean = dpmean + jnp.where(active & below,
                                    ph[:, k + 1] - ph[:, k], 0.0)
        dmfen = jnp.where(below, zoentr, dmfen0)
        shal = ktype >= 2
        dmfen = jnp.where(below & shal, ENTSHALP * dmfen, dmfen)
        dmfde = jnp.where(below & shal, dmfen, dmfde0)
        dmfde = jnp.where(
            below, dmfde * (1.6 - jnp.minimum(1.0, q[:, k]
                                              / qs[:, k])), dmfde)
        mftest = mfu[:, k + 1] + dmfen - dmfde
        change = jnp.maximum(mftest - mfmax, 0.0)
        zxe = jnp.maximum(change - zxs, 0.0)
        dmfen = jnp.where(below, dmfen - zxe, dmfen)
        change = change - zxe
        dmfde = jnp.where(below, dmfde + change, dmfde)

        mfk = mfu[:, k + 1] + dmfen - dmfde
        qeen = qf[:, k + 1] * dmfen
        seen = (c.cpd * tf[:, k + 1] + geof[:, k + 1]) * dmfen
        leen = jnp.where(qctot[:, k] > c.minqq,
                         qctot[:, k] * dmfen, 0.0)
        scde = (c.cpd * tu[:, k + 1] + geof[:, k + 1]) * dmfde
        qude = qu[:, k + 1] * dmfde
        lude_k = lu[:, k + 1] * dmfde
        mfusk = mfus[:, k + 1] + seen - scde
        mfuqk = mfuq[:, k + 1] + qeen - qude
        mfulk = mful[:, k + 1] + leen - lude_k
        rmf = 1.0 / jnp.maximum(CMFCMIN, mfk)
        luk = mfulk * rmf
        quk = mfuqk * rmf
        tk = jnp.clip((mfusk * rmf - geof[:, k]) * c.rcpd, 100.0,
                      400.0)
        qold = quk
        xrk = xrain[:, k + 1] * (mfu[:, k + 1] - dmfde) * rmf
        luold = luk
        # moist adjustment
        tk, quk = _moistadj(pf[:, k], tk, quk, active, 1)
        condensed = active & (jnp.abs(quk - qold) > 0.0)
        lgl = jnp.where(condensed,
                        luk * (xalpha(tu[:, k + 1]) - xalpha(tk)),
                        0.0)
        tk = tk + c.wlhfocp * lgl
        luk = jnp.where(condensed, luk + qold - quk, luk)
        bc = tk * (1.0 + c.ep1 * quk - lu[:, k + 1]
                   - xrain[:, k + 1])
        be = tf[:, k] * (1.0 + c.ep1 * qf[:, k])
        buo_k = bc - be
        # midlevel first-step acceptance (:6052-6063)
        ok3 = mid1 & condensed & (buo_k > -0.5)
        bad3 = mid1 & condensed & (buo_k <= -0.5)
        ldcum = ldcum | ok3
        kctop = jnp.where(ok3, k, kctop)
        buoc = (buo_k / (tf[:, k] * (1.0 + c.ep1 * qf[:, k]))
                + jnp.zeros(npx)) * 0.5
        dkbuo = (geof[:, k] - geof[:, k + 1]) * (0.5 / 1.5) * buoc
        dken = jnp.minimum(1.0, (1.0 + CWDRAG)
                           * jnp.where(dmfen > 0.0, dmfen, dmfde)
                           / jnp.maximum(CMFCMIN, mfu[:, k + 1]))
        kin_k = (kineu[:, k + 1] * (1.0 - dken) + dkbuo) \
            / (1.0 + dken)
        kin_k = jnp.where(ok3, 0.5, kin_k)
        # negative buoyancy: enhanced detrainment (ilab==2 only)
        negb = condensed & (buo_k < 0.0) & ~mid1
        kedke = jnp.clip(kin_k / jnp.maximum(1.0e-10,
                                             kineu[:, k + 1]),
                         0.0, 1.0)
        mfun = jnp.sqrt(kedke) * mfu[:, k + 1]
        dmfde = jnp.where(negb, jnp.maximum(dmfde,
                                            mfu[:, k + 1] - mfun),
                          dmfde)
        lude_k = jnp.where(negb, lu[:, k + 1] * dmfde, lude_k)
        mfk = jnp.where(negb, mfu[:, k + 1] + dmfen - dmfde, mfk)
        # failed midlevel first step: cancel the plume (:6059-6063)
        mfk = jnp.where(bad3, 0.0, mfk)
        kin_k = jnp.where(bad3, 0.0, kin_k)
        lude_k = jnp.where(bad3, 0.0, lude_k)
        luk = jnp.where(bad3, 0.0, luk)
        # organized entrainment for next level
        posb = condensed & (buo_k > -0.2) & ~mid1
        zoentr = jnp.where(
            posb,
            jnp.minimum(0.4, entrpen
                        * (0.3 - (jnp.minimum(
                            1.0, q[:, k - 1] / qs[:, k - 1]) - 1.0))
                        * (geof[:, k - 1] - geof[:, k]) * c.regrav
                        * jnp.minimum(1.0, qs[:, k]
                                      / qs[ar, kcbot]) ** 3) * mfk,
            jnp.where(condensed, 0.0, zoentr))
        alive = condensed & (kin_k > 0.0) & (mfk > 0.0)
        kctop = jnp.where(alive, k, kctop)
        dead = condensed & ~alive & ~bad3   # bad3 cancels with lude=0
        dmfde = jnp.where(dead, mfu[:, k + 1], dmfde)
        lude_k = jnp.where(dead, lu[:, k + 1] * dmfde, lude_k)
        mfk = jnp.where(dead, 0.0, mfk)
        kin_k = jnp.where(dead, 0.0, kin_k)
        # shallow termination without condensation
        term2 = active & (ktype == 2) & ~condensed
        dmfde = jnp.where(term2, mfu[:, k + 1], dmfde)
        lude_k = jnp.where(term2, lu[:, k + 1] * dmfde, lude_k)
        mfk = jnp.where(term2, 0.0, mfk)
        kin_k = jnp.where(term2, 0.0, kin_k)
        lab_k = jnp.where(alive, 2, 0)
        # precipitation by analytic integration of l-equation
        precip = jnp.zeros(npx)
        hasprc = alive & (luk > dnoprc)
        zwu = jnp.minimum(15.0, jnp.sqrt(
            2.0 * jnp.maximum(0.1, kineu[:, k + 1])))
        prcon = prcdgw / (0.75 * zwu)
        zdt = jnp.minimum(RTBER - RTICE,
                          jnp.maximum(RTBER - tk, 0.0))
        cbf = 1.0 + 0.5 * jnp.sqrt(zdt)
        zco = prcon * cbf
        lcrit = dnoprc / cbf
        zdfi = geof[:, k] - geof[:, k + 1]
        zc = luk - luold
        arg = (luk / lcrit) ** 2
        zd = jnp.where(arg < 25.0,
                       zco * (1.0 - jnp.exp(-jnp.minimum(arg, 25.0)))
                       * zdfi,
                       zco * zdfi)
        zint = jnp.exp(-jnp.minimum(zd, 25.0))
        lnew = jnp.clip(luold * zint
                        + zc / jnp.maximum(zd, 1e-10) * (1.0 - zint),
                        0.0, jnp.minimum(luk, 5.0e-3))
        precip = jnp.where(hasprc,
                           jnp.maximum(0.0, luold + zc - lnew), 0.0)
        dmfup_k = precip * mfk
        xrk = xrk + precip
        luk = jnp.where(hasprc, lnew, luk)
        # rain evaporation/unloading in updraught
        hasrain = alive & (xrk > 0.0)
        zvw = 21.18 * jnp.maximum(xrk, 1e-20) ** 0.2
        zvi = 0.5 * zvw
        alfaw = xalpha(tk)
        zvv = alfaw * zvw + (1.0 - alfaw) * zvi
        rold = xrk - precip
        zwu2 = jnp.minimum(15.0, jnp.sqrt(
            2.0 * jnp.maximum(0.1, kin_k)))
        zd2 = zvv / zwu2
        zint2 = jnp.exp(-jnp.minimum(zd2, 25.0))
        rnew = jnp.clip(rold * zint2 + precip
                        / jnp.maximum(zd2, 1e-10) * (1.0 - zint2),
                        0.0, xrk)
        xrk = jnp.where(hasrain, rnew, xrk)

        store = active
        mfu = mfu.at[:, k].set(jnp.where(store, mfk, mfu[:, k]))
        tu = tu.at[:, k].set(jnp.where(store, tk, tu[:, k]))
        qu = qu.at[:, k].set(jnp.where(store, quk, qu[:, k]))
        lu = lu.at[:, k].set(jnp.where(store, luk, lu[:, k]))
        lude = lude.at[:, k].set(jnp.where(store, lude_k,
                                           lude[:, k]))
        lglac = lglac.at[:, k].set(jnp.where(store, lgl,
                                             lglac[:, k]))
        dmfup = dmfup.at[:, k].set(jnp.where(store, dmfup_k, 0.0))
        xrain = xrain.at[:, k].set(jnp.where(store, xrk, 0.0))
        kineu = kineu.at[:, k].set(jnp.where(store, kin_k,
                                             kineu[:, k]))
        mfude_rate = mfude_rate.at[:, k].set(
            jnp.where(store & (mfu[:, k + 1] > 0.0), dmfde, 0.0))
        ilab = ilab.at[:, k].set(jnp.where(store, lab_k,
                                           ilab[:, k]))
        mful = mful.at[:, k].set(jnp.where(store, luk * mfk,
                                           mful[:, k]))
        mfus = mfus.at[:, k].set(
            jnp.where(store, (c.cpd * tk + geof[:, k]) * mfk,
                      mfus[:, k]))
        mfuq = mfuq.at[:, k].set(jnp.where(store, quk * mfk,
                                           mfuq[:, k]))
        return (mfu, mfus, mfuq, mful, lude, lglac, dmfup, xrain,
                kineu, mfude_rate, tu, qu, lu, ilab, kctop, wmean,
                dpmean, zoentr, ldcum, kcbot, ktype, mfub), None

    carry0 = (mfu, mfus, mfuq, mful, lude, lglac, dmfup, xrain,
              kineu, mfude_rate, tu, qu, lu, ilab, kctop, wmean,
              dpmean, zoentr, ldcum, kcbot, ktype, mfub)
    carry0, _ = jax.lax.scan(_ascent_body, carry0,
                             jnp.arange(nk - 2, 1, -1, dtype=jnp.int32))
    (mfu, mfus, mfuq, mful, lude, lglac, dmfup, xrain, kineu,
     mfude_rate, tu, qu, lu, ilab, kctop, wmean, dpmean,
     zoentr, ldcum, kcbot, ktype, mfub) = carry0

    ldcum = ldcum & (kctop >= 0)
    kcbot = jnp.maximum(kcbot, kctop)
    wmean = jnp.sqrt(2.0 * jnp.maximum(
        1.0e-2, wmean / jnp.maximum(1.0, dpmean)))
    # re-evaluate type from realized depth
    depth = pf[ar, kcbot] - pf[ar, kctop]
    ktype = jnp.where(ldcum & (ktype == 1) & (depth < RDEPTHS), 2,
                      ktype)
    ktype = jnp.where(ldcum & (ktype == 2) & (depth >= RDEPTHS), 1,
                      ktype)

    rfl = jnp.sum(dmfup, axis=1)

    # ---------------- downdrafts: lfs + ddrafdsc ----------------------
    mfd = jnp.zeros_like(t)
    mfds = jnp.zeros_like(t)
    mfdq = jnp.zeros_like(t)
    dmfdp = jnp.zeros_like(t)
    mfdde_rate = jnp.zeros_like(t)
    lddraf = jnp.zeros(npx, bool)
    idtop = jnp.full(npx, nk, jnp.int32)
    hs = c.cpd * t + geo + mlw(t) * qs
    hs = jnp.where((karr >= 2) & (karr <= nk - 3), hs, 1.0e9)
    ikhsmin = jnp.argmin(hs, axis=1)

    def _lfs_body(carry, k):
        (idtop, lddraf, td, qd, mfd, mfds, mfdq, dmfdp, rfl) = carry
        cand = ldcum & (rfl > 0.0) & ~lddraf \
            & (k < kcbot) & (k > kctop) & (k >= ikhsmin)
        tw, qw = _moistadj(pf[:, k], tf[:, k], qf[:, k], cand, 2)
        ttest = 0.5 * (tu[:, k] + tw)
        qtest = 0.5 * (qu[:, k] + qw)
        buo = ttest * (1.0 + c.ep1 * qtest) \
            - tf[:, k] * (1.0 + c.ep1 * qf[:, k])
        cond = qf[:, k] - qw
        mftop = -RMFDEPS * mfub
        trig = cand & (buo < 0.0) & (rfl > 10.0 * mftop * cond)
        idtop = jnp.where(trig, k, idtop)
        lddraf = lddraf | trig
        td = td.at[:, k].set(jnp.where(trig, ttest, td[:, k]))
        qd = qd.at[:, k].set(jnp.where(trig, qtest, qd[:, k]))
        mfd = mfd.at[:, k].set(jnp.where(trig, mftop, mfd[:, k]))
        mfds = mfds.at[:, k].set(jnp.where(
            trig, mftop * (c.cpd * ttest + geof[:, k]), mfds[:, k]))
        mfdq = mfdq.at[:, k].set(jnp.where(trig, mftop * qtest,
                                           mfdq[:, k]))
        dmfdp = dmfdp.at[:, k - 1].set(jnp.where(
            trig, -0.5 * mftop * cond, dmfdp[:, k - 1]))
        rfl = rfl + jnp.where(trig, -0.5 * mftop * cond, 0.0)
        return (idtop, lddraf, td, qd, mfd, mfds, mfdq, dmfdp,
                rfl), None

    carry1 = (idtop, lddraf, td, qd, mfd, mfds, mfdq, dmfdp, rfl)
    carry1, _ = jax.lax.scan(_lfs_body, carry1,
                             jnp.arange(2, nk - 3, dtype=jnp.int32))
    (idtop, lddraf, td, qd, mfd, mfds, mfdq, dmfdp, rfl) = carry1

    # descent
    oentr = jnp.zeros(npx)
    buoyI = jnp.zeros(npx)
    itopde = nk950

    def _descent_body(carry, k):
        (mfd, td, qd, mfds, mfdq, dmfdp, rfl, mfdde_rate, buoyI,
         oentr) = carry
        act = lddraf & (mfd[:, k - 1] < 0.0)
        entr = ENTRDD * mfd[:, k - 1] \
            * (geof[:, k - 1] - geof[:, k]) * c.regrav
        # below itopde the profile decreases linearly; above it the
        # buoyancy-organized entrainment applies (itopde static)
        xdmfde_lin = mfd[:, itopde] * (pf[:, k] - pf[:, k - 1]) \
            / (pf[:, nk] - pf[:, itopde])
        dzn = -(geof[:, k - 1] - geof[:, k]) * c.regrav
        zentr = oentr * dzn * mfd[:, k - 1]
        dmfen_e = entr + zentr
        dmfen_e = jnp.maximum(dmfen_e, 0.3 * mfd[:, k - 1])
        dmfen_e = jnp.maximum(
            dmfen_e, -0.75 * mfu[:, k] - (mfd[:, k - 1] - entr))
        dmfen_e = jnp.minimum(dmfen_e, 0.0)
        deep_dn = k > itopde
        dmfen = jnp.where(deep_dn, 0.0, dmfen_e)
        xdmfde = jnp.where(deep_dn, xdmfde_lin, entr)
        mfdk = mfd[:, k - 1] + dmfen - xdmfde
        seen = (c.cpd * tf[:, k - 1] + geof[:, k - 1]) * dmfen
        qeen = qf[:, k - 1] * dmfen
        sdde = (c.cpd * td[:, k - 1] + geof[:, k - 1]) * xdmfde
        qdde = qd[:, k - 1] * xdmfde
        mfdsk = mfds[:, k - 1] + seen - sdde
        mfdqk = mfdq[:, k - 1] + qeen - qdde
        rmfd = 1.0 / jnp.minimum(-CMFCMIN, mfdk)
        qdk = mfdqk * rmfd
        tdk = jnp.clip((mfdsk * rmfd - geof[:, k]) * c.rcpd, 100.0,
                       400.0)
        cond0 = qdk
        tdk, qdk = _moistadj(pf[:, k], tdk, qdk, act, 2)
        cond = cond0 - qdk
        buo = tdk * (1.0 + c.ep1 * qdk) \
            - tf[:, k] * (1.0 + c.ep1 * qf[:, k])
        hasr = (rfl > 0.0) & (mfu[:, k] > 0.0)
        buo = buo - jnp.where(hasr, tdk * rfl
                              / jnp.maximum(mfu[:, k], CMFCMIN), 0.0)
        kill = act & ((buo >= 0.0) | (rfl <= mfdk * cond))
        mfdk = jnp.where(kill, 0.0, mfdk)
        xdmfdp = -mfdk * cond
        store = act
        mfd = mfd.at[:, k].set(jnp.where(store, mfdk, mfd[:, k]))
        td = td.at[:, k].set(jnp.where(store, tdk, td[:, k]))
        qd = qd.at[:, k].set(jnp.where(store, qdk, qd[:, k]))
        mfds = mfds.at[:, k].set(jnp.where(
            store, (c.cpd * tdk + geof[:, k]) * mfdk, mfds[:, k]))
        mfdq = mfdq.at[:, k].set(jnp.where(store, qdk * mfdk,
                                           mfdq[:, k]))
        dmfdp = dmfdp.at[:, k - 1].set(jnp.where(store, xdmfdp,
                                                 dmfdp[:, k - 1]))
        rfl = rfl + jnp.where(store, xdmfdp, 0.0)
        mfdde_rate = mfdde_rate.at[:, k].set(
            jnp.where(store, -xdmfde, 0.0))
        buoyz = jnp.minimum(jnp.where(store, buo / tf[:, k], 0.0),
                            0.0)
        dzn2 = -(geo[:, k - 1] - geo[:, k])
        buoyI = buoyI + buoyz * dzn2
        oentr = jnp.where(store,
                          c.egrav * buoyz * 0.5 / (1.0 + buoyI),
                          oentr)
        return (mfd, td, qd, mfds, mfdq, dmfdp, rfl, mfdde_rate,
                buoyI, oentr), None

    carry2 = (mfd, td, qd, mfds, mfdq, dmfdp, rfl, mfdde_rate,
              buoyI, oentr)
    carry2, _ = jax.lax.scan(_descent_body, carry2,
                             jnp.arange(2, nk, dtype=jnp.int32))
    (mfd, td, qd, mfds, mfdq, dmfdp, rfl, mfdde_rate, buoyI,
     oentr) = carry2

    # ---------------- CAPE closure ------------------------------------
    karr1 = karr[:, 1:]
    span_c = ldcum[:, None] & (ktype == 1)[:, None] \
        & (karr1 <= kcbot[:, None]) & (karr1 > kctop[:, None])
    xro = pf[:, 1:nk] / (c.rgas * tf[:, 1:]
                         * (1.0 + c.ep1 * qf[:, 1:]))
    dzk = geof[:, :nk - 1] - geof[:, 1:nk]
    rheat = jnp.sum(jnp.where(
        span_c,
        ((t[:, :-1] - t[:, 1:] + dzk * c.rcpd) / tf[:, 1:]
         + c.ep1 * (q[:, :-1] - q[:, 1:]))
        * (c.egrav * (mfu[:, 1:] + mfd[:, 1:])) / xro, 0.0), axis=1)
    xcape = jnp.sum(jnp.where(
        span_c,
        ((tu[:, 1:] - tf[:, 1:]) / tf[:, 1:]
         + c.ep1 * (qu[:, 1:] - qf[:, 1:]) - lu[:, 1:]) * dzk,
        0.0), axis=1)
    xcape = jnp.clip(xcape, 0.0, 5000.0)
    rheat = jnp.maximum(1.0e-4, rheat)
    tau = (geof[ar, kctop] - geof[ar, kcbot]) \
        / ((2.0 + jnp.minimum(15.0, wmean)) * c.egrav) * rtau_s
    tau = jnp.clip(tau, 720.0, 10800.0)
    mfub1_deep = jnp.clip(xcape * mfub / (rheat * tau), 0.001,
                          mfmax_b)
    eps_d = jnp.where(mfd[ar, kcbot] < 0.0,
                      -mfd[ar, kcbot] / jnp.maximum(mfub, 1.0e-10),
                      0.0)
    qumqe2 = qu[ar, kcbot] + lu[ar, kcbot] - eps_d * qd[ar, kcbot] \
        - (1.0 - eps_d) * qf[ar, kcbot]
    dh2 = c.cpd * (tu[ar, kcbot] - eps_d * td[ar, kcbot]
                   - (1.0 - eps_d) * tf[ar, kcbot]) + c.wlhv * qumqe2
    dh2 = c.egrav * jnp.maximum(dh2, 1.0e5 * dqmin)
    mfub1_shal = jnp.where(dhpbl > 0.0,
                           jnp.minimum(dhpbl / dh2, mfmax_b), mfub)
    # ktype=3: mfub1 = mfub*(1+eps) capped (:4929-4932)
    mfub1_mid = jnp.minimum(mfub * (1.0 + eps_d), mfmax_b)
    mfub1 = jnp.where(ktype == 1, mfub1_deep,
                      jnp.where(ktype == 2, mfub1_shal,
                                jnp.where(ktype == 3, mfub1_mid,
                                          mfub)))
    mfub1 = jnp.where(ldcum, mfub1, 0.0)
    # rescale downdraft fluxes
    facd = jnp.where(lddraf & (ktype != 3),
                     mfub1 / jnp.maximum(mfub, 1.0e-10), 1.0)[:, None]
    mfd = mfd * facd
    mfds = mfds * facd
    mfdq = mfdq * facd
    dmfdp = dmfdp * facd
    mfdde_rate = mfdde_rate * facd
    # updraft scaling (with CFL cap)
    mfs = jnp.where(ldcum, mfub1 / jnp.maximum(CMFCMIN, mfub), 1.0)
    # running min over span ≡ min of the per-level CFL ratios
    inspan_s = ldcum[:, None] & (karr1 >= kctop[:, None] - 1)
    mfmaxk = (pf[:, 1:nk] - pf[:, :nk - 1]) * cons2 * RMFLIC + RMFLIA
    ratios = jnp.where(inspan_s,
                       mfmaxk / jnp.maximum(mfu[:, 1:], CMFCMIN),
                       jnp.inf)
    mfs = jnp.minimum(mfs, ratios.min(axis=1))
    span_u = ldcum[:, None] & (karr <= kcbot[:, None]) \
        & (karr >= kctop[:, None] - 1)
    scale = jnp.where(span_u, mfs[:, None], 1.0)
    mfu = mfu * scale
    mfus = mfus * scale
    mfuq = mfuq * scale
    mful = mful * scale
    dmfup = dmfup * scale
    lude = lude * scale
    mfude_rate = mfude_rate * scale

    # drop downdrafts above cloud top
    idtop = jnp.where(lddraf & (idtop <= kctop), kctop + 1, idtop)
    above_dd = karr < idtop[:, None]
    mfd = jnp.where(above_dd, 0.0, mfd)
    mfds = jnp.where(above_dd, 0.0, mfds)
    mfdq = jnp.where(above_dd, 0.0, mfdq)
    mfdde_rate = jnp.where(karr <= idtop[:, None], 0.0, mfdde_rate)
    dmfdp = jnp.where(above_dd, 0.0, dmfdp)

    # ---------------- cfluxes (:6840) ---------------------------------
    rhebc = jnp.full(npx, RHEBC)
    mflxr = jnp.zeros((npx, nk + 1))
    mflxs = jnp.zeros((npx, nk + 1))
    dpmel = jnp.zeros_like(t)
    incloud = ldcum[:, None] & (karr >= kctop[:, None])
    mfus = jnp.where(incloud,
                     mfus - mfu * (c.cpd * tf + geof[:, :nk]), 0.0)
    mfuq = jnp.where(incloud, mfuq - mfu * qf, 0.0)
    lglac = jnp.where(incloud, mfu * lglac, 0.0)
    dd_act = lddraf[:, None] & (karr >= idtop[:, None])
    mfds = jnp.where(incloud & dd_act,
                     mfds - mfd * (c.cpd * tf + geof[:, :nk]), 0.0)
    mfdq = jnp.where(incloud & dd_act, mfdq - mfd * qf, 0.0)
    mfd = jnp.where(incloud & dd_act, mfd, 0.0)
    mfu = jnp.where(incloud, mfu, 0.0)
    mful = jnp.where(incloud, mful, 0.0)
    dmfup = jnp.where(incloud, dmfup, 0.0)
    dmfdp = jnp.where(incloud & dd_act, dmfdp, 0.0)
    lude = jnp.where(
        ldcum[:, None] & (karr >= kctop[:, None] - 1), lude, 0.0)

    # below-cloud linear decrease of updraft fluxes
    ikb = kcbot
    # composite linear decrease (:6917-6941): the two reference
    # stages (kcbot→kcbot+1 then scaling from kcbot+1) telescope to
    # (psfc − pf(k)) / (psfc − pf(kcbot))
    zp_num = pf[:, nk][:, None] - pf[:, :nk]
    zp_den = pf[ar, nk] - pf[ar, ikb]
    zp = zp_num / jnp.maximum(zp_den, 1.0)[:, None]
    belowb = ldcum[:, None] & (karr > ikb[:, None])
    mfu_ikb1 = mfu[ar, ikb][:, None]
    mfus_ikb1 = (mfus[ar, ikb]
                 - mlw(tf[ar, ikb]) * mful[ar, ikb])[:, None]
    mfuq_ikb1 = (mfuq[ar, ikb] + mful[ar, ikb])[:, None]
    mfu = jnp.where(belowb, mfu_ikb1 * zp, mfu)
    mfus = jnp.where(belowb, mfus_ikb1 * zp, mfus)
    mfuq = jnp.where(belowb, mfuq_ikb1 * zp, mfuq)
    mful = jnp.where(belowb, 0.0, mful)

    # rain/snow fluxes with melting + evaporation below cloud base
    rain = jnp.sum(dmfup, axis=1)
    cons1a = c.cpd / (c.wlhf * c.egrav * RTAUMEL)

    def _rain_body(carry, k):
        (mflxr, mflxs, dpmel, lglac, dmfup) = carry
        span = ldcum & (k >= kctop - 1)
        dpk_ = pf[:, k + 1] - pf[:, k]
        cons1 = cons1a * (1.0 + 0.5 * (t[:, k] - c.tzero))
        fac = cons1 * dpk_
        snmlt = jnp.where(span & (mflxs[:, k] > 0.0)
                          & (t[:, k] > c.tzero),
                          jnp.minimum(mflxs[:, k],
                                      fac * (t[:, k] - c.tzero)), 0.0)
        dpmel = dpmel.at[:, k].set(snmlt)
        alfaw = xalpha(t[:, k])
        frz = span & (t[:, k] < c.tzero) & (alfaw > 0.0)
        lglac = lglac.at[:, k].add(
            jnp.where(frz, alfaw * (dmfup[:, k] + dmfdp[:, k]), 0.0))
        alfaw = jnp.where(frz, 0.0, alfaw)
        add = dmfup[:, k] + dmfdp[:, k]
        r_next = mflxr[:, k] + jnp.where(span,
                                         alfaw * add + snmlt, 0.0)
        s_next = mflxs[:, k] + jnp.where(span, (1.0 - alfaw) * add
                                         - snmlt, 0.0)
        tot = r_next + s_next
        r_next = jnp.where(tot < 0.0, 0.0,
                           jnp.where(r_next < 0.0, 0.0,
                                     jnp.where(s_next < 0.0,
                                               tot, r_next)))
        s_next = jnp.where(tot < 0.0, 0.0,
                           jnp.where(s_next < 0.0, 0.0,
                                     jnp.where(mflxr[:, k] + alfaw
                                               * add + snmlt < 0.0,
                                               tot, s_next)))
        # below-base evaporation (Kessler-type)
        below = ldcum & (k >= kcbot)
        xrfl = r_next + s_next
        drfl1 = RCPEC * jnp.maximum(0.0, qs[:, k] - q[:, k]) * RCUC \
            * (jnp.sqrt(pf[:, k] / pf[:, nk]) / 5.09e-3
               * jnp.maximum(xrfl, 1e-20) / RCUC) ** 0.5777 * dpk_
        rnew = xrfl - drfl1
        rmin = xrfl - RCUC * jnp.maximum(
            0.0, rhebc * qs[:, k] - q[:, k]) * cons2 * dpk_
        xrfln = jnp.maximum(jnp.maximum(rnew, rmin), 0.0)
        drfl = jnp.minimum(0.0, xrfln - xrfl)
        frac_r = r_next / jnp.maximum(xrfl, 1e-20)
        ev_ok = below & (xrfl > 1e-20)
        r_next = jnp.where(ev_ok, r_next + drfl * frac_r, r_next)
        s_next = jnp.where(ev_ok, s_next + drfl * (1.0 - frac_r),
                           s_next)
        dmfup = dmfup.at[:, k].add(jnp.where(ev_ok, drfl, 0.0))
        mflxr = mflxr.at[:, k + 1].set(jnp.maximum(r_next, 0.0))
        mflxs = mflxs.at[:, k + 1].set(jnp.maximum(s_next, 0.0))
        return (mflxr, mflxs, dpmel, lglac, dmfup), None

    carry3 = (mflxr, mflxs, dpmel, lglac, dmfup)
    carry3, _ = jax.lax.scan(_rain_body, carry3,
                             jnp.arange(1, nk, dtype=jnp.int32))
    (mflxr, mflxs, dpmel, lglac, dmfup) = carry3

    # ---------------- dtdqc: implicit T/q update (:6521) --------------
    dp_g = c.egrav / (pf[:, 1:] - pf[:, :-1])
    lude_t = lude                       # lepcld: keep detrained water
    # recompute draught perturbation fluxes for the implicit solve
    inspan2 = ldcum[:, None] & (karr1 >= kctop[:, None] - 1)
    gq2 = (qf[:, 1:] - q[:, :-1]) / jnp.maximum(qs[:, 1:], 1e-10)
    gh2 = c.cpd * t[:, 1:] + geo[:, 1:]
    gs2 = (c.cpd * (tf[:, 1:] - t[:, :-1])
           + geof[:, 1:nk] - geo[:, :-1]) / gh2
    # ximp = 0: zs = cpd·gs·t(k) + geo(k-1) + gs·geo(k) (:6580)
    zs2 = c.cpd * gs2 * t[:, 1:] + geo[:, :-1] + gs2 * geo[:, 1:]
    zq2 = gq2 * qs[:, 1:]
    dd2 = lddraf[:, None] & (karr1 >= idtop[:, None])
    xmfus = mfus.at[:, 1:].set(jnp.where(
        inspan2, mfus[:, 1:] - mfu[:, 1:] * zs2, mfus[:, 1:]))
    xmfuq = mfuq.at[:, 1:].set(jnp.where(
        inspan2, mfuq[:, 1:] - mfu[:, 1:] * zq2, mfuq[:, 1:]))
    xmfds = mfds.at[:, 1:].set(jnp.where(
        inspan2 & dd2, mfds[:, 1:] - mfd[:, 1:] * zs2, mfds[:, 1:]))
    xmfdq = mfdq.at[:, 1:].set(jnp.where(
        inspan2 & dd2, mfdq[:, 1:] - mfd[:, 1:] * zq2, mfdq[:, 1:]))

    pad = lambda a: jnp.concatenate(
        [a, jnp.zeros((npx, 1), a.dtype)], axis=1)
    xmfus_p = pad(xmfus)
    xmfuq_p = pad(xmfuq)
    xmfds_p = pad(xmfds)
    xmfdq_p = pad(xmfdq)
    mful_p = pad(mful)
    xalv = mlw(t)
    dtdt = dp_g * c.rcpd * (
        xmfus_p[:, 1:] - xmfus + xmfds_p[:, 1:] - xmfds
        + c.wlhf * lglac - c.wlhf * dpmel
        - xalv * (mful_p[:, 1:] - mful - lude_t - dmfup))
    dqdt = dp_g * (xmfuq_p[:, 1:] - xmfuq + xmfdq_p[:, 1:] - xmfdq
                   + mful_p[:, 1:] - mful - lude_t - dmfup)
    # surface layer (k=nk-1): no inflow from below
    dtdt = dtdt.at[:, nk - 1].set(
        -dp_g[:, nk - 1] * c.rcpd
        * (xmfus[:, nk - 1] + xmfds[:, nk - 1]
           + c.wlhf * dpmel[:, nk - 1]
           - xalv[:, nk - 1] * (mful[:, nk - 1] + dmfup[:, nk - 1])))
    dqdt = dqdt.at[:, nk - 1].set(
        -dp_g[:, nk - 1] * (xmfuq[:, nk - 1] + xmfdq[:, nk - 1]
                            + mful[:, nk - 1] + dmfup[:, nk - 1]))

    # implicit bidiagonal solve (rmfsoltq=1; solver :5611)
    cummask = ldcum[:, None] & (karr >= kctop[:, None] - 1)
    zp = RMFSOLTQ * dp_g * dt
    aa = jnp.where(cummask, -zp * (mfu + mfd), 0.0)
    mf_p = pad(mfu + mfd)
    bbst = jnp.where(cummask, 1.0 + zp * mf_p[:, 1:], 1.0)
    bbst = bbst.at[:, nk - 1].set(jnp.where(cummask[:, nk - 1], 1.0,
                                            1.0))
    rhs_t = jnp.where(cummask, dtdt * dt + t, t)
    rhs_q = jnp.where(cummask, dqdt * dt + q, q)
    def _bidiag(aa_m, bb_m, rhs_a, rhs_b, mask):
        """Forward bidiagonal substitution (solver, :5611) for two
        right-hand sides at once, top row at kctop-1."""
        def body(carry, k):
            r1p, r2p = carry
            attop = k == kctop - 1
            solv = mask[:, k] & (jnp.abs(bb_m[:, k]) > 1e-30)
            r1k = jnp.where(attop, rhs_a[:, k] / bb_m[:, k],
                            (rhs_a[:, k] - aa_m[:, k] * r1p)
                            / bb_m[:, k])
            r2k = jnp.where(attop, rhs_b[:, k] / bb_m[:, k],
                            (rhs_b[:, k] - aa_m[:, k] * r2p)
                            / bb_m[:, k])
            r1k = jnp.where(solv, r1k, 0.0)
            r2k = jnp.where(solv, r2k, 0.0)
            return (r1k, r2k), (r1k, r2k)

        z = jnp.zeros(npx, t.dtype)
        _, (ys1, ys2) = jax.lax.scan(
            body, (z, z), jnp.arange(nk, dtype=jnp.int32))
        return ys1.T, ys2.T

    r1, r2 = _bidiag(aa, bbst, rhs_t, rhs_q, cummask)
    tten = jnp.where(cummask, (r1 - t) * rdt, 0.0)
    qten = jnp.where(cummask, (r2 - q) * rdt, 0.0)

    # ---------------- section 9: draught momentum (:5175-5280) --------
    RUVPER = 0.3
    # updraft winds: initialize at cloud base from the level above the
    # departure level, then evolve upward with enhanced entrainment
    def _uwind_body(carry, k):
        uu, vu = carry
        atbase = ldcum & (k == kcbot)
        uu = uu.at[:, k].set(jnp.where(atbase, u[ar, idpl - 1],
                                       uu[:, k]))
        vu = vu.at[:, k].set(jnp.where(atbase, v[ar, idpl - 1],
                                       vu[:, k]))
        inup = ldcum & (k < kcbot) & (k >= kctop)
        fac = jnp.where(ktype == 1, 2.0, 0.0)
        fac = jnp.where((ktype == 1) & (k <= kctop + 2), 3.0, fac)
        erate = mfu[:, k] - mfu[:, k + 1] \
            + (1.0 + fac) * mfude_rate[:, k]
        derate = (1.0 + fac) * mfude_rate[:, k]
        mfa = 1.0 / jnp.maximum(CMFCMIN, mfu[:, k])
        uu = uu.at[:, k].set(jnp.where(
            inup, (uu[:, k + 1] * mfu[:, k + 1] + erate * u[:, k]
                   - derate * uu[:, k + 1]) * mfa, uu[:, k]))
        vu = vu.at[:, k].set(jnp.where(
            inup, (vu[:, k + 1] * mfu[:, k + 1] + erate * v[:, k]
                   - derate * vu[:, k + 1]) * mfa, vu[:, k]))
        return (uu, vu), None

    (uu, vu), _ = jax.lax.scan(
        _uwind_body, (uu, vu),
        jnp.arange(nk - 2, 0, -1, dtype=jnp.int32))

    # downdraft winds from the LFS downward
    def _dwind_body(carry, k):
        ud, vd = carry
        attop = ldcum & (k == idtop)
        ud = ud.at[:, k].set(jnp.where(
            attop, 0.5 * (uu[:, k] + u[:, k - 1]), ud[:, k]))
        vd = vd.at[:, k].set(jnp.where(
            attop, 0.5 * (vu[:, k] + v[:, k - 1]), vd[:, k]))
        indn = ldcum & (k > idtop)
        erate = -mfd[:, k] + mfd[:, k - 1] + mfdde_rate[:, k]
        mfa = 1.0 / jnp.minimum(-CMFCMIN, mfd[:, k])
        ud = ud.at[:, k].set(jnp.where(
            indn, (ud[:, k - 1] * mfd[:, k - 1] - erate * u[:, k - 1]
                   + mfdde_rate[:, k] * ud[:, k - 1]) * mfa,
            ud[:, k]))
        vd = vd.at[:, k].set(jnp.where(
            indn, (vd[:, k - 1] * mfd[:, k - 1] - erate * v[:, k - 1]
                   + mfdde_rate[:, k] * vd[:, k - 1]) * mfa,
            vd[:, k]))
        return (ud, vd), None

    (ud, vd), _ = jax.lax.scan(
        _dwind_body, (ud, vd), jnp.arange(2, nk, dtype=jnp.int32))

    # CFL rescale of the momentum-transporting fluxes (:5227-5248;
    # mfmax here uses cons without the rmfcfl factor)
    lim9 = ldcum[:, None] & (karr1 >= kctop[:, None])
    mfmax9 = (pf[:, 1:nk] - pf[:, :nk - 1]) * cons
    mfs2 = jnp.minimum(1.0, jnp.where(
        lim9 & (mfu[:, 1:] > mfmax9),
        mfmax9 / jnp.maximum(mfu[:, 1:], CMFCMIN),
        jnp.inf).min(axis=1))
    span9 = ldcum[:, None] & (karr >= kctop[:, None] - 1)
    mfuus = jnp.where(span9, mfu * mfs2[:, None], mfu)
    mfdus = jnp.where(span9, mfd * mfs2[:, None], mfd)
    # implicit (rmfsoluv=1): linear sub-cloud draught profiles (:5251)
    mfuub = mfuus[ar, kcbot] * (uu[ar, kcbot] - u[ar, kcbot - 1])
    mfuvb = mfuus[ar, kcbot] * (vu[ar, kcbot] - v[ar, kcbot - 1])
    below9 = ldcum[:, None] & (karr1 > kcbot[:, None])
    zp9l = (pf[:, nk][:, None] - pf[:, 1:nk]) \
        / jnp.maximum(pf[:, nk] - pf[ar, kcbot], 1.0)[:, None]
    mfa9 = 1.0 / jnp.maximum(CMFCMIN, mfuus[:, 1:])
    um1 = u[:, :-1]
    vm1 = v[:, :-1]
    uu = uu.at[:, 1:].set(jnp.where(
        below9, um1 + mfuub[:, None] * zp9l * mfa9, uu[:, 1:]))
    vu = vu.at[:, 1:].set(jnp.where(
        below9, vm1 + mfuvb[:, None] * zp9l * mfa9, vu[:, 1:]))
    mfdus = mfdus.at[:, 1:].set(jnp.where(
        below9, mfdus[ar, kcbot][:, None] * zp9l, mfdus[:, 1:]))
    ud = ud.at[:, 1:].set(jnp.where(
        below9, um1 + (ud[ar, kcbot] - u[ar, kcbot - 1])[:, None],
        ud[:, 1:]))
    vd = vd.at[:, 1:].set(jnp.where(
        below9, vm1 + (vd[ar, kcbot] - v[ar, kcbot - 1])[:, None],
        vd[:, 1:]))
    pert9 = ldcum[:, None] & (karr1 >= kctop[:, None])
    uu = uu.at[:, 1:].set(jnp.where(
        pert9, uu[:, 1:] - RUVPER * jnp.sign(uu[:, 1:]), uu[:, 1:]))
    vu = vu.at[:, 1:].set(jnp.where(
        pert9, vu[:, 1:] - RUVPER * jnp.sign(vu[:, 1:]), vu[:, 1:]))

    # ---------------- dudvx (:6694): implicit momentum update ---------
    uen = u
    ven = v
    mfuu = jnp.where(cummask, mfuus * uu, 0.0)     # ximp = 0
    mfuv = jnp.where(cummask, mfuus * vu, 0.0)
    mfdu = jnp.where(cummask, mfdus * ud, 0.0)
    mfdv = jnp.where(cummask, mfdus * vd, 0.0)
    mfuu_p = pad(mfuu)
    mfuv_p = pad(mfuv)
    mfdu_p = pad(mfdu)
    mfdv_p = pad(mfdv)
    dudt = dp_g * (mfuu_p[:, 1:] - mfuu + mfdu_p[:, 1:] - mfdu)
    dvdt = dp_g * (mfuv_p[:, 1:] - mfuv + mfdv_p[:, 1:] - mfdv)
    dudt = dudt.at[:, nk - 1].set(
        -dp_g[:, nk - 1] * (mfuu[:, nk - 1] + mfdu[:, nk - 1]))
    dvdt = dvdt.at[:, nk - 1].set(
        -dp_g[:, nk - 1] * (mfuv[:, nk - 1] + mfdv[:, nk - 1]))
    zp9 = RMFSOLUV * dp_g * dt
    aa9 = jnp.where(cummask, -zp9 * (mfuus + mfdus), 0.0)
    mf9p = pad(mfuus + mfdus)
    bb9 = jnp.where(cummask, 1.0 + zp9 * mf9p[:, 1:], 1.0)
    bb9 = bb9.at[:, nk - 1].set(jnp.where(cummask[:, nk - 1], 1.0,
                                          bb9[:, nk - 1]))
    rhs_u = jnp.where(cummask, dudt * dt + u, u)
    rhs_v = jnp.where(cummask, dvdt * dt + v, v)
    r1u, r2v = _bidiag(aa9, bb9, rhs_u, rhs_v, cummask)
    uten = jnp.where(cummask, (r1u - u) * rdt, 0.0)
    vten = jnp.where(cummask, (r2v - v) * rdt, 0.0)
    # KE dissipation heating (lmfuvdis, :5288-5315)
    dzp = pf[:, 1:] - pf[:, :-1]
    uv2 = jnp.where(cummask, jnp.sqrt(uten ** 2 + vten ** 2), 0.0)
    xsum22 = jnp.sum(uv2 * dzp, axis=1)
    xsum12 = -jnp.sum(jnp.where(cummask,
                                (u * uten + v * vten) * dzp, 0.0),
                      axis=1)
    tdis = c.rcpd * xsum12[:, None] * uv2 \
        / jnp.maximum(1e-15, xsum22)[:, None]
    tten = tten + jnp.where(cummask, tdis, 0.0)

    # detrained condensate tendencies + cloud fraction ----------------
    tenl = lude * c.egrav / (pf[:, 1:] - pf[:, :-1])
    teni = (1.0 - xalpha(t)) * tenl
    tenl = tenl - teni
    qdetr = lude * dt * c.egrav / (pf[:, 1:] - pf[:, :-1])
    # prsfc = mflxr(nk+1): the driver's 1e3 undoes the scheme's 1e-3
    # (cucall :718-719 vs :5508-5515) → kg/m²/s net
    prate = jnp.where(ldcum & (ktype > 0),
                      mflxr[:, nk] + mflxs[:, nk], 0.0)
    raincc = mflxr[:, :nk] * 1.0e-3     # cu_raincc parity (m/s)
    # Xu & Krueger 1991 cloud fraction (tiedtkedrv :458-485;
    # defaults mod_params.F90:339-341)
    kfac_deep, kfac_shal, k2c = 0.14, 0.07, 500.0
    inspan2 = ldcum[:, None] & (karr >= kctop[:, None]) \
        & (karr <= kcbot[:, None])
    cf_deep = jnp.clip(kfac_deep * jnp.log1p(k2c * mfu), 0.01, 0.6)
    cf_shal = jnp.clip(kfac_shal * jnp.log1p(k2c * mfu), 0.01, 0.2)
    cf_mid = jnp.clip(0.5 * (kfac_deep + kfac_shal)
                      * jnp.log1p(k2c * mfu), 0.01, 0.4)
    cldfra = jnp.where(
        inspan2,
        jnp.where((ktype == 1)[:, None], cf_deep,
                  jnp.where((ktype == 2)[:, None], cf_shal,
                            cf_mid)), 0.0)
    # section 11 (:5344-5380): CFL-rescale the fluxes for tracer
    # transport (tighter 0.8·cons cap, rmfsolct ≤ 3)
    ct_ldcum = ldcum & (ktype != 3) & (kcbot - kctop >= 1)
    lim11 = ct_ldcum[:, None] & (karr1 >= kctop[:, None])
    mfmax11 = (pf[:, 1:nk] - pf[:, :nk - 1]) * 0.8 * cons
    mfs11 = jnp.minimum(1.0, jnp.where(
        lim11 & (mfu[:, 1:] > mfmax11),
        mfmax11 / jnp.maximum(mfu[:, 1:], CMFCMIN),
        jnp.inf).min(axis=1))
    span11u = ct_ldcum[:, None] & (karr >= kctop[:, None] - 1)
    ct_lddraf = lddraf & ct_ldcum
    span11d = ct_lddraf[:, None] & (karr >= idtop[:, None] - 1)
    ct_mfu = jnp.where(span11u, mfu * mfs11[:, None], 0.0)
    ct_udrate = jnp.where(span11u, mfude_rate * mfs11[:, None], 0.0)
    ct_mfd = jnp.where(span11d, mfd * mfs11[:, None], 0.0)
    ct_ddrate = jnp.where(span11d, mfdde_rate * mfs11[:, None], 0.0)

    if lmfsmooth:
        # smoothing of tracer-transport mass fluxes at draught edges
        # (:5387-5417)
        attop = ct_ldcum[:, None] & (karr == kctop[:, None]) \
            & (karr >= 1) & (karr <= nk - 2)
        mfu_p1 = jnp.concatenate([ct_mfu[:, 1:], ct_mfu[:, -1:]],
                                 axis=1)
        erate_u = jnp.maximum(0.0, ct_mfu - 0.5 * mfu_p1)
        new_mfu = jnp.where(attop, ct_mfu - erate_u, ct_mfu)
        ct_udrate = jnp.where(attop, ct_udrate + erate_u, ct_udrate)
        # mfudr(kctop-1) = smoothed mfuus(kctop)
        wrt = jnp.concatenate([attop[:, 1:],
                               jnp.zeros_like(attop[:, :1])], axis=1)
        val = jnp.concatenate([new_mfu[:, 1:], new_mfu[:, -1:]],
                              axis=1)
        ct_udrate = jnp.where(wrt, val, ct_udrate)
        ct_mfu = new_mfu
        m_p1 = jnp.concatenate(
            [ct_mfd[:, 1:], jnp.zeros_like(ct_mfd[:, :1])], axis=1)
        m_m1 = jnp.concatenate(
            [jnp.zeros_like(ct_mfd[:, :1]), ct_mfd[:, :-1]], axis=1)
        dcond = ct_lddraf[:, None] & (ct_mfd < 0.0) \
            & (jnp.abs(m_p1) < 1e-30) & (karr >= 1) \
            & (karr <= nk - 2)
        erate_d = jnp.minimum(0.0, ct_mfd - 0.5 * m_m1)
        new_mfd = jnp.where(dcond, ct_mfd - erate_d, ct_mfd)
        ct_ddrate = jnp.where(dcond, ct_ddrate - erate_d, ct_ddrate)
        # mfddr(k+1) = -smoothed mfdus(k)
        wrtd = jnp.concatenate(
            [jnp.zeros_like(dcond[:, :1]), dcond[:, :-1]], axis=1)
        vald = jnp.concatenate(
            [jnp.zeros_like(new_mfd[:, :1]), -new_mfd[:, :-1]],
            axis=1)
        ct_ddrate = jnp.where(wrtd, vald, ct_ddrate)
        ct_mfd = new_mfd
        udr_m1 = jnp.concatenate(
            [jnp.zeros_like(ct_udrate[:, :1]), ct_udrate[:, :-1]],
            axis=1)
        fill = ct_ldcum[:, None] & (jnp.abs(ct_udrate) < 1e-30) \
            & (udr_m1 > 0.0) & (karr >= 1) & (karr <= nk - 2)
        ct_udrate = jnp.where(fill, 0.5 * udr_m1, ct_udrate)

    z = jnp.where(ldcum[:, None], 1.0, 0.0)
    return TiedtkeOut(tten=tten * z, qten=qten * z, lten=tenl * z,
                      iten=teni * z, uten=uten * z, vten=vten * z,
                      prate=prate, qdetr=qdetr * z, raincc=raincc,
                      cldfra=cldfra,
                      ktype=ktype, kctop=kctop, kcbot=kcbot,
                      ct_mfu=ct_mfu, ct_mfd=ct_mfd,
                      ct_udrate=ct_udrate, ct_ddrate=ct_ddrate,
                      ct_ldcum=ct_ldcum, ct_lddraf=ct_lddraf,
                      idtop=idtop)


def ctracer(qtrac, out: TiedtkeOut, pf, dt):
    """Convective tracer transport (ctracer, :7549-7707): updraft and
    downdraft tracer profiles from the CFL-rescaled mass fluxes, then
    an implicit bidiagonal update (rmfsolct=1).

    qtrac (np, nk, ntr) uncoupled mixing ratios; returns the tracer
    tendency (np, nk, ntr). Applied only on syncro_cum steps by the
    caller — exactly the reference's impulse semantics (tenc is
    written straight into the chem tendency array on alarm steps)."""
    npx, nk, ntrc = qtrac.shape
    mfu = out.ct_mfu
    mfd = out.ct_mfd
    udrate = out.ct_udrate
    ddrate = out.ct_ddrate
    ldcum = out.ct_ldcum
    lddraf = out.ct_lddraf
    kctop = out.kctop
    idtop = out.idtop
    karr = jnp.arange(nk)[None, :]
    ar = jnp.arange(npx)
    rdt = 1.0 / dt
    dp_g = c.egrav / (pf[:, 1:] - pf[:, :-1])
    cumask = ldcum[:, None] & (karr >= kctop[:, None] - 1) \
        & (karr >= 1)

    # 2. updraft values (:7559-7572), sequential upward
    cu = jnp.zeros_like(qtrac)
    cu = cu.at[:, nk - 1].set(qtrac[:, nk - 1])

    def _cu_body(cu, k):
        erate = (mfu[:, k] - mfu[:, k + 1] + udrate[:, k])[:, None]
        mfa = (1.0 / jnp.maximum(CMFCMIN, mfu[:, k]))[:, None]
        upd = (cumask[:, k] & (k >= kctop))[:, None]
        val = (mfu[:, k + 1][:, None] * cu[:, k + 1]
               + erate * qtrac[:, k]
               - udrate[:, k][:, None] * cu[:, k + 1]) * mfa
        return cu.at[:, k].set(jnp.where(upd, val, cu[:, k])), None

    cu, _ = jax.lax.scan(_cu_body, cu,
                         jnp.arange(nk - 2, 1, -1, dtype=jnp.int32))

    # 3. downdraft values (:7576-7592), sequential downward
    cd = jnp.zeros_like(qtrac)

    def _cd_body(cd, k):
        attop = (lddraf & (k == idtop))[:, None]
        cd_top = 0.1 * cu[:, k] + 0.9 * qtrac[:, k - 1]
        erate = (-mfd[:, k] + mfd[:, k - 1] + ddrate[:, k])[:, None]
        mfa = (1.0 / jnp.minimum(-CMFCMIN, mfd[:, k]))[:, None]
        indn = (lddraf & (k > idtop))[:, None]
        val = (mfd[:, k - 1][:, None] * cd[:, k - 1]
               - erate * qtrac[:, k - 1]
               + ddrate[:, k][:, None] * cd[:, k - 1]) * mfa
        cdk = jnp.where(attop, cd_top, jnp.where(indn, val, cd[:, k]))
        return cd.at[:, k].set(cdk), None

    cd, _ = jax.lax.scan(_cd_body, cd,
                         jnp.arange(2, nk, dtype=jnp.int32))

    # surface positivity guard (:7595-7608)
    ks = nk - 1
    posi = -dp_g[:, ks][:, None] * (
        mfu[:, ks][:, None] * cu[:, ks]
        + mfd[:, ks][:, None] * cd[:, ks]
        - (mfu[:, ks] + mfd[:, ks])[:, None] * qtrac[:, ks - 1])
    neg = lddraf[:, None] & (qtrac[:, ks] + posi * dt < 0.0)
    mfa_s = (1.0 / jnp.minimum(-CMFCMIN, mfd[:, ks]))[:, None]
    cd_fix = ((mfu[:, ks] + mfd[:, ks])[:, None] * qtrac[:, ks - 1]
              - mfu[:, ks][:, None] * cu[:, ks]
              + qtrac[:, ks] / (dt * dp_g[:, ks][:, None])) * mfa_s
    cd = cd.at[:, ks].set(jnp.where(neg, cd_fix, cd[:, ks]))

    # 4-5. fluxes and explicit divergence (ximp = 0, :7612-7638)
    mfc = jnp.where(cumask[:, :, None],
                    mfu[:, :, None] * cu + mfd[:, :, None] * cd, 0.0)
    mfc_p = jnp.concatenate(
        [mfc, jnp.zeros((npx, 1, ntrc), mfc.dtype)], axis=1)
    xtenc = jnp.where(cumask[:, :, None],
                      dp_g[:, :, None] * (mfc_p[:, 1:] - mfc), 0.0)
    xtenc = xtenc.at[:, nk - 1].set(jnp.where(
        ldcum[:, None], -dp_g[:, nk - 1][:, None] * mfc[:, nk - 1],
        0.0))

    # 7. implicit bidiagonal solve (rmfsolct=1, :7656-7695)
    zp = dp_g * dt
    aa = jnp.where(cumask, -zp * (mfu + mfd), 0.0)
    mf_p = jnp.concatenate(
        [mfu + mfd, jnp.zeros((npx, 1), mfu.dtype)], axis=1)
    bb = jnp.where(cumask, 1.0 + zp * mf_p[:, 1:], 1.0)
    bb = bb.at[:, nk - 1].set(jnp.where(cumask[:, nk - 1], 1.0,
                                        bb[:, nk - 1]))
    rhs = jnp.where(cumask[:, :, None], xtenc * dt + qtrac, qtrac)

    def _solve_body(rp, k):
        attop = (k == kctop - 1)[:, None]
        solv = (cumask[:, k] & (jnp.abs(bb[:, k]) > 1e-30))[:, None]
        rk = jnp.where(attop, rhs[:, k] / bb[:, k][:, None],
                       (rhs[:, k] - aa[:, k][:, None] * rp)
                       / bb[:, k][:, None])
        rk = jnp.where(solv, rk, 0.0)
        return rk, rk

    _, rys = jax.lax.scan(_solve_body,
                          jnp.zeros((npx, ntrc), qtrac.dtype),
                          jnp.arange(nk, dtype=jnp.int32))
    r1 = jnp.moveaxis(rys, 0, 1)
    return jnp.where(cumask[:, :, None], (r1 - qtrac) * rdt, 0.0)
