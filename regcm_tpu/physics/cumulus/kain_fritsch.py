"""Kain-Fritsch mass-flux cumulus convection (icup=6).

TPU re-derivation of ``Main/cumlib/mod_cu_kf.F90`` (the WRF kfeta
scheme adapted to RegCM; driver ``kfdrv`` :167, column ``kfpara``
:344, lookup tables ``kf_lutab`` :2439, with internal ``tpmix2``
:2095, ``dtfrznew`` :2196, ``condload`` :2246, ``prof5`` :2322,
``tpmix2dd`` :2357, ``envirtht`` :2404).  kf_trigger = 3 (Ma-Tan/
Narita-Ohmori RH perturbation) exactly as the reference hardcodes.

Structure mapping (per-point Fortran → dense TPU):
- the sequential updraft-source-layer search (``usl:`` loop, one
  candidate at a time, first-deep-wins with a shallow fallback)
  becomes a PARALLEL candidate axis: updrafts for all ~20 candidate
  source layers are computed at once and the winner selected by mask
  (first deep, else the deepest shallow — ``fbfrc`` only affects the
  feedback stage, so no recompute is needed);
- level recursions (updraft ascent, downdraft descent, theta-e
  dilution) are ``lax.scan``s; the 10-iteration CAPE closure is a
  ``lax.fori_loop`` with per-column convergence masking; the
  compensational-subsidence upstream advection runs a masked scan of
  NSTEPMAX sub-CFL steps (the reference's data-dependent ``nstep``);
- the saturation-point lookup tables are generated at config time in
  NumPy (vectorized secant iteration) and interpolated with gathers.

Internal layout: (ncol, nk) with nk=0 at the SURFACE (the scheme's
native bottom-up order); the suite wrapper flips the model's
top-down fields.

Documented deviations: the reference's mass-imbalance diagnostic
prints + fatal aborts are replaced by finite/budget tests; the qg<0
moisture borrowing applies without the stderr warning.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import constants as c

# Buck (1981) saturation constants (mod_constants.F90:327-336)
ALIQ, BLIQ, CLIQ, DLIQ = 613.3, 17.502, 4780.8, 32.19
XLV0, XLV1 = 3.15e6, 2370.0
C1, C2, C4 = 3374.6525, 2.5403, 0.810
P00 = 1.0e5
EP2 = c.ep2 if hasattr(c, "ep2") else 0.62197058
EP1 = 0.6077338
GDRY = -c.egrav / c.cpd
TTFRZ = c.tzero - 5.0
TBFRZ = c.tzero - 25.0
DPMIN = 5.0e3
ASTRT, AINCB = 1.0e-3, 0.025
KFNT, KFNP, KFNA = 500, 440, 600
NCAND = 20          # 15 hPa USL candidates to p_sfc - 300 hPa
NSTEPMAX = 100      # sub-CFL advection substeps bound
MAXITER = 10


class KFParams(NamedTuple):
    """kfparam namelist (Main/mod_params.F90:463-471) + cloud-fraction
    constants (:339-341)."""
    entrate: float = 0.03
    convrate: float = 0.03
    min_pef: float = 0.2
    max_pef: float = 0.9
    dpp: float = 150.0
    min_dtcape: float = 1800.0
    max_dtcape: float = 3600.0
    tkemax: float = 5.0
    wthreshold: float = 0.02
    k2_const: float = 500.0
    kfac_shal: float = 0.07
    kfac_deep: float = 0.14


def _thes(t, p, qs):
    """Saturated equivalent potential temperature, Bolton form used
    throughout the scheme."""
    pi = (P00 / p) ** (0.2854 * (1.0 - 0.28 * qs))
    return t * pi * np.exp((C1 / t - C2) * qs * (1.0 + C4 * qs))


def kf_lutab(ptop_pa: float):
    """Saturation-point lookup tables (kf_lutab, :2439-2528):
    ttab/qstab (KFNT, KFNP) of T and qs vs (theta_es, p), the0k base
    theta_es per pressure, alu log table.  Vectorized secant
    iteration over all pressures at once."""
    tmin, pbot, dth = 150.0, 1.1e5, 0.5
    plutop = max(ptop_pa, 5000.0)
    dpr = (pbot - plutop) / (KFNP - 1)
    p = plutop + dpr * np.arange(KFNP)
    es = ALIQ * np.exp((BLIQ * tmin - CLIQ) / (tmin - DLIQ))
    qs = EP2 * es / (p - es)
    the0k = _thes(tmin, p, qs)

    ttab = np.zeros((KFNT, KFNP))
    qstab = np.zeros((KFNT, KFNP))
    tprev = np.full(KFNP, tmin)
    for it in range(KFNT):
        thes = the0k + dth * it
        tgues = tprev.copy()
        es = ALIQ * np.exp((BLIQ * tgues - CLIQ) / (tgues - DLIQ))
        qs = EP2 * es / (p - es)
        f0 = _thes(tgues, p, qs) - thes
        t1 = tgues - 0.5 * f0
        t0 = tgues
        for _ in range(11):
            if np.all(np.abs(t1 - t0) < 1e-5):
                break
            es = ALIQ * np.exp((BLIQ * t1 - CLIQ) / (t1 - DLIQ))
            qs = EP2 * es / (p - es)
            f1 = _thes(t1, p, qs) - thes
            denom = np.where(np.abs(f1 - f0) < 1e-30, 1e-30, f1 - f0)
            dtx = f1 * (t1 - t0) / denom
            t0, f0 = t1, f1
            t1 = t1 - dtx
        es = ALIQ * np.exp((BLIQ * t1 - CLIQ) / (t1 - DLIQ))
        qs = EP2 * es / (p - es)
        ttab[it] = t1
        qstab[it] = qs
        tprev = t1
    alu = np.log(ASTRT + AINCB * np.arange(KFNA))
    return dict(ttab=ttab, qstab=qstab, the0k=the0k, alu=alu,
                plutop=plutop, rdpr=1.0 / dpr, rdthk=1.0 / dth)


class KFTables(NamedTuple):
    ttab: jax.Array
    qstab: jax.Array
    the0k: jax.Array
    alu: jax.Array
    plutop: float
    rdpr: float
    rdthk: float

    @classmethod
    def build(cls, ptop_pa, dtype=jnp.float64):
        d = kf_lutab(float(ptop_pa))
        return cls(jnp.asarray(d["ttab"], dtype),
                   jnp.asarray(d["qstab"], dtype),
                   jnp.asarray(d["the0k"], dtype),
                   jnp.asarray(d["alu"], dtype),
                   d["plutop"], d["rdpr"], d["rdthk"])


def _thes_j(t, p, qs):
    """Traced twin of _thes.  The exponent is clamped so the f32 TPU
    path stays finite where qs saturates near the domain top (the
    reference's f64 table build tolerates the overflow silently)."""
    pi = (P00 / p) ** (0.2854 * (1.0 - 0.28 * qs))
    arg = jnp.minimum((C1 / t - C2) * qs * (1.0 + C4 * qs), 50.0)
    return t * pi * jnp.exp(arg)


def _qes_j(t, p):
    es = jnp.minimum(ALIQ * jnp.exp((BLIQ * t - CLIQ) / (t - DLIQ)),
                     0.5 * p)
    return EP2 * es / (p - es)


def tpmix2dd(tab: KFTables, p, thes):
    """(theta_es, p) → (T, qs) by direct elementwise secant inversion
    of the Bolton theta_es (replacing the reference's bilinear
    (KFNT, KFNP) table walk, tpmix2dd :2357-2402).  XLA:TPU lowers the
    2D table gathers to ~20 ms each at flagship size; the fixed
    8-step secant — the same iteration kf_lutab uses to BUILD the
    table — fuses to pure VPU flops and is more accurate than the
"""
    # theta_es(T; p) is monotone in T: 228 bisection steps on
    # [100, 400] K give ~1e-6 K, branch-free and vectorized
    lo = jnp.full_like(thes, 100.0)
    hi = jnp.full_like(thes, 400.0)
    for _ in range(28):
        mid = 0.5 * (lo + hi)
        below = _thes_j(mid, p, _qes_j(mid, p)) < thes
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid)
    t1 = 0.5 * (lo + hi)
    return t1, _qes_j(t1, p)


def tpmix2(tab: KFTables, p, thes, qu, qliq, qice):
    """Saturation-point adjustment along constant theta_es (tpmix2,
    :2095-2194).  Returns (tu, qu, qliq, qice, qnewlq, qnewic)."""
    temp, qs = tpmix2dd(tab, p, thes)
    dq = qs - qu
    sat = dq <= 0.0
    # supersaturated: condense the excess
    qnew_s = qu - qs
    # subsaturated: evaporate available condensate
    qtot = qliq + qice
    enough = qtot >= dq
    frac = dq / (qtot + 1.0e-10)
    qliq_e = qliq - frac * qliq
    qice_e = qice - frac * qice
    rll = XLV0 - XLV1 * temp
    cpp = c.cpd * (1.0 + 0.89 * qu)
    none_avail = qtot < 1.0e-10
    temp_n = temp + rll * (dq / (1.0 + dq)) / cpp
    temp_p = temp + rll * ((dq - qtot) / (1.0 + dq - qtot)) / cpp
    # assemble the three subsaturated cases
    temp_u = jnp.where(enough, temp,
                       jnp.where(none_avail, temp_n, temp_p))
    qu_u = jnp.where(enough, qs,
                     jnp.where(none_avail, qu, qu + qtot))
    qliq_u = jnp.where(enough, qliq_e,
                       jnp.where(none_avail, qliq, 0.0))
    qice_u = jnp.where(enough, qice_e,
                       jnp.where(none_avail, qice, 0.0))
    tu = jnp.where(sat, temp, temp_u)
    qu_o = jnp.where(sat, qs, qu_u)
    qliq_o = jnp.where(sat, qliq, qliq_u)
    qice_o = jnp.where(sat, qice, qice_u)
    qnewlq = jnp.where(sat, qnew_s, 0.0)
    return tu, qu_o, qliq_o, qice_o, qnewlq, jnp.zeros_like(qnewlq)


def _tlog_tab(tab: KFTables, e):
    """log(e/ALIQ) (envirtht :2420-2427).  The reference interpolates
    a log table (alu) to dodge CPU transcendental cost; on TPU the
    direct log is a single VPU op while the two table gathers are
    ~20 ms each at flagship size — and exact."""
    return jnp.log(jnp.maximum(e / ALIQ, 1.0e-20))


def _tdpt_from_e(tab: KFTables, e, t):
    """Dewpoint + LCL temperature from vapor pressure (the lookup-
    table dewpoint used at :555-563 and inside envirtht)."""
    tlog = _tlog_tab(tab, e)
    tdpt = (CLIQ - DLIQ * tlog) / (BLIQ - tlog)
    tlcl = tdpt - (0.212 + 1.571e-3 * (tdpt - c.tzero)
                   - 4.36e-4 * (t - c.tzero)) * (t - tdpt)
    return jnp.minimum(tlcl, t)


def envirtht(tab: KFTables, p, t, q):
    """Environmental theta-e (envirtht, :2404-2431)."""
    ee = q * p / (EP2 + q)
    tsat = _tdpt_from_e(tab, ee, t)
    tht = t * (P00 / p) ** (0.2854 * (1.0 - 0.28 * q))
    return tht * jnp.exp((C1 / tsat - C2) * q * (1.0 + C4 * q))


def prof5(eq):
    """Gaussian mixed-fraction integrals → fractional entrainment /
    detrainment rates (prof5, :2322-2355; Kain-Fritsch 1990 Eq. 2)."""
    sqrt2p, a1, a2, a3 = 2.506628, 0.4361836, -0.1201676, 0.9372980
    pcoef, sigma, fe = 0.33267, 0.166666667, 0.202765151
    y = 6.0 * eq - 3.0
    ey = jnp.exp(-0.5 * y * y)
    e45 = np.exp(-4.5)
    t2 = 1.0 / (1.0 + pcoef * jnp.abs(y))
    t1 = 0.500498
    c1_ = a1 * t1 + a2 * t1 ** 2 + a3 * t1 ** 3
    c2_ = a1 * t2 + a2 * t2 ** 2 + a3 * t2 ** 3
    ee_pos = sigma * (0.5 * (sqrt2p - e45 * c1_ - ey * c2_)
                      + sigma * (e45 - ey)) - e45 * eq * eq * 0.5
    ud_pos = sigma * (0.5 * (ey * c2_ - e45 * c1_)
                      + sigma * (e45 - ey)) \
        - e45 * (0.5 + 0.5 * eq * eq - eq)
    ee_neg = sigma * (0.5 * (ey * c2_ - e45 * c1_)
                      + sigma * (e45 - ey)) - e45 * eq * eq * 0.5
    ud_neg = sigma * (0.5 * (sqrt2p - e45 * c1_ - ey * c2_)
                      + sigma * (e45 - ey)) \
        - e45 * (0.5 + 0.5 * eq * eq - eq)
    pos = y >= 0.0
    ee = jnp.where(pos, ee_pos, ee_neg) / fe
    ud = jnp.where(pos, ud_pos, ud_neg) / fe
    return ee, ud


def condload(qliq, qice, wtw, dz, boterm, enterm, qnewlq, qnewic,
             convrate):
    """Precipitation fallout + vertical-velocity update (condload,
    :2246-2308; Ogura-Cho 1973 fallout, KF90 Eq. 9)."""
    convfac = 0.4
    qtot = qliq + qice
    qnew = qnewlq + qnewic
    qest = 0.5 * (qtot + qnew)
    g1 = jnp.maximum(wtw + boterm - enterm
                     - 2.0 * c.egrav * dz * qest / 1.5, 0.0)
    wavg = 0.5 * (jnp.sqrt(jnp.maximum(wtw, 0.0)) + jnp.sqrt(g1))
    conv = convrate * dz / jnp.maximum(wavg, 1e-10)
    ratio3 = qnewlq / jnp.maximum(qnew, 1.0e-8)
    qtot = qtot + (1.0 - convfac) * qnew
    oldq = qtot
    ratio4 = ((1.0 - convfac) * qnewlq + qliq) \
        / jnp.maximum(qtot, 1.0e-8)
    qtot = jnp.where(conv > 25.0, 1.0e-8, qtot * jnp.exp(-conv))
    dq = oldq - qtot
    qlqout = ratio4 * dq
    qicout = (1.0 - ratio4) * dq
    pptdrg = 0.5 * (oldq + qtot - 0.2 * qnew)
    wtw_n = wtw + boterm - enterm - 2.0 * c.egrav * dz * pptdrg / 1.5
    wtw_n = jnp.where(jnp.abs(wtw_n) < 1.0e-4, 1.0e-4, wtw_n)
    qliq_n = ratio4 * qtot + ratio3 * convfac * qnew
    qice_n = (1.0 - ratio4) * qtot + (1.0 - ratio3) * convfac * qnew
    return qliq_n, qice_n, wtw_n, qlqout, qicout


def dtfrznew(tu, p, qu, qfrz, qice):
    """Freezing warming + saturation re-adjustment (dtfrznew,
    :2196-2238).  Returns (tu, thteu, qu, qice)."""
    rlc = 2.5e6 - 2369.276 * (tu - c.tzero)
    rls = 2833922.0 - 259.532 * (tu - c.tzero)
    rlf = rls - rlc
    cpp = c.cpd * (1.0 + 0.89 * qu)
    a = (CLIQ - BLIQ * DLIQ) / ((tu - DLIQ) * (tu - DLIQ))
    dtfrz = rlf * qfrz / (cpp + rls * qu * a)
    tu = tu + dtfrz
    es = ALIQ * jnp.exp((BLIQ * tu - CLIQ) / (tu - DLIQ))
    qs = es * EP2 / (p - es)
    dqevap = qs - qu
    dqevap = jnp.where(dqevap > 0.0, jnp.minimum(qice, dqevap),
                       jnp.maximum(-qu, dqevap))
    qice = qice - dqevap
    qu = qu + dqevap
    pii = (P00 / p) ** (0.2854 * (1.0 - 0.28 * qu))
    thteu = tu * pii * jnp.exp((C1 / tu - C2) * qu * (1.0 + C4 * qu))
    return tu, thteu, qu, qice


# ---------------------------------------------------------------------------
# updraft over all candidate source layers (the usl: loop, :481-1016)
# ---------------------------------------------------------------------------

def _first_true(mask, axis=-1, default=0):
    """Index of first True along axis (default when none)."""
    any_ = jnp.any(mask, axis=axis)
    idx = jnp.argmax(mask.astype(jnp.int32), axis=axis)
    return jnp.where(any_, idx, default), any_


def _updraft_candidates(tab, par, t0, q0, qes, z0, p0, dp, w0avg,
                        dx, dxsq):
    """Mixing-layer + trigger + full updraft for every candidate USL.

    Inputs (ncol, nk) bottom-up.  Returns a dict of per-candidate
    (ncol, NCAND, [nk]) fields + masks.
    """
    ncol, nk = t0.shape
    lev = jnp.arange(nk)
    tv0 = t0 * (1.0 + EP1 * q0)

    # candidate source levels: surface + first level below each
    # successive 15 hPa threshold (kcheck, :466-478), limited to
    # p > p_sfc - 300 hPa (llfc)
    thr = p0[:, :1] - 15.0e2 * jnp.arange(1, NCAND)[None, :]
    # first level with p0 < threshold (p decreases with nk)
    below = p0[:, None, :] < thr[:, :, None]          # (ncol, NCAND-1, nk)
    kc_rest, kc_ok = _first_true(below, axis=-1)
    kcand = jnp.concatenate(
        [jnp.zeros((ncol, 1), jnp.int32),
         kc_rest.astype(jnp.int32)], axis=1)           # (ncol, NCAND)
    p_at = jnp.take_along_axis(p0, kcand, axis=1)
    cand_valid = jnp.concatenate(
        [jnp.ones((ncol, 1), bool), kc_ok], axis=1) \
        & (p_at >= p0[:, :1] - 30000.0)

    # ---- 50 hPa mixing layer from each candidate base (:497-527) ----
    cdp = jnp.cumsum(dp, axis=1)
    cdp0 = jnp.concatenate([jnp.zeros((ncol, 1), dp.dtype),
                            cdp[:, :-1]], axis=1)
    base = jnp.take_along_axis(cdp0, kcand, axis=1)    # Σdp below lc
    depth = cdp[:, None, :] - base[:, :, None]         # (ncol, NCAND, nk)
    above = lev[None, None, :] >= kcand[:, :, None]
    deep_enough = (depth > DPMIN) & above
    kpbl, has_pbl = _first_true(deep_enough, axis=-1)
    kpbl = kpbl.astype(jnp.int32)
    cand_valid = cand_valid & has_pbl
    inmix = above & (lev[None, None, :] <= kpbl[:, :, None])
    wmix = jnp.where(inmix, dp[:, None, :], 0.0)
    dpthmx = wmix.sum(-1)
    wsum = lambda a: (wmix * a[:, None, :]).sum(-1) \
        / jnp.maximum(dpthmx, 1e-10)
    tmix, qmix = wsum(t0), wsum(q0)
    zmix, pmix = wsum(z0), wsum(p0)
    emix = qmix * pmix / (EP2 + qmix)

    # ---- LCL (:548-580) ---------------------------------------------
    tlcl = _tdpt_from_e(tab, emix, tmix)
    tvlcl = tlcl * (1.0 + EP1 * qmix)
    zlcl = zmix + (tlcl - tmix) / GDRY
    above_lcl = (z0[:, None, :] >= zlcl[:, :, None]) \
        & (lev[None, None, :] >= kcand[:, :, None])
    klcl, in_dom = _first_true(above_lcl, axis=-1, default=nk - 1)
    klcl = jnp.maximum(klcl.astype(jnp.int32), 1)
    cand_valid = cand_valid & in_dom
    kbelow = klcl - 1
    gl = lambda a, k: jnp.take_along_axis(a, k, axis=1)
    z_k, z_k1 = gl(z0, kbelow), gl(z0, klcl)
    dlp = (zlcl - z_k) / jnp.maximum(z_k1 - z_k, 1e-10)
    tenv = gl(t0, kbelow) + (gl(t0, klcl) - gl(t0, kbelow)) * dlp
    qenv = gl(q0, kbelow) + (gl(q0, klcl) - gl(q0, kbelow)) * dlp
    tven = tenv * (1.0 + EP1 * qenv)

    # ---- trigger (:586-635): Kain (2004) Eqs. 1-2 + RH term ---------
    wklcl = jnp.where(zlcl < 2.0e3,
                      par.wthreshold * zlcl / 2.0e3, par.wthreshold)
    w_int = gl(w0avg, kbelow) + (gl(w0avg, klcl)
                                 - gl(w0avg, kbelow)) * dlp
    scale = dx / 25.0e3 if dx >= 25.0e3 else 1.0
    wkl = w_int * scale - wklcl
    dtlcl = jnp.where(wkl < 1.0e-4, 0.0, 4.64 * jnp.maximum(
        wkl, 1e-30) ** 0.33)
    # trigger 3: Narita-Ohmori RH perturbation
    qslcl = gl(qes, kbelow) + (gl(qes, klcl) - gl(qes, kbelow)) * dlp
    rhlcl = jnp.clip(qenv / jnp.maximum(qslcl, 1e-12), 0.0, 1.0)
    dqssdt = qmix * (CLIQ - BLIQ * DLIQ) \
        / ((tlcl - DLIQ) * (tlcl - DLIQ))
    dtrh = jnp.where(
        (rhlcl >= 0.90) & (rhlcl <= 0.95),
        0.25 * (rhlcl - 0.75) * qmix / dqssdt,
        jnp.where(rhlcl > 0.95,
                  (1.0 / jnp.maximum(rhlcl, 1e-6) - 1.0)
                  * qmix / dqssdt, 0.0))
    trig = (tlcl + dtlcl + dtrh >= tenv) & cand_valid

    # ---- updraft launch (:643-712) ----------------------------------
    theteu0 = envirtht(tab, pmix, tmix, qmix)
    dttot = dtlcl + dtrh
    gdt = 2.0 * c.egrav * dttot * 500.0 / tven
    wlcl = jnp.where(dttot > 1.0e-4,
                     jnp.minimum(1.0 + 0.5 * jnp.sqrt(
                         jnp.maximum(gdt, 0.0)), 3.0), 1.0)
    plcl = gl(p0, kbelow) + (gl(p0, klcl) - gl(p0, kbelow)) * dlp
    rholcl = plcl / (c.rgas * tvlcl)
    rad = jnp.where(wkl < 0.0, 1000.0,
                    jnp.where(wkl > 0.1, 2000.0,
                              1000.0 + 1000.0 * wkl / 0.1))
    au0 = 0.01 * dxsq
    vmflcl = rholcl * au0

    # environmental theta-e profile (entrainment source)
    thetee = envirtht(tab, p0, t0, q0)                 # (ncol, nk)

    # ---- the ascent scan (:705-920) ---------------------------------
    # state per (ncol, NCAND); scan over levels nk1 = 1..nk-1
    dtype = t0.dtype
    sh = (ncol, NCAND)

    def broadcast_cand(a):
        return jnp.broadcast_to(a[:, None, :], (ncol, NCAND, nk))

    t0c, q0c, p0c = (broadcast_cand(x) for x in (t0, q0, p0))
    tv0c, dpc, z0c = (broadcast_cand(x) for x in (tv0, dp, z0))
    theteec = broadcast_cand(thetee)

    carry0 = dict(
        theteu=theteu0, qu=qmix, qliq=jnp.zeros(sh, dtype),
        qice=jnp.zeros(sh, dtype), wtw=wlcl * wlcl,
        umf=vmflcl, dilfrc_prev=jnp.ones(sh, dtype),
        ttemp=jnp.full(sh, TTFRZ, dtype),
        ee1=jnp.ones(sh, dtype), ud1=jnp.zeros(sh, dtype),
        rei=jnp.zeros(sh, dtype), abe=jnp.zeros(sh, dtype),
        trppt=jnp.zeros(sh, dtype),
        tvqu_prev=jnp.zeros(sh, dtype),
        let=klcl, ltop=klcl,
        stopped=jnp.zeros(sh, bool),
        upold_last=vmflcl, upnew_last=vmflcl,
    )

    def body(carry, nk1):
        active = (nk1 > kbelow) & trig & ~carry["stopped"]
        first = nk1 == klcl
        pnk1 = p0c[:, :, nk1]
        tu, qu, qliq, qice, qnewlq, qnewic = tpmix2(
            tab, pnk1, carry["theteu"], carry["qu"], carry["qliq"],
            carry["qice"])
        theteu = carry["theteu"]
        # freezing interval (:726-760)
        frz = tu <= TTFRZ
        ttemp_eff = jnp.minimum(carry["ttemp"], TTFRZ)
        frc1 = jnp.where(
            tu > TBFRZ,
            (ttemp_eff - tu) / jnp.maximum(ttemp_eff - TBFRZ, 1e-10),
            1.0)
        frc1 = jnp.where(frz, jnp.clip(frc1, 0.0, 1.0), 0.0)
        qfrz = (qliq + qnewlq) * frc1
        qnewic_f = qnewic + qnewlq * frc1
        qnewlq_f = qnewlq - qnewlq * frc1
        qice_f = qice + qliq * frc1
        qliq_f = qliq - qliq * frc1
        tu_f, theteu_f, qu_f, qice_f2 = dtfrznew(
            tu, pnk1, qu, qfrz, qice_f)
        tu = jnp.where(frz, tu_f, tu)
        theteu = jnp.where(frz, theteu_f, theteu)
        qu = jnp.where(frz, qu_f, qu)
        qliq = jnp.where(frz, qliq_f, qliq)
        qice = jnp.where(frz, qice_f2, qice)
        qnewlq = jnp.where(frz, qnewlq_f, qnewlq)
        qnewic = jnp.where(frz, qnewic_f, qnewic)
        ttemp = jnp.where(frz, tu, carry["ttemp"])
        tvu = tu * (1.0 + EP1 * qu)
        # buoyancy term (:764-775)
        z_nk1 = z0c[:, :, nk1]
        z_nk = jnp.where(first, zlcl,
                         z0c[:, :, jnp.maximum(nk1 - 1, 0)])
        dzz = z_nk1 - z_nk
        tvu_prev = jnp.where(first, tvlcl, carry.get("tvu_prev",
                                                     tvlcl))
        tv0_prev = jnp.where(first, tven,
                             tv0c[:, :, jnp.maximum(nk1 - 1, 0)])
        be = (tvu_prev + tvu) / (tv0_prev + tv0c[:, :, nk1]) - 1.0
        boterm = 2.0 * dzz * c.egrav * be / 1.5
        enterm = 2.0 * carry["rei"] * carry["wtw"] \
            / jnp.maximum(carry["upold_last"], 1e-10)
        qliq, qice, wtw, qlqout, qicout = condload(
            qliq, qice, carry["wtw"], dzz, boterm, enterm,
            qnewlq, qnewic, par.convrate)
        # vertical-velocity exit (:781-787)
        stop_w = wtw < 1.0e-3
        wu = jnp.sqrt(jnp.maximum(wtw, 0.0))
        # entrainment rate (:795-799)
        rei = vmflcl * dpc[:, :, nk1] * par.entrate / rad
        tvqu = tu * (1.0 + EP1 * qu - qliq - qice)
        tvqu_prev = jnp.where(first, tvlcl, carry["tvqu_prev"])
        dilbe = jnp.where(
            first,
            ((tvlcl + tvqu) / (tven + tv0c[:, :, nk1]) - 1.0) * dzz,
            ((tvqu_prev + tvqu)
             / (tv0_prev + tv0c[:, :, nk1]) - 1.0) * dzz)
        abe_inc = jnp.where(dilbe > 0.0, dilbe * c.egrav, 0.0)
        # entrain/detrain fractions (:807-877)
        neg_buoy = tvqu <= tv0c[:, :, nk1]
        # critical mixed fraction via two trial mixes
        def trial(f1):
            f2 = 1.0 - f1
            thttmp = f1 * theteec[:, :, nk1] + f2 * theteu
            qtmp = f1 * q0c[:, :, nk1] + f2 * qu
            tmpliq = f2 * qliq
            tmpice = f2 * qice
            ttmp, qtmp2, tl2, ti2, _, _ = tpmix2(
                tab, pnk1, thttmp, qtmp, tmpliq, tmpice)
            return ttmp * (1.0 + EP1 * qtmp2 - tl2 - ti2)
        tu95 = trial(0.95)
        tu10 = trial(0.10)
        eqfrc = (tv0c[:, :, nk1] - tvqu) * 0.10 \
            / jnp.where(jnp.abs(tu10 - tvqu) < 1e-30, 1e-30,
                        tu10 - tvqu)
        eqfrc = jnp.clip(eqfrc, 0.0, 1.0)
        ee2_g, ud2_g = prof5(jnp.clip(eqfrc, 1e-6, 1.0 - 1e-6))
        tiny = 1e-30
        ee2 = jnp.where(
            neg_buoy, 0.5,
            jnp.where(tu95 > tv0c[:, :, nk1], 1.0,
                      jnp.where(jnp.abs(tu10 - tvqu) < 1.0e-3, 1.0,
                                jnp.where(1.0 - eqfrc < tiny, 1.0,
                                          jnp.where(eqfrc < tiny,
                                                    0.0, ee2_g)))))
        ud2 = jnp.where(
            neg_buoy, 1.0,
            jnp.where(tu95 > tv0c[:, :, nk1], 0.0,
                      jnp.where(jnp.abs(tu10 - tvqu) < 1.0e-3, 0.0,
                                jnp.where(1.0 - eqfrc < tiny, 0.0,
                                          jnp.where(eqfrc < tiny,
                                                    1.0, ud2_g)))))
        let = jnp.where(active & ~stop_w & ~neg_buoy,
                        jnp.asarray(nk1, jnp.int32), carry["let"])
        ee2 = jnp.maximum(ee2, 0.5)
        ud2 = 1.5 * ud2
        uer = 0.5 * rei * (carry["ee1"] + ee2)
        udr = 0.5 * rei * (carry["ud1"] + ud2)
        # total-detrainment exit (:883-895)
        stop_d = (carry["umf"] - udr) < 10.0
        upold = carry["umf"] - udr
        upnew = upold + uer
        dilfrc = upnew / jnp.maximum(upold, 1e-10)
        qdt = qu
        qu_dil = (upold * qu + uer * q0c[:, :, nk1]) \
            / jnp.maximum(upnew, 1e-10)
        theteu_dil = (theteu * upold + theteec[:, :, nk1] * uer) \
            / jnp.maximum(upnew, 1e-10)
        qliq_dil = qliq * upold / jnp.maximum(upnew, 1e-10)
        qice_dil = qice * upold / jnp.maximum(upnew, 1e-10)
        pptliq = qlqout * carry["umf"]
        pptice = qicout * carry["umf"]
        # source-layer inflow (:916)
        uer_ex = jnp.where(nk1 <= kpbl,
                           uer + vmflcl * dpc[:, :, nk1] / dpthmx,
                           uer)
        # abe correction on total-detrain exit (:888-891)
        abe_new = carry["abe"] + jnp.where(stop_d, 0.0, abe_inc)
        # updates applied only while active and not exiting
        ok = active & ~stop_w & ~stop_d
        upd = lambda new, old: jnp.where(ok, new, old)
        out = dict(
            umf=upd(upnew, jnp.where(active & stop_d, 0.0, 0.0)),
            uer=upd(uer_ex, 0.0), udr=upd(udr, 0.0),
            # detrainment carries the PRE-dilution condensate
            # (:904-906: detlq = qliq(nk1)*udr before the upold/upnew
            # rescale)
            detlq=upd(qliq * udr, 0.0),
            detic=upd(qice * udr, 0.0),
            pptliq=upd(pptliq, 0.0), pptice=upd(pptice, 0.0),
            qliq=upd(qliq_dil, 0.0), qice=upd(qice_dil, 0.0),
            qdt=upd(qdt, 0.0), wu=upd(wu, 0.0),
            tu=jnp.where(active, tu, 0.0),
            dilfrc=jnp.where(ok, dilfrc, 1.0),
            tvqu=jnp.where(active, tvqu, 0.0),
            qlqout=upd(qlqout, 0.0), qicout=upd(qicout, 0.0),
        )
        ncarry = dict(
            theteu=upd(theteu_dil, carry["theteu"]),
            qu=upd(qu_dil, carry["qu"]),
            qliq=upd(qliq_dil, carry["qliq"]),
            qice=upd(qice_dil, carry["qice"]),
            wtw=upd(wtw, carry["wtw"]),
            umf=upd(upnew, carry["umf"]),
            dilfrc_prev=upd(dilfrc, carry["dilfrc_prev"]),
            ttemp=upd(ttemp, carry["ttemp"]),
            ee1=upd(ee2, carry["ee1"]), ud1=upd(ud2, carry["ud1"]),
            rei=upd(rei, carry["rei"]),
            abe=jnp.where(active, abe_new, carry["abe"]),
            trppt=upd(carry["trppt"] + pptliq + pptice,
                      carry["trppt"]),
            tvqu_prev=upd(tvqu, carry["tvqu_prev"]),
            tvu_prev=upd(tvu, carry.get("tvu_prev",
                                        jnp.zeros(sh, dtype))),
            let=jnp.where(active, let, carry["let"]),
            # on exit ltop = previous level (loop variable nk);
            # on running levels track nk1 so a full-loop finish keeps
            # the last processed level
            ltop=jnp.where(
                active & (stop_w | stop_d),
                jnp.asarray(nk1 - 1, jnp.int32),
                jnp.where(ok, jnp.asarray(nk1, jnp.int32),
                          carry["ltop"])),
            stopped=carry["stopped"] | (active & (stop_w | stop_d)),
            upold_last=upd(upnew, carry["upold_last"]),
            upnew_last=upd(upnew, carry["upnew_last"]),
        )
        return ncarry, out

    carry0["tvu_prev"] = jnp.zeros(sh, dtype)
    fcarry, prof = jax.lax.scan(body, carry0, jnp.arange(1, nk))

    # prof arrays come as (nk-1, ncol, NCAND) → (ncol, NCAND, nk)
    def stackp(a):
        z = jnp.zeros((1,) + sh, dtype)
        return jnp.moveaxis(jnp.concatenate([z, a], axis=0), 0, -1)
    profs = {k: stackp(v) for k, v in prof.items()}

    return dict(
        profs=profs, fcarry=fcarry, trig=trig, kcand=kcand,
        kpbl=kpbl, klcl=klcl, kbelow=kbelow, dlp=dlp,
        tlcl=tlcl, tvlcl=tvlcl, zlcl=zlcl, plcl=plcl,
        tmix=tmix, qmix=qmix, zmix=zmix, pmix=pmix, emix=emix,
        dpthmx=dpthmx, vmflcl=vmflcl, wlcl=wlcl, rad=rad,
        tven=tven, wkl=wkl, theteu0=theteu0, au0=au0,
        thetee=thetee, inmix=inmix, wmix=wmix)


# ---------------------------------------------------------------------------
# candidate selection + single-column profile assembly (:922-1016)
# ---------------------------------------------------------------------------

def _select_candidates(cand, z0, par):
    """Deep first-wins / best-shallow selection over the candidate
    axis; gathers every per-candidate field at the winner."""
    profs, fc = cand["profs"], cand["fcarry"]
    ncol = z0.shape[0]
    ltop = fc["ltop"]
    let = fc["let"]
    abe = fc["abe"]
    gl2 = lambda a, k: jnp.take_along_axis(a, k, axis=1)
    z_ltop = gl2(jnp.broadcast_to(z0[:, None, :],
                                  ltop.shape + (z0.shape[1],))
                 .reshape(ncol * NCAND, -1),
                 ltop.reshape(ncol * NCAND, 1)).reshape(ncol, NCAND)
    cldhgt = z_ltop - cand["zlcl"]
    tlcl = cand["tlcl"]
    chmin = jnp.where(tlcl > 293.0, 4.0e3,
                      jnp.where(tlcl >= 273.0,
                                2.0e3 + 100.0 * (tlcl - 273.0),
                                2.0e3))
    # no-convection conditions (:966-985)
    no_conv = (ltop <= cand["klcl"]) | (ltop <= cand["kpbl"]) \
        | (let + 1 <= cand["kpbl"]) | ~cand["trig"]
    deep = ~no_conv & (cldhgt > chmin) & (abe > 1.0)
    shal = ~no_conv & ~deep & (cldhgt > 0.0)
    cldhgt_s = jnp.where(shal, cldhgt, -1.0)

    deep_c, has_deep = _first_true(deep, axis=1)
    shal_c = jnp.argmax(cldhgt_s, axis=1)
    has_shal = jnp.any(shal, axis=1)
    ishall = ~has_deep & has_shal
    active = has_deep | has_shal
    chosen = jnp.where(has_deep, deep_c, shal_c)[:, None]

    sel = {}
    for k, v in profs.items():
        sel[k] = jnp.take_along_axis(
            v, chosen[:, :, None], axis=1)[:, 0]      # (ncol, nk)
    g1 = lambda a: jnp.take_along_axis(a, chosen, axis=1)[:, 0]
    scal = dict(
        ltop=g1(ltop), let=g1(let), abe=g1(abe),
        trppt=g1(fc["trppt"]),
        klcl=g1(cand["klcl"]), kpbl=g1(cand["kpbl"]),
        lc=g1(cand["kcand"]), kbelow=g1(cand["kbelow"]),
        tlcl=g1(tlcl), tvlcl=g1(cand["tvlcl"]),
        zlcl=g1(cand["zlcl"]), plcl=g1(cand["plcl"]),
        tmix=g1(cand["tmix"]), qmix=g1(cand["qmix"]),
        zmix=g1(cand["zmix"]), pmix=g1(cand["pmix"]),
        dpthmx=g1(cand["dpthmx"]), vmflcl=g1(cand["vmflcl"]),
        wlcl=g1(cand["wlcl"]), tven=g1(cand["tven"]),
        wkl=g1(cand["wkl"]), cldhgt=g1(cldhgt),
        dilfrc_last=g1(fc["dilfrc_prev"]),
        ishall=ishall, active=active, has_deep=has_deep,
    )
    sel_inmix = jnp.take_along_axis(
        cand["inmix"], chosen[:, :, None], axis=1)[:, 0]
    return sel, scal, sel_inmix


def _adjust_let(sel, scal, dp, active):
    """Mass-flux taper between LET and cloud top (:1025-1077)."""
    nk = dp.shape[1]
    lev = jnp.arange(nk)[None, :]
    let = scal["let"][:, None]
    ltop = scal["ltop"][:, None]
    umf, udr, uer = sel["umf"], sel["udr"], sel["uer"]
    detlq, detic = sel["detlq"], sel["detic"]
    qliq, qice = sel["qliq"], sel["qice"]
    dilfrc = sel["dilfrc"]
    pptliq, pptice = sel["pptliq"], sel["pptice"]
    qlqout, qicout = sel["qlqout"], sel["qicout"]
    trppt = scal["trppt"]

    same = scal["let"] == scal["ltop"]
    # let == ltop: full detrainment at ltop (:1028-1033)
    at_ltop = lev == ltop
    g_ltop = lambda a: jnp.take_along_axis(
        a, scal["ltop"][:, None], axis=1)[:, 0]
    udr_lt = g_ltop(umf) + g_ltop(udr) - g_ltop(uer)
    dil_lt = scal["dilfrc_last"]
    udr_s = jnp.where(at_ltop & same[:, None], udr_lt[:, None], udr)
    detlq_s = jnp.where(at_ltop & same[:, None],
                        (g_ltop(qliq) * udr_lt * dil_lt)[:, None]
                        * jnp.ones_like(udr), detlq)
    detic_s = jnp.where(at_ltop & same[:, None],
                        (g_ltop(qice) * udr_lt * dil_lt)[:, None]
                        * jnp.ones_like(udr), detic)
    uer_s = jnp.where(at_ltop & same[:, None], 0.0, uer)
    umf_s = jnp.where(at_ltop & same[:, None], 0.0, umf)

    # let < ltop: linear taper (:1037-1076)
    span = (lev > let) & (lev <= ltop)
    dptt = jnp.where(span, dp, 0.0).sum(1)
    umf_let = jnp.take_along_axis(umf, scal["let"][:, None],
                                  axis=1)[:, 0]
    dumfdp = umf_let / jnp.maximum(dptt, 1e-10)
    cdp_span = jnp.cumsum(jnp.where(span, dp, 0.0), axis=1)
    umf_t = umf_let[:, None] - cdp_span * dumfdp[:, None]
    # previous-level tapered umf: umf(let) at the first span level
    umf_tm1 = umf_let[:, None] - (cdp_span - dp) * dumfdp[:, None]
    in_body = span & (lev < ltop)
    uer_t = umf_t * (1.0 - 1.0 / jnp.maximum(dilfrc, 1e-10))
    udr_t = umf_tm1 - umf_t + uer_t
    at_top = span & (lev == ltop)
    udr_top = umf_tm1
    taper = ~same[:, None]
    umf_n = jnp.where(taper & in_body, umf_t,
                      jnp.where(taper & at_top, 0.0, umf_s))
    uer_n = jnp.where(taper & in_body, uer_t,
                      jnp.where(taper & at_top, 0.0, uer_s))
    udr_n = jnp.where(taper & in_body, udr_t,
                      jnp.where(taper & at_top, udr_top, udr_s))
    detlq_n = jnp.where(taper & span, udr_n * qliq * dilfrc, detlq_s)
    detic_n = jnp.where(taper & span, udr_n * qice * dilfrc, detic_s)
    # precipitation re-derivation for nk >= let+2 (:1070-1075)
    refl = span & (lev >= let + 2)
    ppl_new = jnp.where(refl, umf_tm1 * qlqout, pptliq)
    ppi_new = jnp.where(refl, umf_tm1 * qicout, pptice)
    trppt_n = jnp.where(
        same, trppt,
        trppt + jnp.where(refl, (ppl_new - pptliq)
                          + (ppi_new - pptice), 0.0).sum(1))
    pptliq_n = jnp.where(taper & refl, ppl_new, pptliq)
    pptice_n = jnp.where(taper & refl, ppi_new, pptice)

    out = dict(sel)
    out.update(umf=umf_n, uer=uer_n, udr=udr_n, detlq=detlq_n,
               detic=detic_n, pptliq=pptliq_n, pptice=pptice_n)
    return out, trppt_n


# ---------------------------------------------------------------------------
# below/above-cloud initialization + time scale + precipitation
# efficiency (:1081-1232)
# ---------------------------------------------------------------------------

def _init_profiles(tab, sel, scal, t0, q0, p0, z0, dp, wspd, l5, dx,
                   par):
    nk = t0.shape[1]
    lev = jnp.arange(nk)[None, :]
    lc = scal["lc"][:, None]
    kpbl = scal["kpbl"][:, None]
    kbelow = scal["kbelow"][:, None]
    ltop = scal["ltop"][:, None]
    vmflcl = scal["vmflcl"][:, None]
    dpthmx = scal["dpthmx"][:, None]

    # below cloud base (nk <= klcl-1): source-layer buildup (:1085-1110)
    frac = vmflcl * dp / dpthmx
    cum_src = jnp.cumsum(jnp.where((lev >= lc) & (lev <= kpbl),
                                   frac, 0.0), axis=1)
    below = lev <= kbelow
    in_src = (lev >= lc) & (lev <= kpbl)
    umf_b = jnp.where(in_src, cum_src,
                      jnp.where((lev > kpbl) & below, vmflcl, 0.0))
    uer_b = jnp.where(in_src, frac, 0.0)
    tu_b = scal["tmix"][:, None] + (z0 - scal["zmix"][:, None]) * GDRY
    qu_b = scal["qmix"][:, None] * jnp.ones_like(t0)
    wu_b = scal["wlcl"][:, None] * jnp.ones_like(t0)

    sub = below
    umf = jnp.where(sub, umf_b, sel["umf"])
    uer = jnp.where(sub, uer_b, sel["uer"])
    udr = jnp.where(sub, 0.0, sel["udr"])
    tu = jnp.where(sub, jnp.where(lev >= lc, tu_b, 0.0), sel["tu"])
    qu = jnp.where(sub, jnp.where(lev >= lc, qu_b, 0.0), sel["qdt"])
    wu = jnp.where(sub, jnp.where(lev >= lc, wu_b, 0.0), sel["wu"])
    qdt = jnp.where(sub, 0.0, sel["qdt"])
    qliq = jnp.where(sub, 0.0, sel["qliq"])
    qice = jnp.where(sub, 0.0, sel["qice"])
    qlqout = jnp.where(sub, 0.0, sel["qlqout"])
    qicout = jnp.where(sub, 0.0, sel["qicout"])
    detlq = jnp.where(sub, 0.0, sel["detlq"])
    detic = jnp.where(sub, 0.0, sel["detic"])
    pptliq = jnp.where(sub, 0.0, sel["pptliq"])
    pptice = jnp.where(sub, 0.0, sel["pptice"])
    dilfrc = jnp.where(sub, 1.0, sel["dilfrc"])

    # above cloud top: zero everything (:1126-1162)
    abv = lev > ltop
    umf = jnp.where(abv, 0.0, umf)
    uer = jnp.where(abv, 0.0, uer)
    udr = jnp.where(abv, 0.0, udr)
    qdt = jnp.where(abv, 0.0, qdt)
    qliq = jnp.where(abv, 0.0, qliq)
    qice = jnp.where(abv, 0.0, qice)
    qlqout = jnp.where(abv, 0.0, qlqout)
    qicout = jnp.where(abv, 0.0, qicout)
    detlq = jnp.where(abv, 0.0, detlq)
    detic = jnp.where(abv, 0.0, detic)
    pptliq = jnp.where(abv, 0.0, pptliq)
    pptice = jnp.where(abv, 0.0, pptice)
    tu = jnp.where(lev > ltop + 1, 0.0, tu)
    qu = jnp.where(lev > ltop + 1, 0.0, qu)
    wu = jnp.where(lev > ltop + 1, 0.0, wu)

    # energies + potential temperatures (:1164-1178)
    intop = lev <= ltop
    dxsq = dx * dx
    ems = dp * dxsq / c.egrav
    emsd = 1.0 / ems
    exn_u = (P00 / p0) ** (0.2854 * (1.0 - 0.28 * qdt))
    thtau = tu * exn_u
    exn0 = (P00 / p0) ** (0.2854 * (1.0 - 0.28 * q0))
    thta0 = t0 * exn0
    ddilfrc = 1.0 / jnp.maximum(dilfrc, 1e-10)
    thetee = envirtht(tab, p0, t0, q0)

    # convective time scale (:1182-1200)
    g1s = lambda a, k: jnp.take_along_axis(a, k[:, None], axis=1)[:, 0]
    vconv = 0.5 * (g1s(wspd, scal["klcl"]) + g1s(wspd, l5))
    timec = dx / jnp.maximum(vconv, 1e-3)
    tadvec = timec
    timec = jnp.clip(timec, par.min_dtcape, par.max_dtcape)
    timec = jnp.where(scal["ishall"], 600.0, timec)

    # precipitation efficiency (:1204-1232)
    wspd_top = g1s(wspd, scal["ltop"])
    wspd_lcl = g1s(wspd, scal["klcl"])
    shsign = jnp.where(wspd_top > wspd_lcl, 1.0, -1.0)
    du = g1s(sel["u0"], scal["ltop"]) - g1s(sel["u0"], scal["klcl"])
    dv = g1s(sel["v0"], scal["ltop"]) - g1s(sel["v0"], scal["klcl"])
    z_top = g1s(z0, scal["ltop"])
    z_lcl = g1s(z0, scal["klcl"])
    vws = 1.0e3 * shsign * jnp.sqrt(du * du + dv * dv) \
        / jnp.maximum(z_top - z_lcl, 1.0)
    pef = 1.591 + vws * (-0.639 + vws * (9.53e-2 - vws * 4.96e-3))
    pef = jnp.clip(pef, par.min_pef, par.max_pef)
    cbh = (scal["zlcl"] - z0[:, 0]) * 3.281e-3
    rcbh = jnp.where(
        cbh < 3.0, 0.02,
        0.96729352 + cbh * (-0.70034167 + cbh * (0.162179896
            + cbh * (-1.2569798e-2 + cbh * (4.2772e-4
                                            - cbh * 5.44e-6)))))
    rcbh = jnp.where(cbh > 25.0, 2.4, rcbh)
    pefcbh = jnp.clip(1.0 / (1.0 + rcbh), par.min_pef, par.max_pef)
    peff = 0.5 * (pef + pefcbh)

    return dict(umf=umf, uer=uer, udr=udr, tu=tu, qu=qu, wu=wu,
                qdt=qdt, qliq=qliq, qice=qice, qlqout=qlqout,
                qicout=qicout, detlq=detlq, detic=detic,
                pptliq=pptliq, pptice=pptice, dilfrc=dilfrc,
                ddilfrc=ddilfrc, ems=ems, emsd=emsd, thtau=thtau,
                thta0=thta0, thetee=thetee, timec=timec,
                tadvec=tadvec, peff=peff, intop=intop)


# ---------------------------------------------------------------------------
# downdraft (:1236-1445)
# ---------------------------------------------------------------------------

def _downdraft(tab, prof, scal, t0, q0, qes, p0, z0, dp, rh, tv0,
               dx, par, peff, au0):
    ncol, nk = t0.shape
    lev = jnp.arange(nk)[None, :]
    dtype = t0.dtype
    deep = scal["active"] & ~scal["ishall"]
    kstart = scal["kpbl"] + 1
    let = scal["let"]
    # LFS: first level above kstart with p(kstart) - p > dpp hPa
    g1s = lambda a, k: jnp.take_along_axis(
        a, jnp.clip(k, 0, nk - 1)[:, None], axis=1)[:, 0]
    p_ks = g1s(p0, kstart)
    above = (lev > kstart[:, None]) \
        & ((p_ks[:, None] - p0) > par.dpp * 100.0)
    klfs0, found = _first_true(above, axis=1, default=nk - 1)
    klfs = jnp.where(found, klfs0, let - 1)
    lfs = jnp.clip(jnp.minimum(klfs, let - 1), 0, nk - 1)
    has_dd = deep & ((p_ks - g1s(p0, lfs)) > 50.0e2)

    # initial downdraft at the LFS (:1263-1283)
    thetee = prof["thetee"]
    theted_lfs = g1s(thetee, lfs)
    tz_lfs, qss_lfs = tpmix2dd(tab, g1s(p0, lfs), theted_lfs)
    tvd_lfs = tz_lfs * (1.0 + EP1 * qss_lfs)
    rdd = g1s(p0, lfs) / (c.rgas * tvd_lfs)
    a1 = (1.0 - peff) * au0
    dmf_lfs = -a1 * rdd
    ems, emsd = prof["ems"], prof["emsd"]
    ems_lfs = g1s(ems, lfs)

    # downward mixing scan lfs-1 → 0, active in [kstart, lfs-1]
    def mixdown(carry, ilev):
        nd = nk - 2 - ilev                  # descending from nk-2
        act = has_dd & (nd >= kstart) & (nd < lfs)
        der_nd = dmf_lfs * ems[:, nd] / jnp.maximum(ems_lfs, 1e-10)
        dmf_nd = carry["dmf"] + der_nd
        theted_nd = (carry["theted"] * carry["dmf"]
                     + thetee[:, nd] * der_nd) \
            / jnp.where(jnp.abs(dmf_nd) < 1e-10, 1e-10, dmf_nd)
        qd_nd = (carry["qd"] * carry["dmf"] + q0[:, nd] * der_nd) \
            / jnp.where(jnp.abs(dmf_nd) < 1e-10, 1e-10, dmf_nd)
        rhbar = carry["rhbar"] + jnp.where(act, rh[:, nd] * dp[:, nd],
                                           0.0)
        dptt = carry["dptt"] + jnp.where(act, dp[:, nd], 0.0)
        upd = lambda n, o: jnp.where(act, n, o)
        ncarry = dict(dmf=upd(dmf_nd, carry["dmf"]),
                      theted=upd(theted_nd, carry["theted"]),
                      qd=upd(qd_nd, carry["qd"]),
                      rhbar=rhbar, dptt=dptt)
        out = dict(der=jnp.where(act, der_nd, 0.0),
                   dmf=jnp.where(act, dmf_nd, 0.0))
        return ncarry, out

    carry0 = dict(dmf=dmf_lfs, theted=theted_lfs,
                  qd=g1s(q0, lfs),
                  rhbar=jnp.where(has_dd,
                                  g1s(rh, lfs) * g1s(dp, lfs), 0.0),
                  dptt=jnp.where(has_dd, g1s(dp, lfs), 0.0))
    mcarry, mix = jax.lax.scan(mixdown, carry0, jnp.arange(nk - 1))
    # scatter scan outputs (ordered nd = nk-2 .. 0) back to levels
    der_prof = jnp.flip(jnp.moveaxis(mix["der"], 0, 1), axis=1)
    der_prof = jnp.concatenate(
        [der_prof, jnp.zeros((ncol, 1), dtype)], axis=1)
    at_lfs = lev == lfs[:, None]
    der_prof = jnp.where(at_lfs, dmf_lfs[:, None], der_prof)
    rhbar = mcarry["rhbar"] / jnp.maximum(mcarry["dptt"], 1e-10)
    dmffrc = 2.0 * (1.0 - rhbar)                 # Kain (2004) Eq. 11

    # melting of frozen precip (:1300-1317)
    in_cld = (lev >= scal["klcl"][:, None]) \
        & (lev <= scal["ltop"][:, None])
    pptmlt = jnp.where(in_cld, prof["pptice"], 0.0).sum(1)
    umf_klcl = g1s(prof["umf"], scal["klcl"])
    # ml: highest level below ltop with t0 > 0C
    warm = (t0 > c.tzero) & (lev <= scal["ltop"][:, None])
    ml = jnp.where(jnp.any(warm, axis=1),
                   (nk - 1) - jnp.argmax(jnp.flip(warm, 1)
                                         .astype(jnp.int32), axis=1),
                   -1)
    dtmelt = jnp.where(scal["lc"] < ml,
                       c.wlhf * pptmlt
                       / (c.cpd * jnp.maximum(umf_klcl, 1e-10)), 0.0)
    tz_ks, _ = tpmix2dd(tab, p_ks, mcarry["theted"])
    tz_ks = tz_ks - dtmelt
    es_ks = ALIQ * jnp.exp((BLIQ * tz_ks - CLIQ) / (tz_ks - DLIQ))
    qss_ks = EP2 * es_ks / (p_ks - es_ks)
    theted_ks = tz_ks * (P00 / p_ks) ** (0.2854 * (1.0 - 0.28
                                                   * qss_ks)) \
        * jnp.exp((C1 / tz_ks - C2) * qss_ks * (1.0 + C4 * qss_ks))

    # descending wet-bulb scan LDT → LDB (:1318-1360)
    ldt = jnp.minimum(lfs - 1, kstart - 1)
    z_ks = g1s(z0, kstart)

    def wetbulb(carry, ilev):
        nd = nk - 2 - ilev
        searching = has_dd & (nd <= ldt) & ~carry["found"]
        tz_nd, qss = tpmix2dd(tab, p0[:, nd], theted_ks)
        rhh = 1.0 - 0.2e-3 * (z_ks - z0[:, nd])
        # adjust to specified RH (:1335-1353)
        dssdt = (CLIQ - BLIQ * DLIQ) / ((tz_nd - DLIQ) ** 2)
        rl = XLV0 - XLV1 * tz_nd
        dtmp = rl * qss * (1.0 - rhh) / (c.cpd + rl * rhh * qss
                                         * dssdt)
        t1rh = tz_nd + dtmp
        es_rh = rhh * ALIQ * jnp.exp((BLIQ * t1rh - CLIQ)
                                     / (t1rh - DLIQ))
        qsrh = EP2 * es_rh / (p0[:, nd] - es_rh)
        too_dry = qsrh < carry["qd_ks"]
        qsrh_f = jnp.where(too_dry, carry["qd_ks"], qsrh)
        t1rh_f = jnp.where(too_dry,
                           tz_nd + (qss - qsrh_f) * rl / c.cpd, t1rh)
        adj = rhh < 1.0
        tz_f = jnp.where(adj, t1rh_f, tz_nd)
        qss_f = jnp.where(adj, qsrh_f, qss)
        tvd_nd = tz_f * (1.0 + EP1 * qss_f)
        is_ldb = searching & ((tvd_nd > tv0[:, nd]) | (nd == 0))
        dpdd = carry["dpdd"] + jnp.where(searching, dp[:, nd], 0.0)
        ncarry = dict(found=carry["found"] | is_ldb,
                      ldb=jnp.where(is_ldb, jnp.asarray(nd, jnp.int32),
                                    carry["ldb"]),
                      dpdd=dpdd, qd_ks=carry["qd_ks"])
        out = dict(tz=jnp.where(searching, tz_f, 0.0),
                   qsd=jnp.where(searching, qss_f, 0.0))
        return ncarry, out

    wb0 = dict(found=~has_dd, ldb=jnp.zeros((ncol,), jnp.int32),
               dpdd=jnp.zeros((ncol,), dtype), qd_ks=mcarry["qd"])
    wcarry, wet = jax.lax.scan(wetbulb, wb0, jnp.arange(nk - 1))
    tz_prof = jnp.flip(jnp.moveaxis(wet["tz"], 0, 1), axis=1)
    qsd_prof = jnp.flip(jnp.moveaxis(wet["qsd"], 0, 1), axis=1)
    tz_prof = jnp.concatenate([tz_prof,
                               jnp.zeros((ncol, 1), dtype)], axis=1)
    qsd_prof = jnp.concatenate([qsd_prof,
                                jnp.zeros((ncol, 1), dtype)], axis=1)
    ldb = wcarry["ldb"]
    dpdd = wcarry["dpdd"]
    deep_enough = has_dd & ((g1s(p0, ldb) - g1s(p0, lfs)) > 50.0e2)

    # detrainment leg LDT → LDB (:1361-1372)
    in_dd = (lev >= ldb[:, None]) & (lev <= ldt[:, None]) \
        & deep_enough[:, None]
    # full detrainment of the kstart downdraft mass over [ldb, ldt]
    # (:1363-1366: ddr(nd) = -dmf(kstart)·dp/dpdd)
    ddr_prof = jnp.where(in_dd,
                         -mcarry["dmf"][:, None] * dp
                         / jnp.maximum(dpdd, 1e-10)[:, None], 0.0)
    tder = jnp.where(in_dd,
                     (qsd_prof - mcarry["qd"][:, None]) * ddr_prof,
                     0.0).sum(1)
    # dmf profile: mixing leg value + cumulative ddr below ldt
    dmf_mix = jnp.concatenate(
        [jnp.flip(jnp.moveaxis(mix["dmf"], 0, 1), axis=1),
         jnp.zeros((ncol, 1), dtype)], axis=1)
    dmf_prof = jnp.where(at_lfs, dmf_lfs[:, None], dmf_mix)
    dmf_ks = mcarry["dmf"]
    csum_dd = jnp.flip(jnp.cumsum(jnp.flip(ddr_prof, 1), 1), 1)
    dmf_below = dmf_ks[:, None] + csum_dd
    dmf_prof = jnp.where(in_dd, dmf_below, dmf_prof)
    qd_prof = jnp.where(in_dd, qsd_prof, mcarry["qd"][:, None])
    thtad_prof = jnp.where(
        in_dd,
        tz_prof * (P00 / p0) ** (0.2854 * (1.0 - 0.28 * qd_prof)),
        0.0)
    # theta-d on the mixing leg is never fed back (tz zeroed there by
    # the reference at :1440-1444); only [ldb, ldt] matters
    return dict(lfs=lfs, ldb=ldb, ldt=ldt, kstart=kstart,
                tder=tder, dmffrc=dmffrc, deep_enough=deep_enough,
                dmf=dmf_prof, der=der_prof, ddr=ddr_prof,
                qd=qd_prof, thtad=thtad_prof, tz=tz_prof,
                dmf_kstart=dmf_ks, umf_klcl=umf_klcl, ml=ml)


# ---------------------------------------------------------------------------
# compensational subsidence advection (one pass, masked substeps)
# ---------------------------------------------------------------------------

def _advect(fields, srcs, omg_fxm, nstep, dtime, emsd, intop):
    """Upstream forward-in-time advection of a dict of level fields
    with per-level source terms (:1516-1553); NSTEPMAX masked
    substeps, each column running its own nstep."""
    fxm = omg_fxm

    def substep(state, it):
        run = it < nstep                     # (ncol,)
        out = {}
        for name, f in state.items():
            # bottom-interface flux for level nk (nk>=1)
            f_dn = jnp.concatenate([f[:, :1] * 0.0, f[:, :-1]],
                                   axis=1)
            flux_bot = jnp.where(fxm <= 0.0, -fxm * f_dn, -fxm * f)
            flux_bot = flux_bot.at[:, 0].set(0.0)
            flux_top = jnp.concatenate(
                [flux_bot[:, 1:], jnp.zeros_like(f[:, :1])], axis=1)
            net = flux_bot - flux_top + srcs[name]
            fn = f + net * dtime[:, None] * emsd
            out[name] = jnp.where(run[:, None] & intop, fn, f)
        return out, None

    state, _ = jax.lax.scan(substep, fields, jnp.arange(NSTEPMAX))
    return state


def _borrow_moisture(qg, ems, emsd, ltop, klcl):
    """qg<0 fix: borrow from the neighbors (:1557-1603)."""
    ncol, nk = qg.shape

    def body(qg, nkv):
        neg = (qg[:, nkv] < 0.0) & (nkv <= ltop) & (nkv >= 1)
        nk1 = jnp.where(nkv == ltop, klcl,
                        jnp.minimum(nkv + 1, nk - 1))
        take = lambda a, k: jnp.take_along_axis(a, k[:, None],
                                                axis=1)[:, 0]
        tma = take(qg, nk1) * take(ems, nk1)
        tmb = qg[:, nkv - 1] * ems[:, nkv - 1]
        tmm = (qg[:, nkv] - 1.0e-9) * ems[:, nkv]
        bco = -tmm / ((tma * tma) / jnp.where(jnp.abs(tmb) < 1e-30,
                                              1e-30, tmb) + tmb)
        aco = bco * tma / jnp.where(jnp.abs(tmb) < 1e-30, 1e-30, tmb)
        tmb_n = tmb * (1.0 - bco)
        tma_n = tma * (1.0 - aco)
        qg = qg.at[:, nkv].set(jnp.where(neg, 1.0e-9, qg[:, nkv]))
        new_nk1 = jnp.where(neg, tma_n * take(emsd, nk1), take(qg, nk1))
        qg = jnp.where(
            (jnp.arange(nk)[None, :] == nk1[:, None]) & neg[:, None],
            new_nk1[:, None], qg)
        qg = qg.at[:, nkv - 1].set(
            jnp.where(neg, tmb_n * emsd[:, nkv - 1], qg[:, nkv - 1]))
        return qg, None

    qg, _ = jax.lax.scan(body, qg, jnp.arange(1, nk))
    return qg


class KFOut(NamedTuple):
    dtdt: jax.Array       # (ncol, nk) K/s, bottom-up
    dqdt: jax.Array       # qv tendency
    dqcdt: jax.Array
    dqidt: jax.Array
    dqrdt: jax.Array
    dqsdt: jax.Array
    prate: jax.Array      # (ncol,) kg/m²/s
    cldfra: jax.Array     # (ncol, nk)
    conv_ppt: jax.Array   # (ncol, nk) precip generation for chem
    ktop: jax.Array
    kbot: jax.Array
    ishall: jax.Array
    active: jax.Array
    timec: jax.Array      # CAPE-removal time scale (s)


def kfpara(tab: KFTables, par: KFParams, t0, q0, u0, v0, z0, p0,
           rho, dzq, w0avg, tke, ql0, qi0, dt, dx, f_qi: bool):
    """Full KF column physics, dense over (ncol, nk) bottom-up
    (kfpara, :344-2093)."""
    ncol, nk = t0.shape
    dtype = t0.dtype
    dxsq = dx * dx
    lev = jnp.arange(nk)[None, :]

    # saturation + input conditioning (kfdrv :205-212)
    es = ALIQ * jnp.exp((BLIQ * t0 - CLIQ) / (t0 - DLIQ))
    qes = EP2 * es / (p0 - es)
    q0 = jnp.clip(q0, 1.0e-6, qes)
    rh01 = jnp.clip(q0 / qes, 0.0, 1.0)
    tv0 = t0 * (1.0 + EP1 * q0)
    dp = rho * c.egrav * dzq
    wspd = jnp.sqrt(u0 * u0 + v0 * v0)
    # l5: last level with p >= p_sfc/2
    half = p0 >= 0.5 * p0[:, :1]
    l5 = jnp.maximum(half.sum(1).astype(jnp.int32) - 1, 0)

    # ---- candidate updrafts + selection -----------------------------
    cand = _updraft_candidates(tab, par, t0, q0, qes, z0, p0, dp,
                               w0avg, dx, dxsq)
    sel, scal, inmix = _select_candidates(cand, z0, par)
    # shallow: let = kstart = max(kpbl, klcl) (:1018-1021)
    kstart_sh = jnp.maximum(scal["kpbl"], scal["klcl"])
    scal["let"] = jnp.where(scal["ishall"], kstart_sh, scal["let"])
    sel["u0"], sel["v0"] = u0, v0

    sel2, trppt = _adjust_let(sel, scal, dp, scal["active"])
    scal["trppt"] = trppt
    prof = _init_profiles(tab, {**sel2, "u0": u0, "v0": v0}, scal,
                          t0, q0, p0, z0, dp, wspd, l5, dx, par)
    timec = prof["timec"]
    nic = jnp.maximum(jnp.round(timec / dt).astype(jnp.int32), 1)
    timec = nic.astype(dtype) * dt
    peff = prof["peff"]

    dd = _downdraft(tab, prof, scal, t0, q0, qes, p0, z0, dp, rh01,
                    tv0, dx, par, peff, 0.01 * dxsq)

    # ---- downdraft strength (d_mf, :1379-1445) ----------------------
    no_dd = dd["tder"] < 1.0
    ddinc = -dd["dmffrc"] * dd["umf_klcl"] \
        / jnp.where(jnp.abs(dd["dmf_kstart"]) < 1e-10, -1e-10,
                    dd["dmf_kstart"])
    ddinc = jnp.where(dd["tder"] * ddinc > scal["trppt"],
                      scal["trppt"] / jnp.maximum(dd["tder"], 1e-10),
                      ddinc)
    ddinc = jnp.where(no_dd, 0.0, ddinc)
    tder = jnp.where(no_dd, 0.0, dd["tder"] * ddinc)
    dmf = dd["dmf"] * ddinc[:, None]
    der = dd["der"] * ddinc[:, None]
    ddr = dd["ddr"] * ddinc[:, None]
    # zero downdrafts outside [ldb, lfs] (:1418-1436)
    in_dd_span = (lev >= dd["ldb"][:, None]) \
        & (lev <= dd["lfs"][:, None])
    dmf = jnp.where(in_dd_span, dmf, 0.0)
    der = jnp.where(in_dd_span, der, 0.0)
    ddr = jnp.where(in_dd_span, ddr, 0.0)
    cpr = scal["trppt"]
    pptflx = jnp.where(no_dd, scal["trppt"], scal["trppt"] - tder)
    peff = jnp.where(no_dd, peff,
                     pptflx / jnp.maximum(scal["trppt"], 1e-10))
    qd_fb = jnp.where(in_dd_span & ~no_dd[:, None], dd["qd"], 0.0)
    thtad_fb = jnp.where(in_dd_span & ~no_dd[:, None],
                         dd["thtad"], 0.0)

    # ---- inflow limit (:1451-1463) ----------------------------------
    lmax = jnp.maximum(scal["klcl"], dd["lfs"])
    uer_net = prof["uer"] - der
    in_inflow = (lev >= scal["lc"][:, None]) & (lev <= lmax[:, None])
    aincm1 = jnp.where(in_inflow & (uer_net > 1.0e-3),
                       prof["ems"] / jnp.maximum(uer_net, 1e-10)
                       / timec[:, None], 1.0e3)
    aincmx = jnp.minimum(aincm1.min(1), 1.0e3)
    ainc0 = jnp.minimum(1.0, aincmx)

    # unit profiles (:1468-1480)
    unit = dict(umf=prof["umf"], uer=prof["uer"], udr=prof["udr"],
                detlq=prof["detlq"], detic=prof["detic"],
                dmf=dmf, der=der, ddr=ddr)
    tder2, pptfl2 = tder, pptflx

    # shallow mass flux from TKE (:1487-1507)
    in_tke = (lev >= scal["lc"][:, None]) \
        & (lev <= scal["klcl"][:, None])
    evac = 0.5 * jnp.where(in_tke, tke, 0.0).max(1) * 0.1
    ainc_sh = evac * scal["dpthmx"] * dxsq \
        / (jnp.maximum(scal["vmflcl"], 1e-10) * c.egrav * timec)
    ainc0 = jnp.where(scal["ishall"], ainc_sh, ainc0)

    # ---- closure iteration (iter:, :1510-1787) ----------------------
    thta0, thtau = prof["thta0"], prof["thtau"]
    emsd, ems = prof["emsd"], prof["ems"]
    intop = prof["intop"]
    abe = scal["abe"]

    def one_pass(ainc):
        """omg/advection/abeg for the current mass-flux factor."""
        s = {k: v * ainc[:, None] for k, v in unit.items()}
        domgdp = -(s["uer"] - s["der"] - s["udr"] - s["ddr"]) * emsd
        domgdp = jnp.where(intop, domgdp, 0.0)
        omg = jnp.concatenate(
            [jnp.zeros((ncol, 1), dtype),
             -jnp.cumsum(dp * domgdp, axis=1)[:, :-1]], axis=1)
        absomg = jnp.abs(omg[:, 1:])
        dp_m1 = dp[:, :-1]
        lim = jnp.where((absomg * timec[:, None] / 2.0
                         > 0.75 * dp_m1) & intop[:, 1:],
                        0.75 * dp_m1 / jnp.maximum(absomg, 1e-10),
                        timec[:, None] / 2.0)
        dtt = jnp.minimum(lim.min(1), timec / 2.0)
        nstep = jnp.clip(jnp.round(timec / dtt).astype(jnp.int32),
                         1, NSTEPMAX)
        dtime = timec / nstep.astype(dtype)
        # no flux through the cloud-top interface (the reference's
        # flux loop runs nk = 2..ltop only, :1530)
        fxm = jnp.where(intop, omg * dxsq / c.egrav, 0.0)
        srcs = dict(
            th=s["udr"] * thtau + s["ddr"] * thtad_fb
            - (s["uer"] - s["der"]) * thta0,
            q=s["udr"] * prof["qdt"] + s["ddr"] * qd_fb
            - (s["uer"] - s["der"]) * q0)
        adv = _advect(dict(th=thta0, q=q0), srcs, fxm, nstep, dtime,
                      emsd, intop)
        qg = _borrow_moisture(adv["q"], ems, emsd, scal["ltop"],
                              scal["klcl"])
        thtag = adv["th"]
        exn = (P00 / p0) ** (0.2854 * (1.0 - 0.28 * qg))
        tg = thtag / exn
        return s, omg, fxm, nstep, dtime, tg, qg, thtag

    def abeg_of(tg, qg):
        """Adjusted buoyant energy of the post-convective sounding
        (:1620-1705)."""
        wmix_sel = jnp.where(inmix, dp, 0.0)
        dpth = jnp.maximum(wmix_sel.sum(1), 1e-10)
        tmix = (wmix_sel * tg).sum(1) / dpth
        qmix = (wmix_sel * qg).sum(1) / dpth
        pmix = scal["pmix"]
        es_m = ALIQ * jnp.exp((tmix * BLIQ - CLIQ) / (tmix - DLIQ))
        qss = EP2 * es_m / (pmix - es_m)
        sup = qmix > qss
        rl = XLV0 - XLV1 * tmix
        cpm = c.cpd * (1.0 + 0.887 * qmix)
        dssdt = qss * (CLIQ - BLIQ * DLIQ) / ((tmix - DLIQ) ** 2)
        dq = (qmix - qss) / (1.0 + rl * dssdt / cpm)
        tmix_s = tmix + rl / c.cpd * dq
        qmix_s = qmix - dq
        emix = jnp.maximum(qmix, 0.0) * pmix \
            / (EP2 + jnp.maximum(qmix, 0.0))
        tlcl_t = _tdpt_from_e(tab, emix, tmix)
        tlcl = jnp.where(sup, tmix_s, tlcl_t)
        tmix = jnp.where(sup, tmix_s, tmix)
        qmix = jnp.where(sup, qmix_s, qmix)
        tvlcl = tlcl * (1.0 + EP1 * qmix)
        zlcl = scal["zmix"] + (tlcl - tmix) / GDRY
        above_l = (z0 >= zlcl[:, None]) \
            & (lev >= scal["lc"][:, None])
        klcl2, _ = _first_true(above_l, axis=1, default=nk - 1)
        klcl2 = jnp.maximum(klcl2.astype(jnp.int32), 1)
        k2 = klcl2 - 1
        g1 = lambda a, k: jnp.take_along_axis(a, k[:, None],
                                              axis=1)[:, 0]
        dlp = (zlcl - g1(z0, k2)) \
            / jnp.maximum(g1(z0, klcl2) - g1(z0, k2), 1e-10)
        tenv = g1(tg, k2) + (g1(tg, klcl2) - g1(tg, k2)) * dlp
        qenv = g1(qg, k2) + (g1(qg, klcl2) - g1(qg, k2)) * dlp
        tven = tenv * (1.0 + EP1 * qenv)
        theteu_k = tmix * (P00 / pmix) ** (
            0.2854 * (1.0 - 0.28 * qmix)) \
            * jnp.exp((C1 / tlcl - C2) * qmix * (1.0 + C4 * qmix))
        thteeg = envirtht(tab, p0, tg, qg)
        tvg = tg * (1.0 + EP1 * qg)
        dza_z = jnp.concatenate([z0[:, 1:] - z0[:, :-1],
                                 jnp.zeros((ncol, 1), dtype)], axis=1)

        def body(carry, nk1):
            act = (nk1 > k2) & (nk1 <= scal["ltop"])
            first = nk1 == klcl2
            theteu = carry["theteu"]
            tgu, qgu = tpmix2dd(tab, p0[:, nk1], theteu)
            tvqu = tgu * (1.0 + EP1 * qgu - sel2["qliq"][:, nk1]
                          - sel2["qice"][:, nk1])
            dzz = jnp.where(first, g1(z0, klcl2) - zlcl,
                            dza_z[:, nk1 - 1])
            tvq_p = jnp.where(first, tvlcl, carry["tvqu_prev"])
            tvg_p = jnp.where(first, tven, tvg[:, nk1 - 1])
            dilbe = ((tvq_p + tvqu) / (tvg_p + tvg[:, nk1]) - 1.0) \
                * dzz
            abeg = carry["abeg"] + jnp.where(
                act & (dilbe > 0.0), dilbe * c.egrav, 0.0)
            ddil = prof["ddilfrc"][:, nk1]
            theteu_n = theteu * ddil + thteeg[:, nk1] * (1.0 - ddil)
            upd = lambda n, o: jnp.where(act, n, o)
            return dict(theteu=upd(theteu_n, theteu),
                        tvqu_prev=upd(tvqu, carry["tvqu_prev"]),
                        abeg=abeg), None

        carry0 = dict(theteu=theteu_k,
                      tvqu_prev=jnp.zeros((ncol,), dtype),
                      abeg=jnp.zeros((ncol,), dtype))
        fc, _ = jax.lax.scan(body, carry0, jnp.arange(1, nk))
        return fc["abeg"]

    stab = 0.95

    def iter_body(i, st):
        (ainc, fabe_o, ainc_o, ainc_used, noitr, done, dead,
         tg, qg, thtag, omg, fxm, nstep, dtime) = st
        s, omg_n, fxm_n, nstep_n, dtime_n, tg_n, qg_n, thtag_n = \
            one_pass(ainc)
        run = ~done & ~dead & scal["active"]
        keep = lambda n, o: jnp.where(run[:, None], n, o) \
            if n.ndim == 2 else jnp.where(run, n, o)
        tg = keep(tg_n, tg)
        qg = keep(qg_n, qg)
        thtag = keep(thtag_n, thtag)
        omg = keep(omg_n, omg)
        fxm = keep(fxm_n, fxm)
        nstep = jnp.where(run, nstep_n, nstep)
        dtime = jnp.where(run, dtime_n, dtime)
        # the mass-flux factor the SAVED fields correspond to — the
        # feedback stage must reuse exactly this factor
        ainc_used = jnp.where(run, ainc, ainc_used)
        # shallow columns exit after the first pass (:1612-1614)
        done_sh = scal["ishall"] & run
        abeg = abeg_of(tg_n, qg_n)
        fabe = abeg / jnp.maximum(abe, 1e-10)
        dabe = jnp.maximum(abe - abeg, 0.1 * abe)
        # fabe > 1: environment more unstable -> abandon (:1714-1716)
        dead_n = dead | (run & ~scal["ishall"] & (fabe > 1.0))
        # secant safeguard (:1717-1729)
        dfda = (fabe - fabe_o) / jnp.where(
            jnp.abs(ainc - ainc_o) < 1e-30, 1e-30, ainc - ainc_o)
        freeze = run & (i > 0) & ((jnp.abs(ainc - ainc_o) < 1e-4)
                                  | (dfda > 0.0)) & ~noitr
        # frozen columns redo one pass at the OLD ainc then stop
        done_frozen = run & noitr
        conv1 = run & (ainc / jnp.maximum(aincmx, 1e-10) > 0.999) \
            & (fabe > 1.05 - stab)
        conv2 = run & (fabe <= 1.05 - stab) & (fabe >= 0.95 - stab)
        new_done = done | done_sh | conv1 | conv2 | done_frozen \
            | dead_n
        # next ainc (:1754-1775)
        ainc_next = jnp.where(
            jnp.abs(fabe) < 1e-15, ainc * 0.5,
            jnp.where(dabe < 1.0e-4, ainc,
                      ainc * stab * abe / jnp.maximum(dabe, 1e-10)))
        ainc_next = jnp.minimum(aincmx, ainc_next)
        dead_n = dead_n | (run & ~scal["ishall"] & ~new_done
                           & (ainc_next < 0.05))
        ainc_new = jnp.where(
            run & ~new_done,
            jnp.where(freeze, ainc_o, ainc_next), ainc)
        noitr_n = noitr | freeze
        fabe_keep = jnp.where(run, fabe, fabe_o)
        ainc_keep = jnp.where(run & ~new_done & ~freeze, ainc,
                              ainc_o)
        return (ainc_new, fabe_keep, ainc_keep, ainc_used, noitr_n,
                new_done, dead_n, tg, qg, thtag, omg, fxm, nstep,
                dtime)

    z1 = jnp.zeros((ncol,), dtype)
    init = (ainc0, jnp.ones((ncol,), dtype), ainc0, ainc0,
            jnp.zeros((ncol,), bool), jnp.zeros((ncol,), bool),
            jnp.zeros((ncol,), bool), t0, q0, thta0,
            jnp.zeros((ncol, nk), dtype), jnp.zeros((ncol, nk), dtype),
            jnp.ones((ncol,), jnp.int32), timec)
    (ainc, fabe, ainc_o, ainc_used, noitr, done, dead, tg, qg,
     thtag, omg, fxm, nstep, dtime) = jax.lax.fori_loop(
        0, MAXITER, iter_body, init)
    # the ainc the final fields correspond to
    ainc_f = ainc_used
    live = scal["active"] & ~dead

    # ---- cloud fraction (Xu-Krueger, :1789-1809) --------------------
    umf_f = unit["umf"] * ainc_f[:, None]
    in_cf = (lev >= scal["klcl"][:, None] - 1) \
        & (lev <= scal["ltop"][:, None] + 1)
    umf_new = umf_f / dxsq
    kfac = jnp.where(scal["ishall"], par.kfac_shal,
                     par.kfac_deep)[:, None]
    capv = jnp.where(scal["ishall"], 0.6, 0.2)[:, None]
    xcld = jnp.clip(kfac * jnp.log(1.0 + par.k2_const * umf_new),
                    0.01, capv)
    cldfra = jnp.where(in_cf & live[:, None], xcld, 0.0)

    # ---- hydrometeor redistribution (:1812-1879) --------------------
    fbfrc = jnp.where(scal["ishall"], 1.0, 0.0)
    pptflx_f = pptfl2 * ainc_f
    tder_f = tder2 * ainc_f
    frc2 = jnp.where(cpr > 0.0,
                     pptfl2 / jnp.maximum(cpr, 1e-10), 0.0)
    detlq_f = unit["detlq"] * ainc_f[:, None]
    detic_f = unit["detic"] * ainc_f[:, None]
    udr_fb = unit["udr"] * ainc_f[:, None]
    ddr_fb = unit["ddr"] * ainc_f[:, None]
    rainfb = prof["pptliq"] * (ainc_f * fbfrc * frc2)[:, None]
    snowfb = prof["pptice"] * (ainc_f * fbfrc * frc2)[:, None]
    zeros = jnp.zeros((ncol, nk), dtype)
    hyd = _advect(
        dict(ql=ql0, qi=qi0, qr=zeros, qs=zeros),
        dict(ql=detlq_f, qi=detic_f, qr=rainfb, qs=snowfb),
        fxm, nstep, dtime, emsd, intop)
    qlg, qig, qrg, qsg = hyd["ql"], hyd["qi"], hyd["qr"], hyd["qs"]

    # ---- feedback tendencies (:1990-2075) ---------------------------
    rt = 1.0 / timec
    warm_rain = not f_qi
    if f_qi:
        dqcdt = (qlg - ql0) * rt[:, None]
        dqidt = (qig - qi0) * rt[:, None]
        dqrdt = qrg * rt[:, None]
        dqsdt = qsg * rt[:, None]
        tg_fb = tg
    else:
        # no ice phase: melt frozen hydrometeors, feed back as ql/qr
        cpm = c.cpd * (1.0 + 0.887 * qg)
        tg_fb = tg - (qig + qsg) * c.wlhf / cpm
        dqcdt = (qlg + qig - ql0 - qi0) * rt[:, None]
        dqidt = zeros
        dqrdt = (qrg + qsg) * rt[:, None]
        dqsdt = zeros
    dtdt = (tg_fb - t0) * rt[:, None]
    dqdt = (qg - q0) * rt[:, None]
    pratec = pptflx_f * (1.0 - fbfrc) / dxsq

    m = live[:, None]
    zz = lambda a: jnp.where(m, a, 0.0)
    ms = live
    conv_ppt = zz((prof["pptliq"] + prof["pptice"])
                  * ainc_f[:, None])
    return KFOut(
        dtdt=zz(dtdt), dqdt=zz(dqdt), dqcdt=zz(dqcdt),
        dqidt=zz(dqidt), dqrdt=zz(dqrdt), dqsdt=zz(dqsdt),
        prate=jnp.where(ms, jnp.maximum(pratec, 0.0), 0.0),
        cldfra=cldfra, conv_ppt=conv_ppt,
        ktop=jnp.where(ms, scal["ltop"], 0),
        kbot=jnp.where(ms, scal["klcl"], 0),
        ishall=scal["ishall"] & ms, active=ms, timec=timec)
