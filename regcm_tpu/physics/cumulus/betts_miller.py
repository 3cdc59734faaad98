"""Betts-Miller cumulus convection scheme (icup=3).

Faithful jax port of ``Main/cumlib/mod_cu_bm.F90`` (``bmpara`` :134-926):
convective adjustment toward reference T/q profiles for deep and
shallow convection (Betts 1986; Betts & Miller 1986; Kain's table-free
variant). Deep: moist-adiabat-anchored reference temperature below the
freezing level, saturation-pressure-deficit (dsp) humidity reference,
two-pass enthalpy-conservation correction, entropy-change closure with
the prognostic cloud efficiency ``cldefi`` memory. Shallow: mixing-line
slope reference with RH-drop cloud-top detection.

TPU-native form: the per-point gather/scatter loops become dense masked
(ncol, kz) algebra (arrays TOP-DOWN like the reference, k=0 = model
top); the below-freezing reference recursion and the mixing-line
recursion are ``lax.scan``s; ``tpfc`` is a fixed-iteration vectorized
secant solve. Deviation from the reference (documented): the
reference's ``exit shallow`` on the supersaturation/slope checks
(:832,:844) aborts *all remaining points* in gather order — a
processing-order artifact; this port applies the per-point ``cycle``
semantics instead.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c

# parameters (:137-191)
H3000 = 3000.0
STRESH = 1.10
STABS = 1.0
STABD = 0.90
RHF = 0.20
PMN = 6500.0
EPSDN = 1.05
EPSTH = 6.0
PBM = 30000.0
PQM = 20000.0
PONE = 2500.0
PFRZ = 15000.0
PSHU = 45000.0
ZNO = 750.0
ZSH = 3999.0
FSL = 1.00
FSS = 0.60
EFIMN = 0.20
EFMNT = 0.70
FCC1 = 0.50
FCP = 1.0 - FCC1
DSPBFL, DSP0FL, DSPTFL = -3875.0, -5875.0, -1875.0
DSPBFS, DSP0FS, DSPTFS = -3875.0, -5875.0, -1875.0
DSPBSL, DSP0SL, DSPTSL = DSPBFL * FSL, DSP0FL * FSL, DSPTFL * FSL
DSPBSS, DSP0SS, DSPTSS = DSPBFS * FSS, DSP0FS * FSS, DSPTFS * FSS
EPSNTP = 1.0e-3
EFIFC = 5.0
AVGEFI = (EFIMN + 1.0) * 0.5
DSPC = -3000.0
EPSP = 1.0e-7
STEFI = AVGEFI
SLOPBL = (DSPBFL - DSPBSL) / (1.0 - EFIMN)
SLOP0L = (DSP0FL - DSP0SL) / (1.0 - EFIMN)
SLOPTL = (DSPTFL - DSPTSL) / (1.0 - EFIMN)
SLOPBS = (DSPBFS - DSPBSS) / (1.0 - EFIMN)
SLOP0S = (DSP0FS - DSP0SS) / (1.0 - EFIMN)
SLOPTS = (DSPTFS - DSPTSS) / (1.0 - EFIMN)
SLOPE = (1.0 - EFMNT) / (1.0 - EFIMN)
A23M4L = c.c3les * (c.tzero - c.c4les) * c.wlhv
CPRLG = c.cpd / (c.rhoh2o * c.egrav * c.wlhv)
TREL = 3000.0
RHMIN, RHMAX = 0.01, 1.01    # mod_params.F90:331-332


class BMOut(NamedTuple):
    tten: jax.Array      # (ncol, kz) top-down T tendency (K/s, decoupled)
    qten: jax.Array      # qv tendency (kg/kg/s)
    prate: jax.Array     # precip rate (mm/s = kg/m2/s)
    cldefi: jax.Array    # updated cloud efficiency memory
    kbot: jax.Array
    ktop: jax.Array


def _esliq(t):
    """Saturation vapor pressure, KF liquid form (:342)."""
    return c.aliq * jnp.exp((c.bliq * t - c.cliq) / (t - c.dliq))


def _tlcl(t, q, p):
    """LCL temperature from dewpoint (:286-291); p in Pa."""
    ee = p * q / (0.622 + q)
    tdpt = 1.0 / (c.rtzero - c.rwat * c.rwlhv
                  * jnp.log(jnp.maximum(ee, 1e-10) / 611.0))
    tdpt = jnp.minimum(tdpt, t)
    return tdpt - (0.212 + 1.571e-3 * (tdpt - c.tzero)
                   - 4.36e-4 * (t - c.tzero)) * (t - tdpt)


def _tpfc(press, thetae, tgs, ape):
    """T on the moist adiabat thetae at pressure press (tpfc, :886-924):
    vectorized secant iteration, fixed 12 steps with masked updates."""
    rl461 = c.wlhv / c.rwat
    rl1004 = c.wlhv / c.cpd
    rp = thetae / ape

    def f(tt):
        es = 611.0 * jnp.exp(rl461 * (c.rtzero - 1.0 / tt))
        qs = 0.622 * es / jnp.maximum(press - es, 1.0)
        return tt * jnp.exp(rl1004 * qs / tt) - rp

    fo = f(tgs)
    t1 = tgs - 0.5 * fo
    tguess = tgs
    for _ in range(12):
        f1 = f(t1)
        done = jnp.abs(f1) < 0.1
        denom = jnp.where(jnp.abs(f1 - fo) < 1e-12, 1e-12, f1 - fo)
        dtx = f1 * (t1 - tguess) / denom
        tguess = jnp.where(done, tguess, t1)
        fo = jnp.where(done, fo, f1)
        t1 = jnp.where(done, t1, t1 - dtx)
    return t1


def bmpara(t, q, pas, pasf, z0, psf, landmask, cldefi, dt) -> BMOut:
    """Betts-Miller adjustment on (ncol, kz) TOP-DOWN columns.

    t (K), q (mixing ratio), pas (Pa mid-level), pasf (Pa, kz+1
    interfaces), z0 heights (m), psf surface pressure (Pa), landmask
    (1=land), cldefi: persistent cloud efficiency; dt: timestep (s).
    """
    ncol, kz = t.shape
    ii = jnp.arange(kz)[None, :]
    tauk = dt / TREL
    cthrs = (0.00635 / 86400.0) * dt / CPRLG
    xsm = jnp.where(landmask > 0.5, 0.0, 1.0)      # 1=water (:220-228)

    ape = (pas / c.stdp) ** (-c.rovcp)             # 1/Exner (:254)
    tds = (pasf[:, 1:] - pasf[:, :-1]) / pasf[:, -1:]
    lb = kz - 2                                     # 0-based kzm1 (:240)

    # -- maximum-buoyancy source level in lowest 300 hPa (:281-301) -----
    inlow = pas >= (psf[:, None] - PBM)
    tthbt = t * ape
    tlcl = _tlcl(t, q, pas)
    tthes = tthbt * jnp.exp(c.wlhvocp * q / tlcl)
    tthes_m = jnp.where(inlow, tthes, -1e30)
    ksrc = jnp.argmax(tthes_m, axis=1)
    takek = lambda a, k: jnp.take_along_axis(a, k[:, None], 1)[:, 0]
    thesp = takek(tthes_m, ksrc)
    thbt = takek(tthbt, ksrc)
    psp = jnp.where(thesp > 0.0,
                    c.stdp * (takek(tlcl, ksrc) / thbt) ** c.cpovr,
                    9.5e4)
    thesp = jnp.maximum(thesp, 0.0)

    # -- cloud base: level just below psp (:305-328) ---------------------
    condb = (pas[:, :-1] < psp[:, None]) & (pas[:, :-1] >= PQM)
    kbot = jnp.max(jnp.where(condb, ii[:, :-1] + 1, -1), axis=1)
    kbot = jnp.where(kbot < 0, kz - 1, kbot)
    # ensure base ≥ 25 hPa above surface
    pbot = takek(pas, kbot)
    need = (pbot >= psf - PONE) | (kbot >= kz - 1)
    cond2 = pas[:, :-1] < (psf[:, None] - PONE)
    kbot2 = jnp.max(jnp.where(cond2, ii[:, :-1], -1), axis=1)
    kbot = jnp.where(need & (kbot2 >= 0), kbot2, kbot)
    kbot = jnp.clip(kbot, 2, kz - 2)

    # -- cloud top: buoyancy scan bottom-up (:337-357) -------------------
    es_env = _esliq(t)
    qs_env = 0.622 * es_env / jnp.maximum(pas - es_env, 1.0)
    ths = t * ape * jnp.exp(c.wlhvocp * qs_env / t)
    # ifbuoy: thesp > ths at some l ≤ kbot below current level;
    # scanning l from kz-1 down to 0, ktop = l+1 of the LAST (smallest l)
    # level with thesp > ths−1.5 after first positive buoyancy.
    lmask = ii <= kbot[:, None]
    buoy = lmask & (thesp[:, None] > ths)
    near = lmask & (thesp[:, None] > ths - 1.5)
    # cumulative from bottom: has there been buoyancy at or below l?
    buoy_below = jnp.flip(jnp.cumsum(jnp.flip(buoy, 1), axis=1), 1) > 0
    hit = near & buoy_below
    ktop = jnp.where(jnp.any(hit, axis=1),
                     jnp.argmax(hit, axis=1) + 1, kbot)
    ktop = jnp.minimum(ktop, kbot)                 # (:389-391)

    # -- dsp profiles from cldefi (:361-371) ------------------------------
    efi = cldefi
    dspb = ((efi - EFIMN) * SLOPBS + DSPBSS) * xsm \
        + ((efi - EFIMN) * SLOPBL + DSPBSL) * (1.0 - xsm)
    dsp0 = ((efi - EFIMN) * SLOP0S + DSP0SS) * xsm \
        + ((efi - EFIMN) * SLOP0L + DSP0SL) * (1.0 - xsm)
    dspt = ((efi - EFIMN) * SLOPTS + DSPTSS) * xsm \
        + ((efi - EFIMN) * SLOPTL + DSPTSL) * (1.0 - xsm)

    zbot = takek(z0, kbot)
    cldhgt = takek(z0, ktop) - zbot
    cldefi = jnp.where(cldhgt < ZNO,
                       AVGEFI * xsm + STEFI * (1.0 - xsm), cldefi)
    deep = cldhgt >= ZSH

    # ==== deep convection (:408-615) =====================================
    tref_ma = _tpfc(pas, thesp[:, None], t, ape)    # moist adiabat T
    therk = tref_ma * ape
    pk = pas
    pkt = takek(pk, ktop)
    pkb = takek(pk, lb * jnp.ones_like(ktop))

    # below-freezing-level reference recursion, scanning ivi from lb-1
    # down to 0 (:453-470); stop when trefk(ivi+1) ≤ 274.16
    def frz_body(carry, ivi):
        trefk_next, l0, pk0, stopped = carry
        new = ((therk[:, ivi] - therk[:, ivi + 1]) * STABD
               + trefk_next * ape[:, ivi + 1]) / ape[:, ivi]
        inloop = (ivi >= ktop) & (ivi <= lb - 1) & ~stopped
        trig = inloop & (trefk_next <= 274.16)
        stopped = stopped | trig
        take_new = inloop & ~trig
        out = jnp.where(take_new, new, t[:, ivi])
        l0 = jnp.where(take_new, ivi.astype(l0.dtype), l0)
        pk0 = jnp.where(take_new, pk[:, ivi], pk0)
        trefk_next = jnp.where(take_new, new, trefk_next)
        return (trefk_next, l0, pk0, stopped), out

    init = (takek(t, (lb * jnp.ones_like(ktop))),
            lb * jnp.ones_like(ktop), pkb,
            jnp.zeros((ncol,), bool))
    (_, l0, pk0, _), outs = jax.lax.scan(
        frz_body, init, jnp.arange(kz - 2, -1, -1))
    trefk = jnp.concatenate([jnp.flip(outs.T, 1), t[:, -1:]], axis=1)
    # above the freezing level: linear theta interpolation (:471-478)
    dthem = takek(therk, l0) - takek(trefk, l0) * takek(ape, l0)
    rdp0t = 1.0 / jnp.maximum(pk0 - pkt, 1.0)
    above = ii < l0[:, None]
    trefk = jnp.where(above & (ii >= ktop[:, None]),
                      (therk - (pk - pkt[:, None]) * dthem[:, None]
                       * rdp0t[:, None]) / ape, trefk)

    # deep reference humidity (:482-508)
    frzdeep = (pkb - pk0) > PFRZ
    dsp_up = ((pk0[:, None] - pk) * dspt[:, None]
              + (pk - pkt[:, None]) * dsp0[:, None]) \
        / jnp.maximum(pk0 - pkt, 1.0)[:, None]
    dsp_dn = ((pkb[:, None] - pk) * dsp0[:, None]
              + (pk - pk0[:, None]) * dspb[:, None]) \
        / jnp.maximum(pkb - pk0, 1.0)[:, None]
    dsp = jnp.where(ii < l0[:, None], dsp_up, dsp_dn)
    dsp = jnp.where(frzdeep[:, None], dsp, DSPC)
    psk = jnp.where(pk > PQM, pk + dsp, pk)
    apesk = (jnp.maximum(psk, 1000.0) / c.stdp) ** (-c.rovcp)
    thsk = trefk * ape
    qrefk = jnp.where(
        pk > PQM,
        c.pq0 / jnp.maximum(psk, 1000.0)
        * jnp.exp(c.c3les * (thsk - c.tzero * apesk)
                  / (thsk - c.c4les * apesk)), q)

    # enthalpy conservation, two passes (:512-549)
    lay = (ii >= ktop[:, None]) & (ii <= lb)
    tds_top = takek(tds, ktop)
    lqm_cond = pk <= PQM
    for _ in range(2):
        sumde = jnp.sum(jnp.where(
            lay, ((t - trefk) * c.cpd + (q - qrefk) * c.wlhv) * tds,
            0.0), axis=1)
        sumdp = jnp.sum(jnp.where(lay, tds, 0.0), axis=1)
        hcorr = sumde / jnp.maximum(sumdp - tds_top, 1e-10)
        # above lqm (p ≤ 200 hPa): T only; below: T and q
        above_q = lay & (ii > ktop[:, None]) & lqm_cond
        below_q = lay & (ii > ktop[:, None]) & ~lqm_cond
        trefk = jnp.where(above_q, trefk + hcorr[:, None] * c.rcpd,
                          trefk)
        tskl = trefk * ape / apesk
        dhdt = qrefk * A23M4L / (tskl - c.c4les) ** 2 + c.cpd
        trefk = jnp.where(below_q, hcorr[:, None] / dhdt + trefk, trefk)
        thskl = trefk * ape
        qrefk = jnp.where(
            below_q,
            c.pq0 / jnp.maximum(psk, 1000.0)
            * jnp.exp(c.c3les * (thskl - c.tzero * apesk)
                      / (thskl - c.c4les * apesk)), qrefk)

    # heating/moistening/precip (:556-567)
    diftl = (trefk - t) * tauk
    difql = (qrefk - q) * tauk
    avrgtl = 2.0 * t + diftl
    dentpy = 2.0 * jnp.sum(jnp.where(
        lay, (diftl * c.cpd + difql * c.wlhv) * tds / avrgtl, 0.0),
        axis=1)
    sumdp = jnp.sum(jnp.where(lay, tds, 0.0), axis=1)
    avrgt = jnp.sum(jnp.where(lay, avrgtl * tds, 0.0), axis=1) \
        / (2.0 * jnp.maximum(sumdp, 1e-10))
    preck = jnp.sum(jnp.where(lay, tds * diftl, 0.0), axis=1)

    swap = deep & ((dentpy < EPSNTP) | (preck <= 0.0))   # (:568-580)
    deep_ok = deep & ~swap

    # swap branch: reset efficiency, shrink cloud to shallow depth
    cldefi = jnp.where(swap, EFIMN * xsm + STEFI * (1.0 - xsm), cldefi)
    ztop_sw = zbot + ZSH - 1e-6
    cond_sw = z0 >= ztop_sw[:, None]
    ktop_sw = jnp.max(jnp.where(cond_sw & (ii <= lb), ii + 1, 0), axis=1)
    ktop_sw = jnp.minimum(ktop_sw, kbot - 2)
    ktop = jnp.where(swap, ktop_sw, ktop)
    cldhgt = jnp.where(swap, takek(z0, jnp.clip(ktop, 0, kz - 1)) - zbot,
                       cldhgt)

    # deep closure (:584-614)
    pthrs = cthrs / psf
    drheat = (preck * xsm + jnp.maximum(EPSP, preck - pthrs)
              * (1.0 - xsm)) * c.cpd / jnp.maximum(avrgt, 1.0)
    efi_new = EFIFC * dentpy / jnp.maximum(drheat, 1e-10)
    efi_new = (cldefi * FCP + efi_new * FCC1) * xsm + (1.0 - xsm)
    efi_new = jnp.clip(efi_new, EFIMN, 1.0)
    cldefi = jnp.where(deep_ok, efi_new, cldefi)
    fefi = EFMNT + SLOPE * (cldefi - EFIMN)
    preck_f = preck * fefi
    pratec = jnp.where(deep_ok,
                       (psf * preck_f * CPRLG) * 100.0 / dt, 0.0)
    tten = jnp.where(deep_ok[:, None] & lay, diftl * fefi[:, None] / dt,
                     0.0)
    qten = jnp.where(deep_ok[:, None] & lay, difql * fefi[:, None] / dt,
                     0.0)

    # ==== shallow convection (:624-864) ==================================
    shal = (cldhgt >= ZNO) & (ktop <= kbot - 2) & (cldhgt < ZSH) \
        & ~deep_ok
    qsatk = 0.622 * es_env / jnp.maximum(pas - es_env, 1.0)

    # kdp: model level nearest to pk(k)−65 hPa (:666-680)
    pdp = pk - PMN
    dist = jnp.abs(pk[:, None, :] - pdp[:, :, None])   # (ncol, kk, k)
    dist = dist[:, :, : kz - 1]                        # k = 1..kz-1
    # descending Fortran scan keeps the last strict improvement →
    # smallest k wins; ties favor the larger k: emulate via reversed
    # argmin on the reversed axis
    kdp = (kz - 2) - jnp.argmin(jnp.flip(dist, 2), axis=2)
    kk_idx = jnp.broadcast_to(jnp.arange(kz)[None, :], kdp.shape)
    kdp = jnp.where(kdp == kk_idx, kdp - 1, kdp)
    kdp = jnp.maximum(kdp, 0)

    # shallow first-guess top: level just above zbot+ZSH (:687-706)
    ztop_s = zbot + ZSH - 1e-6
    ltpk_s = jnp.max(jnp.where(z0 >= ztop_s[:, None], ii, 0), axis=1)
    ptpk = takek(pk, ltpk_s)
    shu_cond = pk <= PSHU
    lshu = jnp.max(jnp.where(shu_cond, ii + 1, 0), axis=1)
    ltpk_s = jnp.where(ptpk <= PSHU, lshu, ltpk_s)
    ltpk_s = jnp.clip(ltpk_s, 0, kz - 2)

    # RH-drop top ltsh (:712-716): LAST l in [ltpk+1, kbot-1] with
    # rh(kdp(l)) + RHF < rh(l)
    rh = jnp.clip(q / jnp.maximum(qsatk, 1e-12), RHMIN, RHMAX)
    rh_kdp = jnp.take_along_axis(rh, kdp, axis=1)
    cond_rh = (rh_kdp + RHF < rh) & (ii >= ltpk_s[:, None] + 1) \
        & (ii <= kbot[:, None] - 1)
    ltsh = jnp.max(jnp.where(cond_rh, ii, -1), axis=1)
    ltsh = jnp.where(ltsh < 0, kbot, ltsh)
    ktop_sh = ltsh
    ltp1 = ltsh
    cldhgt_sh = takek(z0, ktop_sh) - zbot
    shal = shal & ~((cldhgt_sh < ZNO) | (ktop_sh > kbot - 2))

    # mixing-line slope (:727-744)
    t_top = takek(t, ltp1)
    q_top = takek(q, ltp1)
    p_top = takek(pas, ltp1)
    thtpk = t_top * takek(ape, ltp1)
    tlcl_t = _tlcl(t_top, q_top, p_top)
    ptpk2 = c.stdp * (tlcl_t / thtpk) ** c.cpovr
    dpmix = ptpk2 - psp
    dpmix = jnp.where(jnp.abs(dpmix) < H3000, -H3000, dpmix)
    smix = (thtpk - thbt) / dpmix * STABS

    def mix_body(tref_next, ivi):
        new = ((pk[:, ivi] - pk[:, ivi + 1]) * smix
               + tref_next * ape[:, ivi + 1]) / ape[:, ivi]
        inloop = (ivi >= ltp1) & (ivi <= kbot)
        out = jnp.where(inloop, new, t[:, ivi])
        tref_next = jnp.where(inloop, new, t[:, ivi])
        return tref_next, out

    _, trefs_rev = jax.lax.scan(mix_body, takek(t, jnp.minimum(
        kbot + 1, kz - 1)), jnp.arange(kz - 2, -1, -1))
    trefk_s = jnp.concatenate([jnp.flip(trefs_rev.T, 1), t[:, -1:]],
                              axis=1)

    lay_s = (ii >= ltp1[:, None]) & (ii <= kbot[:, None])
    sumdt = jnp.sum(jnp.where(lay_s, (t - trefk_s) * tds, 0.0), axis=1)
    sumdp_s = jnp.sum(jnp.where(lay_s, tds, 0.0), axis=1)
    rdpsum = 1.0 / jnp.maximum(sumdp_s, 1e-10)
    tcorr = sumdt * rdpsum
    trefk_s = jnp.where(lay_s, trefk_s + tcorr[:, None], trefk_s)
    fpk = trefk_s
    fptk = takek(fpk, ltp1)

    # humidity profile sums (:765-788)
    dpkl = fpk - fptk[:, None]
    rtbar = 2.0 / (trefk_s + t)
    psum = jnp.sum(jnp.where(lay_s, dpkl * tds, 0.0), axis=1) * rdpsum
    qsum = jnp.sum(jnp.where(lay_s, q * tds, 0.0), axis=1) * rdpsum
    otsum = jnp.sum(jnp.where(lay_s, tds * rtbar, 0.0), axis=1)
    rotsum = 1.0 / jnp.maximum(otsum, 1e-10)
    potsum = jnp.sum(jnp.where(lay_s, dpkl * rtbar * tds, 0.0),
                     axis=1) * rotsum
    qotsum = jnp.sum(jnp.where(lay_s, q * rtbar * tds, 0.0),
                     axis=1) * rotsum
    dst = jnp.sum(jnp.where(lay_s, (trefk_s - t) * rtbar * tds, 0.0),
                  axis=1) * rotsum * (c.cpd / c.wlhv)

    shal = shal & (dst <= 0.0)                        # (:792-795)
    dstq = dst * EPSDN
    den = potsum - psum
    shal = shal & (-den / jnp.where(psum == 0.0, 1.0, psum) >= 0.00005)
    dqref = (qotsum - dstq - qsum) / jnp.where(den == 0.0, 1.0, den)
    shal = shal & (dqref >= 0.0)                      # (:815-818)
    qrftp = qsum - dqref * psum
    qrfkl = (fpk - fptk[:, None]) * dqref[:, None] + qrftp[:, None]
    qnew = (qrfkl - q) * tauk + q
    shal = shal & ~jnp.any(lay_s & (qnew > qsatk * STRESH), axis=1)
    # thvref: reference profile inside the layer, environment outside
    # (initialized at :656-657)
    thv_env = t * ape * (q * c.ep1 + 1.0)
    thvref = jnp.where(lay_s, trefk_s * ape * (qrfkl * c.ep1 + 1.0),
                       thv_env)
    # impossible slopes (:840-846): l runs ltp1..lbtk and references
    # thvref(l-1)
    prv = jnp.concatenate([thvref[:, :1], thvref[:, :-1]], axis=1)
    dtdeta = (prv - thvref) / jnp.maximum(tds, 1e-10)
    shal = shal & ~jnp.any(lay_s & (dtdeta < EPSTH), axis=1)

    tten = jnp.where(shal[:, None] & lay_s, (trefk_s - t) / TREL, tten)
    qten = jnp.where(shal[:, None] & lay_s, (qrfkl - q) / TREL, qten)
    ktop = jnp.where(shal, ktop_sh, jnp.where(deep_ok, ktop, kbot))

    return BMOut(tten=tten, qten=qten,
                 prate=jnp.maximum(pratec, 0.0),
                 cldefi=cldefi, kbot=kbot, ktop=ktop)


def model_cumulus_cloud(kbot, ktop, kz, ds_km):
    """Convective cloud fraction from cloud extent
    (model_cumulus_cloud, Main/cumlib/mod_cu_common.F90:128-147,
    icumcloud<=1): cldfrc = 1 − (1−clfrcv)^(1/kclth) for ktop..kbot.
    clfrcv is resolution-dependent (mod_params.F90:2441-2448)."""
    afracl, afracs = 0.25, 0.75
    dlargc, dsmalc = 100.0, 10.0
    dxtemc = min(max(ds_km, dsmalc), dlargc)
    clfrcv = afracl + (afracs - afracl) \
        * ((dlargc - dxtemc) / (dlargc - dsmalc)) ** 2
    clfrcv = min(max(clfrcv, afracl), 1.0)
    ii = jnp.arange(kz)[None, :]
    kclth = (kbot - ktop + 1)[:, None]
    inlay = (ii >= ktop[:, None]) & (ii <= kbot[:, None]) & (kclth >= 2)
    frac = 1.0 - (1.0 - clfrcv) ** (1.0 / jnp.maximum(kclth, 1))
    return jnp.where(inlay, frac, 0.0)


def clwfromt(t):
    """In-cloud liquid water content g/m3 (Share/clwfromt.inc,
    Lemus et al. 1997)."""
    tcel = t - c.tzero
    clw = 0.127 + 6.78e-3 * tcel + 1.29e-4 * tcel ** 2 \
        + 8.68e-7 * tcel ** 3
    return jnp.where(tcel < -50.0, 0.001, clw)
