"""GFS (Hong-Pan moninq) PBL scheme (ibltyp=3).

Faithful jax port of ``Main/pbllib/mod_pbl_gfs.F90`` (``moninq``
:279-903). NOTE the reference's effective behavior: after the
thermal-excess pass, line :571 ``if ( kpbl(i) >= 1 ) pblflg(i) =
.false.`` — with 1-based ``kpbl`` always ≥ 1 this unconditionally
clears ``pblflg``, so the nonlocal-K branch (:684-697), the
counter-gradient terms (:812-818) and the inverse-Prandtl block are
dead code, and ``kpbl`` is reset to 1 (:699-703): the scheme that
actually runs is a *local* Louis-type K on every interface, plus the
stratocumulus cloud-top radiatively-driven K enhancement, with
implicit tridiagonal solves. This port reproduces exactly that
behavior (the first-guess ``kpblx/hpblx`` still feed the stable-regime
Prandtl number and the diagnosed PBL height outputs).

TPU-native form: dense (ncol, kz) BOTTOM-UP columns (moninq's own
orientation); level searches are masked reductions; the Thomas solves
are batched ``lax.scan`` sweeps.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c

GOCP = c.egrav * c.rcpd
RLAM = 30.0
VK = c.vonkar
PRMAX = 4.0
DW2MIN = 0.0001
DKMIN, DKMAX = 0.0, 1000.0
RIMIN = -100.0
RBCR = 0.25
QMIN = 1.0e-8
XKZM = 1.0
TDZMIN = 1.0e-3
QLMIN = 1.0e-12
H1 = 1.0 / 3.0
CLDTIME = 500.0
XKZMU = 3.0
XKZMINV = 0.3
RLAMUN = 150.0
RENTF1, RENTF2 = 0.2, 1.0
RADFAC = 0.85
ZSTBLMAX = 2500.0
QLCR = 3.5e-5
ACTEI = 0.7


class GFSOut(NamedTuple):
    du: jax.Array      # (ncol, kz) bottom-up u tendency (m/s^2)
    dv: jax.Array
    tau: jax.Array     # T tendency (K/s)
    rtgq: jax.Array    # qv (specific humidity) tendency (1/s)
    rtgc: jax.Array    # cloud water tendency
    hpbl: jax.Array    # PBL height (m)
    kpbl: jax.Array    # PBL top level (bottom-up index)


def _tridiag(cl, cm, cu, rhs_list):
    """Batched Thomas solve (tridi2/tridin, :905-1010). cl/cm/cu are
    (ncol, n); cl[:,0] and cu[:,n-1] are unused."""
    ncol, n = cm.shape
    rhs = jnp.stack(rhs_list, axis=0)              # (nr, ncol, n)
    fk0 = 1.0 / cm[:, 0]
    au0 = fk0 * cu[:, 0]
    a0 = fk0[None] * rhs[:, :, 0]

    def fwd(carry, k):
        aup, ap = carry
        fk = 1.0 / (cm[:, k] - cl[:, k] * aup)
        au_k = fk * cu[:, k]
        a_k = fk[None] * (rhs[:, :, k] - cl[None, :, k] * ap)
        return (au_k, a_k), (au_k, a_k)

    _, (aus, avals) = jax.lax.scan(fwd, (au0, a0), jnp.arange(1, n))
    au = jnp.concatenate([au0[None], aus], axis=0)         # (n, ncol)
    a = jnp.concatenate([a0[None], avals], axis=0)         # (n,nr,ncol)

    def bwd(anext, k):
        ak = a[k] - au[k][None] * anext
        return ak, ak

    _, asol = jax.lax.scan(bwd, a[n - 1], jnp.arange(n - 2, -1, -1))
    full = jnp.concatenate([asol[::-1], a[n - 1][None]], axis=0)
    return [full[:, r, :].T for r in range(len(rhs_list))]


def moninq(u1, v1, t1, q1, ql1, prsl, prsi, del_, prslk, psk, phil,
           phii, thraten, heat, evap, stress, rbsoil, spd1, dt
           ) -> GFSOut:
    """Hong-Pan PBL on (ncol, kz) BOTTOM-UP columns.

    u1/v1/t1: winds + T; q1 water vapor / ql1 cloud water (specific
    humidity); prsl/prsi mid/interface p (cb); del_ layer thickness
    (cb); prslk Exner; psk surface Exner; phil/phii geopotentials
    (m²/s²); thraten radiative theta tendency (K/s); heat/evap
    kinematic surface fluxes (K·m/s, m/s·kg/kg); stress = ustar²;
    rbsoil surface bulk Richardson; spd1 lowest-level wind speed.
    """
    ncol, km = t1.shape
    km1 = km - 1
    kmpbl = km // 2
    ii = jnp.arange(km)[None, :]
    kidx = ii[:, :km1]
    rdt = 1.0 / dt
    take = lambda a, k: jnp.take_along_axis(a, k[:, None], 1)[:, 0]

    zi = phii * c.regrav                      # (ncol, km+1)
    zl = phil * c.regrav
    rdzt = 1.0 / (zl[:, 1:] - zl[:, :-1])     # (ncol, km1)

    # background diffusivities (:369-389)
    tem1 = 1.0 - prsi[:, 1:km] / prsi[:, :1]
    tem1 = jnp.minimum(tem1 * tem1 * 10.0, 25.0)
    xkzo = XKZM * jnp.minimum(1.0, jnp.exp(-tem1))
    ptem = prsi[:, 1:km] / prsi[:, :1]
    # the reference freezes ptem1 = prsi at the last level with
    # ptem ≥ 0.2 and decays relative to it; approximate the anchor
    # with 0.2·psfc (equal at the crossing)
    tem1m = 1.0 - prsi[:, 1:km] / (0.2 * prsi[:, :1])
    tem1m = jnp.minimum(tem1m * tem1m * 5.0, 25.0)
    xkzmo = jnp.where(ptem >= 0.2, XKZMU,
                      XKZMU * jnp.minimum(1.0, jnp.exp(-tem1m)))
    # inversion-layer cap (:391-400)
    dtdz = (t1[:, 1:] - t1[:, :-1]) * rdzt
    inv = (zi[:, 1:km] > 250.0) & (dtdz > 1.0e-5) & (kidx < kmpbl)
    xkzo = jnp.where(inv, jnp.minimum(xkzo, XKZMINV), xkzo)

    # thermodynamic fields (:425-437)
    theta = t1 * psk[:, None] / prslk
    qlx = jnp.maximum(ql1, QLMIN)
    qv = jnp.maximum(q1, QMIN)
    qtx = qv + qlx
    thetae = theta * (1.0 + c.wlhv * qv / (c.cpd * t1))
    thvx = theta * (1.0 + c.ep1 * qv - qlx)
    thlvx = (theta - (c.wlhv / c.cpd) * qlx) * (1.0 + c.ep1 * qtx)

    radx = (zi[:, 1:km] - zi[:, :km1]) * thraten[:, :km1]
    cond_l = zl[:, :km1] >= ZSTBLMAX          # lcld (:453-460)
    lcld = jnp.where(jnp.any(cond_l, axis=1),
                     jnp.argmax(cond_l, axis=1), km1 - 1)

    bf = (thvx[:, 1:] - thvx[:, :-1]) * rdzt
    govrth = c.egrav / theta[:, 0]
    beta = dt / (zi[:, 1] - zi[:, 0])
    thermal = thvx[:, 0]

    # first-guess PBL height from bulk Richardson (:478-507)
    spdk2 = jnp.maximum(u1 ** 2 + v1 ** 2, 1.0)
    rb = (thvx - thermal[:, None]) * (c.egrav * zl / thvx[:, :1]) / spdk2
    scanr = (ii >= 1) & (ii <= kmpbl - 1)
    crossed = scanr & (rb > RBCR)
    kpblx = jnp.where(jnp.any(crossed, axis=1),
                      jnp.argmax(crossed, axis=1), kmpbl - 1)
    rbup = take(rb, kpblx)
    rbdn = jnp.where(kpblx >= 2, take(rb, jnp.maximum(kpblx - 1, 1)),
                     rbsoil)
    rbint = jnp.where(rbdn >= RBCR, 0.0,
                      jnp.where(rbup <= RBCR, 1.0,
                                (RBCR - rbdn)
                                / jnp.maximum(rbup - rbdn, 1e-12)))
    km_ = jnp.maximum(kpblx - 1, 0)
    hpblx = take(zl, km_) + rbint * (take(zl, kpblx) - take(zl, km_))
    kpblx = jnp.maximum(jnp.where(hpblx < take(zi, kpblx),
                                  kpblx - 1, kpblx), 0)

    # stratocumulus detection (:575-673)
    scuflg = jnp.ones((ncol,), bool)
    inrange = (kidx <= lcld[:, None]) & (kidx < kmpbl)
    hascld = inrange & (qlx[:, :km1] >= QLCR)
    kcld = jnp.max(jnp.where(hascld, kidx, -1), axis=1)
    scuflg = scuflg & (kcld >= 0)
    kcld = jnp.maximum(kcld, 0)
    # krad: min radx in the contiguous cloud deck extending down
    # from kcld (:594-607)
    belowc = kidx <= kcld[:, None]
    iscld = qlx[:, :km1] >= QLCR
    contig = belowc & (jnp.flip(jnp.cumprod(
        jnp.flip(jnp.where(belowc, iscld, True), 1), axis=1), 1) > 0)
    radm = jnp.where(contig, radx, 1e30)
    krad = jnp.argmin(radm, axis=1)
    radmin = jnp.min(radm, axis=1)
    scuflg = scuflg & (krad >= 1) & (radmin < 0.0)
    # icld: contiguous cloudy layers at/below krad, k ≥ 2 (:615-628)
    belowr = (kidx <= krad[:, None]) & (kidx >= 1)
    contig_r = belowr & (jnp.flip(jnp.cumprod(
        jnp.flip(jnp.where(belowr, iscld, True), 1), axis=1), 1) > 0)
    icld = jnp.sum(contig_r, axis=1)
    scuflg = scuflg & (icld >= 1)
    hrad = take(zi, krad + 1)
    scuflg = scuflg & (hrad >= zi[:, 1])
    temk = take(zi, krad + 1) - take(zi, krad)
    thlvx1 = take(thlvx, krad) + CLDTIME * radmin / temk
    belowk = kidx <= krad[:, None]
    okd = thlvx1[:, None] <= thlvx[:, :km1]
    contig_d = belowk & (jnp.flip(jnp.cumprod(
        jnp.flip(jnp.where(belowk, okd, True), 1), axis=1), 1) > 0)
    zd = jnp.sum(jnp.where(contig_d, zi[:, 1:km] - zi[:, :km1], 0.0),
                 axis=1)
    kk = jnp.maximum(0, krad + 1 - icld)
    zdd = hrad - take(zi, kk)
    zd = jnp.minimum(jnp.maximum(zd, zdd), hrad)
    vrad = (govrth * zd * jnp.maximum(-radmin, 0.0)) ** H1

    # local-K everywhere (:704-739; kpbl == 1 per the :571 reset)
    rdz = rdzt
    ti = 2.0 / (t1[:, :-1] + t1[:, 1:])
    dw2 = (u1[:, :-1] - u1[:, 1:]) ** 2 + (v1[:, :-1] - v1[:, 1:]) ** 2
    shr2 = jnp.maximum(dw2, DW2MIN) * rdz * rdz
    bvf2 = c.egrav * bf * ti
    ri = jnp.maximum(bvf2 / shr2, RIMIN)
    zk = VK * zi[:, 1:km]
    rl2u = zk * RLAMUN / (RLAMUN + zk)
    dk_u = rl2u * rl2u * jnp.sqrt(shr2)
    sri = jnp.sqrt(jnp.maximum(-ri, 0.0))
    dku_un = xkzmo + dk_u * (1.0 + 8.0 * (-ri) / (1.0 + 1.746 * sri))
    dkt_un = xkzo + dk_u * (1.0 + 8.0 * (-ri) / (1.0 + 1.286 * sri))
    rl2s = zk * RLAM / (RLAM + zk)
    dk_s = rl2s * rl2s * jnp.sqrt(shr2)
    tem1s = dk_s / (1.0 + 5.0 * ri) ** 2
    prnum = jnp.where(kidx >= kpblx[:, None],
                      jnp.minimum(1.0 + 2.1 * ri, PRMAX), 1.0)
    dku = jnp.where(ri < 0.0, dku_un, xkzmo + tem1s * prnum)
    dkt = jnp.where(ri < 0.0, dkt_un, xkzo + tem1s)
    dku = jnp.clip(dku, DKMIN, DKMAX)
    dkt = jnp.clip(dkt, DKMIN, DKMAX)

    # cloud-top driven diffusion (:743-790)
    kradp = jnp.minimum(krad + 1, km - 1)
    te = take(thetae, krad) - take(thetae, kradp)
    tq = take(qtx, krad) - take(qtx, kradp)
    cteit = jnp.where((te > 0.0) & (tq > 0.0),
                      c.cpd * te / (c.wlhv * jnp.maximum(tq, 1e-12)),
                      0.0)
    rent = jnp.where(cteit > ACTEI, RENTF2, RENTF1)
    bfk = jnp.maximum(take(bf, jnp.minimum(krad, km1 - 1)), TDZMIN)
    ckt_rad = -rent * radmin / bfk
    tem1z = hrad - zd
    tem2 = zi[:, 1:km] - tem1z[:, None]
    ptem_c = jnp.minimum(tem2 / jnp.maximum(zd[:, None], 1e-10), 1.0)
    ptem_c = tem2 * ptem_c * jnp.sqrt(jnp.maximum(1.0 - ptem_c, 0.0))
    ckt_prof = jnp.clip(RADFAC * VK * vrad[:, None] * ptem_c,
                        DKMIN, DKMAX)
    below_rad = kidx < krad[:, None]
    ckt = jnp.where(below_rad & (tem2 > 0.0), ckt_prof, 0.0)
    ckt = jnp.where(kidx == krad[:, None], ckt_rad[:, None], ckt)
    cku = jnp.where(kidx == krad[:, None], ckt, 0.75 * ckt)
    scu2 = scuflg[:, None] & (kidx < kmpbl)
    dkt = jnp.minimum(jnp.where(scu2, dkt + ckt, dkt), DKMAX)
    dku = jnp.minimum(jnp.where(scu2, dku + cku, dku), DKMAX)

    # heat/moisture implicit solve (:792-863; counter-gradient terms
    # are dead code per the :571 reset)
    dtodsd = dt / del_[:, :km1]
    dtodsu = dt / del_[:, 1:]
    dsig = prsl[:, :km1] - prsl[:, 1:]
    tem1d = dsig * dkt * rdz
    dsdzt = tem1d * GOCP
    dsdz2 = tem1d * rdz
    au = -dtodsd * dsdz2
    al = -dtodsu * dsdz2
    ad = jnp.ones((ncol, km), t1.dtype)
    ad = ad.at[:, 1:].set(1.0 - al)
    ad = ad.at[:, :km1].add(-au)
    a1 = t1.at[:, 0].add(beta * heat)
    a1 = a1.at[:, :km1].add(dtodsd * dsdzt)
    a1 = a1.at[:, 1:].add(-dtodsu * dsdzt)
    a2 = q1.at[:, 0].add(beta * evap)
    cl = jnp.concatenate([jnp.zeros((ncol, 1), al.dtype), al], axis=1)
    cu_ = jnp.concatenate([au, jnp.zeros((ncol, 1), au.dtype)], axis=1)
    t_new, q_new, qc_new = _tridiag(cl, ad, cu_, [a1, a2, ql1])
    tau = (t_new - t1) * rdt
    rtgq = (q_new - q1) * rdt
    rtgc = (qc_new - ql1) * rdt

    # momentum implicit solve (:864-897)
    dsdz2m = dsig * dku * rdz * rdz
    aum = -dtodsd * dsdz2m
    alm = -dtodsu * dsdz2m
    adm = jnp.ones((ncol, km), t1.dtype)
    adm = adm.at[:, 0].add(beta * stress / jnp.maximum(spd1, 0.1))
    adm = adm.at[:, 1:].set(1.0 - alm)
    adm = adm.at[:, :km1].add(-aum)
    clm = jnp.concatenate([jnp.zeros((ncol, 1), alm.dtype), alm],
                          axis=1)
    cum = jnp.concatenate([aum, jnp.zeros((ncol, 1), aum.dtype)],
                          axis=1)
    u_new, v_new = _tridiag(clm, adm, cum, [u1, v1])
    du = (u_new - u1) * rdt
    dv = (v_new - v1) * rdt

    return GFSOut(du=du, dv=dv, tau=tau, rtgq=rtgq, rtgc=rtgc,
                  hpbl=hpblx, kpbl=kpblx)
