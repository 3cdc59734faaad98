"""Mellor-Yamada-Janjic level-2.5 PBL (ibltyp=4) — re-derived
TPU-first from the reference ``Main/pbllib/mod_pbl_myj.F90:177``
(Janjic 2002, NCEP Office Note 437).

Prognoses q² = 2·TKE on the kz model layers: mixing length from the
Blackadar/Janjic blend (``mixlen`` :522), production/dissipation by the
two-Newton-iteration equilibrium update (``prodq2`` :655), exchange
coefficients from the level-2.5 stability functions (``difcof`` :783),
then implicit vertical diffusion of q², scalars (θ_e-like moist entropy
variable, specific humidity, cloud water/ice) and momentum (``vdifq`` /
``vdifh`` / ``vdifv`` :836-996).

TPU re-design: the per-column Fortran loops become dense whole-grid
array ops; every custom forward-elimination/back-substitution recursion
is a batched ``lax.scan`` along k over the (iy, jx) plane. The
level-index searches (PBL top ``lpbl``) become masked argmax reductions.

Deviation (documented): the reference takes the surface exchange
conductances from BATS' ``ram1/rah1`` resistances; this port derives
them from the stored surface drag (akms = akhs = uvdrag/ρ_sfc) and
ustar from the drag law — identical for the ocean-flux schemes and
within the iteration tolerance of BATS' resistances over land.

Index conventions: k=0 is the model top; layer arrays (kz, iy, jx);
``z`` interface heights (kz+1, iy, jx) ASL; gm/gh/el/akm/akh live on
the kz-1 interior interfaces (bottom of layer k = interface k+1).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c
from ...utils.thermo import pfqsat

MYJTKEMIN = 1.0e-3
# constants (mod_pbl_myj.F90:49-158)
EPSQ2 = 0.2
EPS1 = 1.0e-12
EPS2 = 0.0
EPSL = 0.32
EPSRU = 1.0e-7
EPSRS = 1.0e-7
EPSTRB = 1.0e-24
FH = 1.01
ALPH = 0.30
BETA = 1.0 / 273.0
EL0MAX = 1000.0
EL0MIN = 1.0
ELFC = 0.23 * 0.5
A1 = 0.659888514560862645
AXX = 0.6574209922667784586
B1 = 11.87799326209552761
B2 = 7.226971804046074028
C1 = 0.000830955950095854396
ELZ0 = 0.0
ESQ = 5.0
SEAFC = 0.98
BTG = BETA * c.egrav
RB1 = 1.0 / B1
ADNH = 9.0 * A1 * AXX * AXX * (12.0 * A1 + 3.0 * B2) * BTG * BTG
ADNM = 18.0 * A1 * A1 * AXX * (B2 - 3.0 * AXX) * BTG
ANMH = -9.0 * A1 * AXX * AXX * BTG * BTG
ANMM = -3.0 * A1 * AXX * (3.0 * AXX + 3.0 * B2 * C1 + 18.0 * A1 * C1
                          - B2) * BTG
BDNH = 3.0 * AXX * (7.0 * A1 + B2) * BTG
BDNM = 6.0 * A1 * A1
BEQH = AXX * B1 * BTG + 3.0 * AXX * (7.0 * A1 + B2) * BTG
BEQM = -A1 * B1 * (1.0 - 3.0 * C1) + 6.0 * A1 * A1
BNMH = -AXX * BTG
BNMM = A1 * (1.0 - 3.0 * C1)
BSHH = 9.0 * A1 * AXX * AXX * BTG
BSHM = 18.0 * A1 * A1 * AXX * C1
BSMH = -3.0 * A1 * AXX * (3.0 * AXX + 3.0 * B2 * C1 + 12.0 * A1 * C1
                          - B2) * BTG
CESH = AXX
CESM = A1 * (1.0 - 3.0 * C1)
AEQH = 9.0 * A1 * AXX * AXX * B1 * BTG * BTG \
    + 9.0 * A1 * AXX * AXX * (12.0 * A1 + 3.0 * B2) * BTG * BTG
AEQM = 3.0 * A1 * AXX * B1 * (3.0 * AXX + 3.0 * B2 * C1
                              + 18.0 * A1 * C1 - B2) * BTG \
    + 18.0 * A1 * A1 * AXX * (B2 - 3.0 * AXX) * BTG
REQU = -AEQH / AEQM
EPSGH = 1.0e-9
EPSGM = REQU * EPSGH
UBRYL = (18.0 * REQU * A1 * A1 * AXX * B2 * C1 * BTG
         + 9.0 * A1 * AXX * AXX * B2 * BTG * BTG) \
    / (REQU * ADNM + ADNH)
UBRY = (1.0 + EPSRS) * UBRYL
UBRY3 = 3.0 * UBRY
AUBH = 27.0 * A1 * AXX * AXX * B2 * BTG * BTG - ADNH * UBRY3
AUBM = 54.0 * A1 * A1 * AXX * B2 * C1 * BTG - ADNM * UBRY3
BUBH = (9.0 * A1 * AXX + 3.0 * AXX * B2) * BTG - BDNH * UBRY3
BUBM = 18.0 * A1 * A1 * C1 - BDNM * UBRY3
CUBR = 1.0 - UBRY3
RCUBR = 1.0 / CUBR


class MYJOut(NamedTuple):
    uten: jax.Array
    vten: jax.Array
    tten: jax.Array
    qvten: jax.Array
    qcten: jax.Array
    qiten: jax.Array
    tkepbl: jax.Array    # (kz,iy,jx) updated TKE = q²/2
    kpbl: jax.Array
    zpbl: jax.Array
    thz0: jax.Array      # updated surface-layer state
    qz0: jax.Array


def _mixlen(u, v, t, the, q, cwm, q2, z, elocp):
    """Level 2.5 mixing length (mixlen, mod_pbl_myj.F90:522-651)."""
    kz = t.shape[0]
    km1 = kz - 1
    karr = jnp.arange(km1)[:, None, None]

    # PBL top: largest interior k with q2 <= epsq2·fh scanning up from
    # the bottom (:542-553); none → top (0)
    low = q2[:km1] <= EPSQ2 * FH
    anyl = jnp.any(low, axis=0)
    lpbl = jnp.where(anyl,
                     (km1 - 1) - jnp.argmax(jnp.flip(low, 0), axis=0),
                     0).astype(jnp.int32)
    zpbl = jnp.take_along_axis(z, (lpbl + 1)[None], axis=0)[0] - z[kz]

    dth = the[:-1] - the[1:]
    rdz = 2.0 / (z[:km1] - z[2:])
    gml = ((u[:-1] - u[1:]) ** 2 + (v[:-1] - v[1:]) ** 2) * rdz * rdz
    gm = jnp.maximum(gml, EPSGM)
    tem = 0.5 * (t[:-1] + t[1:])
    thm = 0.5 * (the[:-1] + the[1:])
    a = thm * c.ep1
    b = (elocp / tem - 1.0 - c.ep1) * thm
    ghl = (dth * ((q[:-1] + q[1:] + cwm[:-1] + cwm[1:]) * (0.5 * c.ep1)
                  + 1.0)
           + (q[:-1] - q[1:] + cwm[:-1] - cwm[1:]) * a
           + (cwm[:-1] - cwm[1:]) * b) * rdz
    gh = jnp.where(jnp.abs(ghl) <= EPSGH, EPSGH, ghl)

    # elm: stability-limited mixing length (:586-608)
    stable_cap = (gh >= EPSGH) & (gm / gh <= REQU)
    aubr = (AUBM * gm + AUBH * gh) * gh
    bubr = BUBM * gm + BUBH * gh
    qol2st = (-0.5 * bubr + jnp.sqrt(jnp.maximum(
        bubr * bubr * 0.25 - aubr * CUBR, 0.0))) * RCUBR
    elm_st = jnp.sqrt(jnp.maximum(q2[:km1] / jnp.maximum(qol2st, EPS1),
                                  0.0))
    aden = (ADNM * gm + ADNH * gh) * gh
    bden = BDNM * gm + BDNH * gh
    qol2un = -0.5 * bden + jnp.sqrt(jnp.maximum(
        bden * bden * 0.25 - aden, 0.0))
    elm_un = jnp.sqrt(jnp.maximum(q2[:km1] / (qol2un + EPSRU), 0.0))
    elm = jnp.where(gh >= EPSGH,
                    jnp.where(stable_cap, EPSL,
                              jnp.maximum(elm_st, EPSL)),
                    jnp.maximum(elm_un, EPSL))

    # Blackadar asymptotic length from the q-weighted height integral
    q1 = jnp.where(jnp.arange(kz)[:, None, None] >= lpbl[None],
                   jnp.sqrt(q2), 0.0)
    qdzl = (q1[:-1] + q1[1:]) * (z[1:kz] - z[2:])
    szq = jnp.sum((z[1:kz] + z[2:] - 2.0 * z[kz][None]) * qdzl, axis=0)
    sq = jnp.sum(qdzl, axis=0)
    el0 = jnp.clip(ALPH * szq * 0.5 / jnp.maximum(sq, 1e-20),
                   EL0MIN, EL0MAX)

    # free atmosphere above the PBL top vs surface-layer blend inside
    el_above = jnp.minimum((z[:km1] - z[2:]) * ELFC, elm)
    vkrmz = (z[1:kz] - z[kz][None]) * c.vonkar
    el_in = jnp.minimum(vkrmz / (vkrmz / el0[None] + 1.0), elm)
    el = jnp.where(karr < lpbl[None], el_above, el_in)
    rel = el / jnp.maximum(elm, 1e-20)
    # 1-2-1 smoothing inside the PBL (:647-650)
    relm = jnp.concatenate([rel[:1], rel[:-1]], axis=0)
    relp = jnp.concatenate([rel[1:], rel[-1:]], axis=0)
    srel = jnp.minimum(((relm + relp) * 0.5 + rel) * 0.5, rel)
    smooth = (karr > lpbl[None]) & (karr <= kz - 3)
    el = jnp.where(smooth, jnp.maximum(srel * elm, EPSL), el)
    return gm, gh, el, lpbl, zpbl


def _prodq2(dt, ustar, gm, gh, el, q2):
    """TKE production/dissipation (prodq2, mod_pbl_myj.F90:655-779)."""
    aequ = (AEQM * gm + AEQH * gh) * gh
    bequ = BEQM * gm + BEQH * gh
    eqol2 = -0.5 * bequ + jnp.sqrt(jnp.maximum(
        bequ * bequ * 0.25 - aequ, 0.0))
    noturb = ((gm + gh * gh <= EPSTRB)
              | ((gh >= EPSGH) & (gm / gh <= REQU))
              | (eqol2 <= EPS2))
    anum = (ANMM * gm + ANMH * gh) * gh
    bnum = BNMM * gm + BNMH * gh
    aden = (ADNM * gm + ADNH * gh) * gh
    bden = BDNM * gm + BDNH * gh
    arhs = -(anum * bden - bnum * aden) * 2.0
    brhs = -anum * 4.0
    crhs = -bnum * 2.0
    dloq1 = el / jnp.sqrt(jnp.maximum(q2[:-1], 1e-20))
    eqol2s = jnp.maximum(eqol2, EPS1)
    eloq21 = 1.0 / eqol2s
    eloq11 = jnp.sqrt(eloq21)
    eloq31 = eloq21 * eloq11
    eloq41 = eloq21 * eloq21
    eloq51 = eloq21 * eloq31
    rden1 = 1.0 / (aden * eloq41 + bden * eloq21 + 1.0)
    rhsp1 = (arhs * eloq51 + brhs * eloq31 + crhs * eloq11) \
        * rden1 * rden1
    eloq12 = jnp.maximum(
        eloq11 + (dloq1 - eloq11) * jnp.exp(rhsp1 * dt), EPS1)
    eloq22 = eloq12 * eloq12
    eloq32 = eloq22 * eloq12
    eloq42 = eloq22 * eloq22
    eloq52 = eloq22 * eloq32
    rden2 = 1.0 / (aden * eloq42 + bden * eloq22 + 1.0)
    rhs2 = -(anum * eloq42 + bnum * eloq22) * rden2 + RB1
    rhsp2 = (arhs * eloq52 + brhs * eloq32 + crhs * eloq12) \
        * rden2 * rden2
    rhst2 = rhs2 / rhsp2
    eloq13 = jnp.maximum(
        eloq12 - rhst2 + (rhst2 + dloq1 - eloq12)
        * jnp.exp(rhsp2 * dt), EPS1)
    q2new = jnp.maximum(el * el / (eloq13 * eloq13), EPSQ2)
    el_new = jnp.where(q2new == EPSQ2, EPSL, el)
    q2i = jnp.where(noturb, EPSQ2, q2new)
    el_i = jnp.where(noturb, EPSL, el_new)
    q2out = jnp.concatenate(
        [q2i, jnp.maximum(B1 ** (2.0 / 3.0) * ustar * ustar,
                          EPSQ2)[None]], axis=0)
    return q2out, el_i


def _difcof(gm, gh, el, q2, z):
    """Exchange coefficients (difcof, mod_pbl_myj.F90:783-832)."""
    eloq2 = el * el / jnp.maximum(q2[:-1], 1e-20)
    eloq4 = eloq2 * eloq2
    aden = (ADNM * gm + ADNH * gh) * gh
    bden = BDNM * gm + BDNH * gh
    besm = BSMH * gh
    besh = BSHM * gm + BSHH * gh
    rden = 1.0 / (aden * eloq4 + bden * eloq2 + 1.0)
    esm = (besm * eloq2 + CESM) * rden
    esh = (besh * eloq2 + CESH) * rden
    rdz = 2.0 / (z[:-2] - z[2:])
    elqdz = el * jnp.sqrt(jnp.maximum(q2[:-1], 0.0)) * rdz
    return elqdz * esm, elqdz * esh


def _vdifq(dt, q2, el, z):
    """Implicit TKE diffusion (vdifq, mod_pbl_myj.F90:836-877)."""
    kz = q2.shape[0]
    km2 = kz - 2
    dtoz = 2.0 * dt / (z[:km2] - z[2:kz])
    akq = jnp.sqrt(0.5 * (q2[:km2] + q2[1:km2 + 1])) \
        * (el[:km2] + el[1:km2 + 1]) * (0.5 * ESQ) \
        / (z[1:km2 + 1] - z[2:kz])
    cr = -dtoz * akq

    def fwd(carry, k):
        cm_p, rs_p = carry
        cf = -dtoz[k] * akq[k - 1] / cm_p
        cm = -cr[k - 1] * cf + (akq[k - 1] + akq[k]) * dtoz[k] + 1.0
        rs = -rs_p * cf + q2[k]
        return (cm, rs), (cm, rs)

    cm0 = dtoz[0] * akq[0] + 1.0
    rs0 = q2[0]
    _, (cms, rss) = jax.lax.scan(fwd, (cm0, rs0), jnp.arange(1, km2))
    cm = jnp.concatenate([cm0[None], cms], axis=0)
    rs = jnp.concatenate([rs0[None], rss], axis=0)

    # reference dtozs spans zhk(kzm1)-zhk(kzp1): the two lowest layers
    dtozs = 2.0 * dt / (z[kz - 2] - z[kz])
    akqs = jnp.sqrt(0.5 * (q2[kz - 2] + q2[kz - 1])) \
        * (el[kz - 2] + ELZ0) * (0.5 * ESQ) / (z[kz - 1] - z[kz])
    cf = -dtozs * akq[km2 - 1] / cm[km2 - 1]
    q2_bot = (dtozs * akqs * q2[kz - 1] - rs[km2 - 1] * cf
              + q2[kz - 2]) / ((akq[km2 - 1] + akqs) * dtozs
                               - cr[km2 - 1] * cf + 1.0)

    def bwd(qnext, k):
        qk = (-cr[k] * qnext + rs[k]) / cm[k]
        return qk, qk

    _, qs = jax.lax.scan(bwd, q2_bot, jnp.arange(km2 - 1, -1, -1))
    q2i = jnp.flip(qs, axis=0)
    return jnp.concatenate([q2i, q2_bot[None], q2[kz - 1:]], axis=0)


def _vdifh(dt, sz0_list, rkhs_dens, clow_list, species, rkh, zhk, rho):
    """Implicit scalar diffusion, ρ-weighted (vdifh,
    mod_pbl_myj.F90:881-948); ct=0 so the countergradient terms vanish.
    species: list of (kz,iy,jx); sz0/clow: per-species surface values."""
    kz = species[0].shape[0]
    km1 = kz - 1
    dtoz = dt / (zhk[:km1] - zhk[1:kz])
    cr = -dtoz * rkh

    def fwd(carry, k):
        cm_p, rs_p = carry
        cf = -dtoz[k] * rkh[k - 1] / cm_p
        cm = -cr[k - 1] * cf + (rkh[k - 1] + rkh[k]) * dtoz[k] + rho[k]
        rs = tuple(-rp * cf + s[k] * rho[k]
                   for rp, s in zip(rs_p, species))
        return (cm, rs), (cm, rs)

    cm0 = dtoz[0] * rkh[0] + rho[0]
    rs0 = tuple(s[0] * rho[0] for s in species)
    _, (cms, rss) = jax.lax.scan(fwd, (cm0, rs0), jnp.arange(1, km1))
    cm = jnp.concatenate([cm0[None], cms], axis=0)
    rs = tuple(jnp.concatenate([r0[None], r], axis=0)
               for r0, r in zip(rs0, rss))

    dtozs = dt / (zhk[kz - 1] - zhk[kz])
    rkhh = rkh[km1 - 1]
    cf = -dtozs * rkhh / cm[km1 - 1]
    cmb = cr[km1 - 1] * cf
    bots = []
    for m, (s, sz0, cl) in enumerate(zip(species, sz0_list, clow_list)):
        rkss = rkhs_dens * cl
        cmsb = -cmb + (rkhh + rkss) * dtozs + rho[kz - 1]
        rssb = -rs[m][km1 - 1] * cf + s[kz - 1] * rho[kz - 1]
        bots.append((dtozs * rkss * sz0 + rssb) / cmsb)

    outs = []
    for m, bot in enumerate(bots):
        def bwd(snext, k, m=m):
            sk = (-cr[k] * snext + rs[m][k]) / cm[k]
            return sk, sk
        _, ss = jax.lax.scan(bwd, bot, jnp.arange(km1 - 1, -1, -1))
        outs.append(jnp.concatenate(
            [jnp.flip(ss, axis=0), bot[None]], axis=0))
    return outs


def _vdifv(dt, uz0, vz0, rkms_dens, u, v, rkm, z, rho):
    """Implicit momentum diffusion (vdifv, mod_pbl_myj.F90:952-996)."""
    kz = u.shape[0]
    km1 = kz - 1
    dtoz = dt / (z[:km1] - z[1:kz])
    cr = -dtoz * rkm

    def fwd(carry, k):
        cm_p, ru_p, rv_p = carry
        cf = -dtoz[k] * rkm[k - 1] / cm_p
        cm = -cr[k - 1] * cf + (rkm[k - 1] + rkm[k]) * dtoz[k] + rho[k]
        ru = -ru_p * cf + u[k] * rho[k]
        rv = -rv_p * cf + v[k] * rho[k]
        return (cm, ru, rv), (cm, ru, rv)

    cm0 = dtoz[0] * rkm[0] + rho[0]
    _, (cms, rus, rvs) = jax.lax.scan(
        fwd, (cm0, u[0] * rho[0], v[0] * rho[0]), jnp.arange(1, km1))
    cm = jnp.concatenate([cm0[None], cms], axis=0)
    ru = jnp.concatenate([(u[0] * rho[0])[None], rus], axis=0)
    rv = jnp.concatenate([(v[0] * rho[0])[None], rvs], axis=0)

    dtozs = dt / (z[kz - 1] - z[kz])
    rkmh = rkm[km1 - 1]
    cf = -dtozs * rkmh / cm[km1 - 1]
    rcmvb = 1.0 / ((rkmh + rkms_dens) * dtozs - cr[km1 - 1] * cf
                   + rho[kz - 1])
    dtozak = dtozs * rkms_dens
    u_bot = (dtozak * uz0 - ru[km1 - 1] * cf
             + u[kz - 1] * rho[kz - 1]) * rcmvb
    v_bot = (dtozak * vz0 - rv[km1 - 1] * cf
             + v[kz - 1] * rho[kz - 1]) * rcmvb

    def bwd(carry, k):
        un, vn = carry
        uk = (-cr[k] * un + ru[k]) / cm[k]
        vk = (-cr[k] * vn + rv[k]) / cm[k]
        return (uk, vk), (uk, vk)

    _, (us, vs) = jax.lax.scan(bwd, (u_bot, v_bot),
                               jnp.arange(km1 - 1, -1, -1))
    u_new = jnp.concatenate([jnp.flip(us, axis=0), u_bot[None]], axis=0)
    v_new = jnp.concatenate([jnp.flip(vs, axis=0), v_bot[None]], axis=0)
    return u_new, v_new


def myjpbl(t, qv, qc, qi, u, v, zq, ht, patm, patmf, tke, tg, q2m,
           uvdrag, lndmsk, thz0, qz0, dt, five_species: bool = False,
           first: bool = False):
    """One MYJ PBL step over the dense grid (myjpbl,
    mod_pbl_myj.F90:177-518). qv/qc/qi are mixing ratios; tke is the
    (kz,…) PBL TKE (q²/2); thz0/qz0 the persistent surface-layer state.
    Returns uncoupled tendencies (MYJOut)."""
    kz = t.shape[0]
    elocp = c.wlhv / c.cpd          # eliwv/cpd (reference elocp)
    rdt = 1.0 / dt

    zint = zq + (ht * c.regrav)[None]
    exner = (patm / c.stdp) ** c.rovcp
    ape = 1.0 / exner
    th = t * ape
    cwm = qc + (qi if five_species else 0.0)
    the = (cwm * (-elocp / t) + 1.0) * th
    qk = qv / (1.0 + qv)                     # specific humidity
    q2 = 2.0 * jnp.maximum(tke, MYJTKEMIN)

    rho = patm / (c.rgas * t * (1.0 + c.ep1 * qk - cwm))
    rhoxsf = patmf[kz] / (c.rgas * t[kz - 1])
    akms = uvdrag / rhoxsf
    akhs = akms
    spd = jnp.sqrt(u[kz - 1] ** 2 + v[kz - 1] ** 2)
    ustar = jnp.maximum(jnp.sqrt(uvdrag * spd / rhoxsf), 0.07)

    gm, gh, el, lpbl, zpbl = _mixlen(u, v, t, the, qk, cwm, q2, zint,
                                     elocp)
    q2, el = _prodq2(dt, ustar, gm, gh, el, q2)
    akm, akh = _difcof(gm, gh, el, q2, zint)
    q2 = _vdifq(dt, q2, el, zint)
    q2 = jnp.maximum(q2, EPSQ2)
    tke_new = 0.5 * q2

    # ---- surface-layer state (:351-434) -------------------------------
    psfc = patmf[kz]
    rexnsfc = (c.stdp / psfc) ** c.rovcp
    thsk = tg * rexnsfc
    tha = t[kz - 1] * ape[kz - 1]
    qsfc_lnd = q2m / (1.0 + q2m)
    qsfc_ocn = SEAFC * pfqsat(tg, psfc)
    # land: relax toward lowest-layer theta; ocean: molecular-sublayer
    # weights collapse to the ustar>=0.7 branch for the resolved regime.
    # first step initializes instead of blending (:362-368)
    blend = (lambda old, new: new) if first \
        else (lambda old, new: 0.5 * (old + new))
    thz0_new = jnp.where(lndmsk > 0.5, blend(thz0, tha), thsk)
    qz0_new = jnp.where(lndmsk > 0.5, blend(qz0, qsfc_lnd), qsfc_ocn)
    uz0 = jnp.zeros_like(tg)
    vz0 = jnp.zeros_like(tg)

    # ---- scalar diffusion (:436-483) ----------------------------------
    akh_dens = akh * 0.5 * (rho[:-1] + rho[1:])
    akhs_dens = akhs * rho[kz - 1]
    species = [the, qk, qc] + ([qi] if five_species else [])
    sz0 = [thz0_new, qz0_new, jnp.zeros_like(tg)] \
        + ([jnp.zeros_like(tg)] if five_species else [])
    clow = [jnp.ones_like(tg), jnp.full_like(tg, c.minqq),
            jnp.zeros_like(tg)] \
        + ([jnp.zeros_like(tg)] if five_species else [])
    outs = _vdifh(dt, sz0, akhs_dens, clow, species, akh_dens, zint,
                  rho)
    the_n, qk_n, qc_n = outs[0], outs[1], outs[2]
    qi_n = outs[3] if five_species else qi
    cwm_n = qc_n + (qi_n if five_species else 0.0)

    thnew = the_n + cwm_n * elocp * ape
    tten = (thnew - th) * rdt * exner
    dqdt = (qk_n - qk) * rdt
    qvten = dqdt / (1.0 - qk_n) ** 2
    qcten = (qc_n - qc) * rdt
    qiten = (qi_n - qi) * rdt if five_species else jnp.zeros_like(qc)

    # ---- momentum diffusion (:488-509) --------------------------------
    akm_dens = akm * 0.5 * (rho[:-1] + rho[1:])
    akms_dens = akms * rho[kz - 1]
    u_n, v_n = _vdifv(dt, uz0, vz0, akms_dens, u, v, akm_dens, zint,
                      rho)
    return MYJOut(
        uten=(u_n - u) * rdt, vten=(v_n - v) * rdt,
        tten=tten, qvten=qvten, qcten=qcten, qiten=qiten,
        tkepbl=tke_new, kpbl=lpbl, zpbl=zpbl,
        thz0=thz0_new, qz0=qz0_new)
