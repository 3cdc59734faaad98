"""WSM5 single-moment 5-class microphysics (ipptls=3).

TPU-native re-design of the reference WSM5 scheme
(``Main/microlib/mod_micro_wsm5.F90:214`` `wsm5` and `wsm52d` at
``:434``): qv/qc/qr/qi/qs mixed-phase source-sink terms of Hong, Dudhia
and Chen (2004) with the Hong-Lim (2006) revisions, exactly the
production-term set of the reference (praut/pracw/prevp, psaut/psaci/
psacw/psdep/pidep/pigen/psevp/psmlt + instantaneous pimlt/pihmf/pihtf/
psfrz freezing family) including the sequential `ifsat` saturation
budget and the per-species conservation rescaling
(``mod_micro_wsm5.F90:900-1030``).

Design differences from the Fortran (documented, intentional):
- layout is dense ``(ncol, kz)`` with k=0 at the SURFACE (the
  reference's internal flipped layout), fully vectorised — no column
  loop, no branches; `where`-masked arithmetic replaces the scalar
  `if` ladders so XLA fuses the whole scheme into one kernel;
- sedimentation replaces the semi-Lagrangian PLM scheme
  (`nislfv_rain_plm`) with an unconditionally-stable implicit-upwind
  (backward-Euler) flux sweep expressed as a `lax.scan` down the
  column — same terminal-velocity laws, stable at any dt, and
  sequential only in k (cheap: kz≈18-41);
- the minor-loop count ``loops = max(nint(dt/120),1)``
  (``mod_micro_wsm5.F90:528``) is a compile-time constant.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ...utils import constants as c
from ...utils.thermo import pfwsat

# -- scheme constants (mod_micro_wsm5.F90:33-92) -------------------------
dtcldcr = 120.0
n0r = 8.0e6
avtr = 841.9
bvtr = 0.8
r0 = 0.8e-5
peaut = 0.55
xncr = 3.0e8
xmyu = 1.718e-5
avts = 11.72
bvts = 0.41
n0smax = 1.0e11
lamdarmax = 8.0e4
lamdasmax = 1.0e5
dicon = 11.9
dimax = 500.0e-6
n0s = 2.0e6
alpha = 0.12
pfrz1 = 100.0
pfrz2 = 0.66
qrsmin = 1.0e-15
qcimin = 1.0e-15
eacrc = 1.0
minni = 1.0e3
maxni = 1.0e6

# derived (init_wsm5, mod_micro_wsm5.F90:145-188); rgmma == Γ
_g = math.gamma
qc0 = (4.0 / 3.0) * math.pi * c.rhoh2o * r0 ** 3 * xncr / c.stdrho
qck1 = (0.104 * c.egrav * peaut / (xncr * c.rhoh2o) ** (1.0 / 3.0)
        / xmyu * c.stdrho ** (4.0 / 3.0))
pidnc = math.pi * c.rhoh2o / 6.0
bvtr1, bvtr2, bvtr3, bvtr4 = 1.0 + bvtr, 2.5 + 0.5 * bvtr, 3.0 + bvtr, \
    4.0 + bvtr
g1pbr, g3pbr, g4pbr, g5pbro2 = _g(bvtr1), _g(bvtr3), _g(bvtr4), _g(bvtr2)
pvtr = avtr * g4pbr / 6.0
eacrr = 1.0
pacrr = math.pi * n0r * avtr * g3pbr * 0.25 * eacrr
precr1 = 2.0 * math.pi * n0r * 0.78
precr2 = 2.0 * math.pi * n0r * 0.31 * avtr ** 0.5 * g5pbro2
xmmax = (dimax / dicon) ** 2
roqimax = 2.08e22 * dimax ** 8
bvts1, bvts2, bvts3, bvts4 = 1.0 + bvts, 2.5 + 0.5 * bvts, 3.0 + bvts, \
    4.0 + bvts
g1pbs, g3pbs, g4pbs, g5pbso2 = _g(bvts1), _g(bvts3), _g(bvts4), _g(bvts2)
pvts = avts * g4pbs / 6.0
pacrs = math.pi * n0s * avts * g3pbs * 0.25
precs1 = 4.0 * n0s * 0.65
precs2 = 4.0 * n0s * 0.44 * avts ** 0.5 * g5pbso2
pidn0r = math.pi * c.rhoh2o * n0r
pidn0s = math.pi * c.rhosnow * n0s
pacrc = math.pi * n0s * avts * g3pbs * 0.25 * eacrc
rslopermax = 1.0 / lamdarmax
rslopesmax = 1.0 / lamdasmax


class WSM5Out(NamedTuple):
    t: jax.Array        # updated temperature (ncol, kz)
    qv: jax.Array
    qc: jax.Array
    qi: jax.Array
    qr: jax.Array
    qs: jax.Array
    rain: jax.Array     # surface rain rate (mm/s == kg m-2 s-1), (ncol,)
    snow: jax.Array     # frozen part of the surface rate (mm/s)
    remrat: jax.Array   # rainout rate for chemistry scavenging (1/s)


def _cpm(qv):
    """cpmcal (mod_micro_wsm5.F90:1089): cpd(1-qv)+cpv·qv."""
    q = jnp.maximum(qv, qcimin)
    return c.cpd * (1.0 - q) + c.cpv * q


def _xl(t):
    """xlcal: latent heat of vaporisation."""
    return c.xlv0 - c.xlv1 * (t - c.tzero)


def _viscos(t, den):
    return 1.496e-6 * t * jnp.sqrt(t) / (t + 120.0) / den


def _diffus(t, p):
    return 8.794e-5 * jnp.exp(1.81 * jnp.log(t)) / p


def _slopes(qr, qs_, den, denfac, t):
    """slope_wsm5 (mod_micro_wsm5.F90:1145-1240): inverse slope powers
    and mass-weighted terminal velocities for rain & snow."""
    supcol = c.tzero - t
    n0sfac = jnp.clip(jnp.exp(alpha * supcol), 1.0, n0smax / n0s)
    lamr = jnp.sqrt(jnp.sqrt(pidn0r / (jnp.maximum(qr, qrsmin) * den)))
    lams = jnp.sqrt(jnp.sqrt(pidn0s * n0sfac
                             / (jnp.maximum(qs_, qrsmin) * den)))
    rsr = jnp.where(qr <= qrsmin, rslopermax, 1.0 / lamr)
    rss = jnp.where(qs_ <= qrsmin, rslopesmax, 1.0 / lams)
    rsrb = rsr ** bvtr
    rssb = rss ** bvts
    vtr = jnp.where(qr > 0.0, pvtr * rsrb * denfac, 0.0)
    vts = jnp.where(qs_ > 0.0, pvts * rssb * denfac, 0.0)
    return (rsr, rsrb, rsr * rsr, rsr ** 3,
            rss, rssb, rss * rss, rss ** 3, vtr, vts, n0sfac)


def _sediment(rho_q, vt, delz, dtcld):
    """Implicit-upwind sedimentation sweep (replaces nislfv_rain_plm).

    rho_q: ρ·q (kg/m3) per (ncol, kz), k=0 surface. Returns the new
    ρ·q and the flux through each cell bottom (kg/m2/s)."""
    kz = rho_q.shape[1]

    def body(flux_in, xs):
        rq, v, dz = xs                      # (ncol,) each
        rq_new = (rq + dtcld * flux_in / dz) / (1.0 + dtcld * v / dz)
        flux_out = v * rq_new
        return flux_out, (rq_new, flux_out)

    # scan from top (k=kz-1) down to surface (k=0)
    xs = (rho_q.T[::-1], vt.T[::-1], delz.T[::-1])
    flux0 = jnp.zeros(rho_q.shape[0], rho_q.dtype)
    _, (rq_new, flux) = lax.scan(body, flux0, xs)
    return rq_new[::-1].T, flux[::-1].T


def wsm5(t0, qv0, qc0_, qi0, qr0, qs0, p, delz, den, qsat, rh, delt):
    """One WSM5 call on dense columns (ncol, kz), k=0 at the surface.

    t0 [K], q* mixing ratios [kg/kg], p [Pa], delz [m], den [kg/m3],
    qsat/rh: saturation mixing ratio and relative humidity of the
    input state (the reference passes the slice values, wsm5:252-254).
    Returns the post-adjustment state + surface rates."""
    loops = max(int(round(delt / dtcldcr)), 1)
    if delt <= dtcldcr:
        loops = 1
    dtcld = delt / loops
    rdtcld = 1.0 / dtcld

    t = t0
    qv = qv0
    qc = jnp.where(qc0_ < qcimin, 0.0, qc0_)
    qi = jnp.where(qi0 < qcimin, 0.0, qi0)
    qr = jnp.maximum(qr0, 0.0)
    qs_ = jnp.maximum(qs0, 0.0)
    rain = jnp.zeros(t.shape[0], t.dtype)
    snow = jnp.zeros(t.shape[0], t.dtype)
    rh = jnp.clip(rh, 0.0, 1.0)
    fall_r = jnp.zeros_like(t)
    fall_s = jnp.zeros_like(t)

    cpm = _cpm(qv)
    xl = _xl(t)
    denfac = jnp.sqrt(c.stdrho / den)

    for _ in range(loops):
        # -- ni, slopes, sedimentation (wsm52d:560-640) ------------------
        (rsr, rsrb, rsr2, rsr3, rss, rssb, rss2, rss3,
         vtr, vts, n0sfac) = _slopes(qr, qs_, den, denfac, t)
        rqr, flux_r = _sediment(den * qr, vtr, delz, dtcld)
        rqs, flux_s = _sediment(den * qs_, vts, delz, dtcld)
        qr = jnp.maximum(rqr / den, 0.0)
        qs_ = jnp.maximum(rqs / den, 0.0)
        fall_r = flux_r / delz            # kg/m3/s, for remrat
        fall_s = flux_s / delz
        # psmlt: melting of snow while falling (wsm52d:575-600)
        (rsr, rsrb, rsr2, rsr3, rss, rssb, rss2, rss3,
         vtr, vts, n0sfac) = _slopes(qr, qs_, den, denfac, t)
        xlf = c.wlhf
        venf = (jnp.exp((1.0 / 3.0) * jnp.log(
            _viscos(t, den) / _diffus(t, p)))
            / jnp.sqrt(_viscos(t, den)) * jnp.sqrt(denfac))
        coeres = rss2 * jnp.sqrt(rss * rssb)
        psmlt = (1.414e3 * _viscos(t, den) * den / xlf
                 * (c.tzero - t) * 0.5 * math.pi * n0sfac
                 * (precs1 * rss2 + precs2 * venf * coeres))
        psmlt = jnp.where((t > c.tzero) & (qs_ > 0.0),
                          jnp.clip(psmlt * dtcld, -qs_, 0.0), 0.0)
        qs_ = qs_ + psmlt
        qr = qr - psmlt
        t = t + xlf / cpm * psmlt

        # ice fallout (vice, wsm52d:604-636)
        xni = jnp.clip(5.38e7 * (den * jnp.maximum(qi, qcimin)) ** 0.75,
                       minni, maxni)
        xmi = den * qi / xni
        diam = jnp.clip(dicon * jnp.sqrt(xmi), 1e-25, dimax)
        vti = jnp.where(qi > 0.0, 1.49e4 * diam ** 1.31, 0.0)
        rqi, flux_i = _sediment(den * qi, vti, delz, dtcld)
        qi = jnp.maximum(rqi / den, 0.0)

        # surface rates (wsm52d:640-650)
        fallsum = flux_r[:, 0] + flux_s[:, 0] + flux_i[:, 0]
        fallsum_qsi = flux_s[:, 0] + flux_i[:, 0]
        rain = rain + jnp.maximum(fallsum, 0.0) * dtcld / delt
        snow = snow + jnp.maximum(fallsum_qsi, 0.0) * dtcld / delt

        # -- instantaneous melting/freezing (wsm52d:652-700) -------------
        supcol = c.tzero - t
        xlf = jnp.where(supcol < 0.0, c.wlhf, c.wlhs - _xl(t))
        # pimlt: i->c above freezing
        m = (supcol < 0.0) & (qi > 0.0)
        t = jnp.where(m, t - xlf / cpm * qi, t)
        qc = jnp.where(m, qc + qi, qc)
        qi = jnp.where(m, 0.0, qi)
        # pihmf: homogeneous freezing below -40C
        m = (supcol > 40.0) & (qc > 0.0)
        t = jnp.where(m, t + xlf / cpm * qc, t)
        qi = jnp.where(m, qi + qc, qi)
        qc = jnp.where(m, 0.0, qc)
        # pihtf: heterogeneous (Bigg) freezing 0>-40C
        supcolt = jnp.minimum(supcol, 50.0)
        pfrzdtc = jnp.minimum(
            pfrz1 * (jnp.exp(pfrz2 * supcolt) - 1.0)
            * den / c.rhoh2o / xncr * qc * qc * dtcld, qc)
        m = (supcol > 0.0) & (qc > 0.0)
        pfrzdtc = jnp.where(m, pfrzdtc, 0.0)
        qi = qi + pfrzdtc
        t = t + xlf / cpm * pfrzdtc
        qc = qc - pfrzdtc
        # psfrz: freezing of rain  r->s
        (rsr, rsrb, rsr2, rsr3, rss, rssb, rss2, rss3,
         vtr, vts, n0sfac) = _slopes(qr, qs_, den, denfac, t)
        pfrzdtr = jnp.minimum(
            20.0 * math.pi ** 2 * pfrz1 * n0r * c.rhoh2o / den
            * (jnp.exp(pfrz2 * supcolt) - 1.0) * rsr ** 7 * dtcld, qr)
        m = (supcol > 0.0) & (qr > 0.0)
        pfrzdtr = jnp.where(m, pfrzdtr, 0.0)
        qs_ = qs_ + pfrzdtr
        t = t + xlf / cpm * pfrzdtr
        qr = qr - pfrzdtr

        # -- slopes + thermo work terms (wsm52d:702-745) -----------------
        (rsr, rsrb, rsr2, rsr3, rss, rssb, rss2, rss3,
         vtr, vts, n0sfac) = _slopes(qr, qs_, den, denfac, t)
        xl = _xl(t)
        cpm = _cpm(qv)
        qsv = jnp.maximum(qsat, qcimin)
        diffac_w = (den * xl * xl * (t + 120.0) * den
                    / (1.414e3 * 1.496e-6 * t * jnp.sqrt(t) * den
                       * c.rwat * t * t)
                    + p / (qsv * 8.794e-5 * jnp.exp(1.81 * jnp.log(t))))
        diffac_i = (den * c.wlhs * c.wlhs * (t + 120.0) * den
                    / (1.414e3 * 1.496e-6 * t * jnp.sqrt(t) * den
                       * c.rwat * t * t)
                    + p / (qsv * 8.794e-5 * jnp.exp(1.81 * jnp.log(t))))
        venf = (jnp.exp((1.0 / 3.0) * jnp.log(
            1.496e-6 * t * jnp.sqrt(t) * p
            / ((t + 120.0) * den * 8.794e-5 * jnp.exp(1.81 * jnp.log(t)))))
            * jnp.sqrt(jnp.sqrt(c.stdrho / den)))
        venf = venf / jnp.sqrt(1.496e-6 * t * jnp.sqrt(t)
                               / ((t + 120.0) * den))

        # -- warm rain (wsm52d:747-800) ----------------------------------
        supsat = jnp.maximum(qv, c.minqq) - qsv
        satdt = supsat * rdtcld
        praut = jnp.where(
            qc > qc0,
            jnp.minimum(qck1 * jnp.maximum(qc, qcimin) ** (7.0 / 3.0),
                        qc * rdtcld), 0.0)
        pracw = jnp.where(
            (qr > qrsmin) & (qc > qcimin),
            jnp.minimum(pacrr * rsr3 * rsrb * qc * denfac, qc * rdtcld),
            0.0)
        coeres = rsr2 * jnp.sqrt(rsr * rsrb)
        prevp0 = ((rh - 1.0) * (precr1 * rsr2 + precr2 * venf * coeres)
                  / diffac_w)
        prevp = jnp.where(
            prevp0 < 0.0,
            jnp.maximum(jnp.maximum(prevp0, -qr * rdtcld), 0.5 * satdt),
            jnp.minimum(prevp0, 0.5 * satdt))
        prevp = jnp.where(qr > 0.0, prevp, 0.0)

        # -- cold rain (wsm52d:802-900) ----------------------------------
        supcol = c.tzero - t
        n0sfac = jnp.clip(jnp.exp(alpha * supcol), 1.0, n0smax / n0s)
        eacrs = jnp.exp(0.07 * (-supcol))
        xni = jnp.clip(5.38e7 * (den * jnp.maximum(qi, qcimin)) ** 0.75,
                       minni, maxni)
        xmi = den * qi / xni
        diam = jnp.minimum(dicon * jnp.sqrt(jnp.maximum(xmi, 0.0)), dimax)
        vt2i = 1.49e4 * jnp.maximum(diam, 1e-25) ** 1.31
        vt2s = pvts * rssb * denfac
        acrfac = 2.0 * rss3 + 2.0 * diam * rss2 + diam ** 2 * rss
        psaci = jnp.where(
            (supcol > 0.0) & (qs_ > qrsmin) & (qi > qcimin),
            math.pi * qi * eacrs * n0s * n0sfac
            * jnp.abs(vt2s - vt2i) * acrfac * 0.25, 0.0)
        psacw = jnp.where(
            (qs_ > qrsmin) & (qc > qcimin),
            jnp.minimum(pacrc * n0sfac * rss3 * rssb * qc * denfac,
                        qc * rdtcld), 0.0)
        # pidep with the sequential saturation budget (ifsat)
        pidep0 = 4.0 * diam * xni * (rh - 1.0) / diffac_i
        supice = satdt - prevp
        pidep = jnp.where(
            pidep0 < 0.0,
            jnp.maximum(jnp.maximum(pidep0, 0.5 * satdt),
                        jnp.maximum(supice, -qi * rdtcld)),
            jnp.minimum(jnp.minimum(pidep0, 0.5 * satdt), supice))
        pidep = jnp.where((supcol > 0.0) & (qi > 0.0), pidep, 0.0)
        sat1 = jnp.abs(prevp + pidep) >= jnp.abs(satdt)
        coeres_s = rss2 * jnp.sqrt(rss * rssb)
        psdep0 = ((rh - 1.0) * n0sfac
                  * (precs1 * rss2 + precs2 * venf * coeres_s) / diffac_i)
        supice2 = satdt - prevp - pidep
        psdep = jnp.where(
            psdep0 < 0.0,
            jnp.maximum(jnp.maximum(psdep0, -qs_ * rdtcld),
                        jnp.maximum(0.5 * satdt, supice2)),
            jnp.minimum(jnp.minimum(psdep0, 0.5 * satdt), supice2))
        psdep = jnp.where((supcol > 0.0) & (qs_ > 0.0) & (~sat1),
                          psdep, 0.0)
        sat2 = jnp.abs(prevp + pidep + psdep) >= jnp.abs(satdt)
        supice3 = satdt - prevp - pidep - psdep
        xni0 = minni * jnp.exp(0.1 * supcol)
        roqi0 = 4.92e-11 * jnp.exp(1.33 * jnp.log(xni0))
        pigen = jnp.maximum(0.0, (roqi0 / den
                                  - jnp.maximum(qi, 0.0)) * rdtcld)
        pigen = jnp.minimum(jnp.minimum(pigen, satdt), supice3)
        pigen = jnp.where((supcol > 0.0) & (supsat > 0.0) & (~sat2),
                          jnp.maximum(pigen, 0.0), 0.0)
        qimax = roqimax / den
        psaut = jnp.where((supcol > 0.0) & (qi > 0.0),
                          jnp.maximum(0.0, (qi - qimax) * rdtcld), 0.0)
        psevp0 = psdep * diffac_i / diffac_w
        psevp = jnp.where(
            (supcol <= 0.0) & (qs_ > 0.0) & (rh < 1.0),
            jnp.clip(psevp0, -qs_ * rdtcld, 0.0), 0.0)

        # -- conservation rescaling + update (wsm52d:900-1032) -----------
        cold = t <= c.tzero
        # cloud water sink (both regimes share this triple)
        srcc = (praut + pracw + psacw) * dtcld
        fac = jnp.where(srcc > jnp.maximum(qcimin, qc),
                        jnp.maximum(qcimin, qc) / jnp.maximum(srcc, 1e-30),
                        1.0)
        praut, pracw, psacw = praut * fac, pracw * fac, psacw * fac
        # cloud ice (cold only)
        srci = (psaut + psaci - pigen - pidep) * dtcld
        fac = jnp.where(cold & (srci > jnp.maximum(qcimin, qi)),
                        jnp.maximum(qcimin, qi) / jnp.where(
                            srci == 0.0, 1.0, srci), 1.0)
        psaut, psaci = psaut * fac, psaci * fac
        pigen, pidep = pigen * fac, pidep * fac
        # rain
        srcr = jnp.where(cold, (-praut - pracw - prevp) * dtcld,
                         (-praut - pracw - prevp - psacw) * dtcld)
        fac = jnp.where(srcr > jnp.maximum(qcimin, qr),
                        jnp.maximum(qcimin, qr) / jnp.where(
                            srcr == 0.0, 1.0, srcr), 1.0)
        praut, pracw, prevp = praut * fac, pracw * fac, prevp * fac
        psacw = jnp.where(cold, psacw, psacw * fac)
        # snow
        srcs = jnp.where(cold,
                         (-psdep - psaut - psaci - psacw) * dtcld,
                         (-psevp) * dtcld)
        fac = jnp.where(srcs > jnp.maximum(qcimin, qs_),
                        jnp.maximum(qcimin, qs_) / jnp.where(
                            srcs == 0.0, 1.0, srcs), 1.0)
        psdep = jnp.where(cold, psdep * fac, psdep)
        psaut_c = jnp.where(cold, psaut * fac, psaut)
        psaci_c = jnp.where(cold, psaci * fac, psaci)
        psacw_c = jnp.where(cold, psacw * fac, psacw)
        psevp = jnp.where(cold, psevp, psevp * fac)
        psaut, psaci, psacw = psaut_c, psaci_c, psacw_c

        dqv_cold = -(prevp + psdep + pigen + pidep)
        dqv_warm = -(prevp + psevp)
        qv = qv + jnp.where(cold, dqv_cold, dqv_warm) * dtcld
        qc = jnp.maximum(qc - (praut + pracw + psacw) * dtcld, 0.0)
        qr = jnp.where(
            cold,
            jnp.maximum(qr + (praut + pracw + prevp) * dtcld, 0.0),
            jnp.maximum(qr + (praut + pracw + prevp + psacw) * dtcld,
                        0.0))
        qi = jnp.where(
            cold,
            jnp.maximum(qi - (psaut + psaci - pigen - pidep) * dtcld,
                        0.0), qi)
        qs_ = jnp.where(
            cold,
            jnp.maximum(qs_ + (psdep + psaut + psaci + psacw) * dtcld,
                        0.0),
            jnp.maximum(qs_ + psevp * dtcld, 0.0))
        xlf = c.wlhs - xl
        xlwork2 = jnp.where(
            cold,
            -c.wlhs * (psdep + pidep + pigen) - xl * prevp - xlf * psacw,
            -xl * (prevp + psevp))
        t = t - xlwork2 / cpm * dtcld

        # -- pcond saturation adjustment (wsm52d:1033-1068) --------------
        qsw = pfwsat(t, p)
        work1 = ((jnp.maximum(qv, c.minqq) - qsw)
                 / (1.0 + xl * xl / (c.rwat * cpm) * qsw / (t * t)))
        pcond = jnp.clip(work1 * rdtcld, 0.0,
                         jnp.maximum(qv, c.minqq) * rdtcld)
        pcond = jnp.where((qc > 0.0) & (work1 < 0.0),
                          jnp.maximum(work1, -qc) * rdtcld, pcond)
        qv = qv - pcond * dtcld
        qc = jnp.maximum(qc + pcond * dtcld, 0.0)
        t = t + pcond * xl / cpm * dtcld

    qc = jnp.where(qc < qcimin, 0.0, qc)
    qi = jnp.where(qi < qcimin, 0.0, qi)
    qr = jnp.maximum(qr, 0.0)
    qs_ = jnp.maximum(qs_, 0.0)
    # remrat for chemistry (wsm5:320-340): fall·dz/(ρw·q)
    remrat = (jnp.where(qr > c.dlowval,
                        fall_r * delz / c.rhoh2o / jnp.maximum(qr, 1e-30),
                        0.0)
              + jnp.where(qs_ > c.dlowval,
                          fall_s * delz / c.rhoh2o
                          / jnp.maximum(qs_, 1e-30), 0.0))
    return WSM5Out(t=t, qv=qv, qc=qc, qi=qi, qr=qr, qs=qs_,
                   rain=rain, snow=snow, remrat=remrat)
