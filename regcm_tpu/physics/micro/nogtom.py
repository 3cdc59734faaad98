"""Nogherotto-Tompkins 5-species implicit microphysics (ipptls=2) —
re-derived TPU-first from ``Main/microlib/mod_micro_nogtom.F90:358``
(Nogherotto et al. 2016; Tiedtke 93 / Tompkins 2007 lineage).

Prognostic qv/qc/qr/qi/qs with an explicit/implicit source-sink matrix
per grid box and a per-layer 5×5 linear solve; sedimentation marches
top-down so each layer's falling flux feeds the next (pfplsx).

TPU re-design:
- the k loop (which carries the precipitation flux and the max-random
  precip-cover memory downward) is a ``lax.scan`` over levels with
  (ncol,) carries — exactly the reference's only vertical dependency;
- per-level physics is dense over all columns; the Fortran
  ``qsexp/qsimp`` (nqx,nqx) matrices become (ncol, 5, 5) arrays built
  with static-index updates;
- the pivoting LU (``mysolve``) becomes a batched
  ``jnp.linalg.solve`` on the (ncol, 5, 5) LHS — same system, solver
  from XLA;
- the sink-overshoot rescaling (:1670-1752) keeps the reference's
  semantics: species whose explicit sinks exceed their content by
  1/dlowval get their negative entries (and mirrors) scaled.

Species order: 0=qv, 1=qc(liquid), 2=qr(rain), 3=qi(ice), 4=qs(snow)
(core.state IQV..IQS). Fall speeds vfqr/vfqi/vfqs from the microparam
namelist defaults.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c

IQV, IQL, IQR, IQI, IQS = 0, 1, 2, 3, 4
PHASE = jnp.asarray([0, 1, 1, 2, 2])       # vapour/liquid/ice
LFALL = (False, False, True, True, True)   # qr, qi, qs fall
# defaults (mod_runparams/mod_params): vfqr=4, vfqi=0.15, vfqs=1 m/s
VQX = (0.0, 0.0, 4.0, 0.15, 1.0)

ACTIVQX = 1.0e-8
ZEROCF, ONECF = 1.0e-2, 0.99
CLFEPS = 1.0e-6
RLCRITSNOW = 4.0e-5
RCLCRIT_LAND, RCLCRIT_SEA = 5.0e-4, 3.0e-4
RPRC1 = 3.0e2
RPRECRHMAX = 0.7
TW1, TW2, TW3, TW4, TW5 = 1329.31, 0.0074615, 0.85e5, 40.637, 275.0
THOMO = 235.16
ICEINIT = 1.0e-12
RKOOP1, RKOOP2 = 2.583, 0.48116e-2
CIDEN13 = 8.87
AIRCONDUCT = 2.4e-2
RLDCP = 1.0 / (c.wlhsocp - c.wlhvocp)      # cp/Lf
# tunables (mod_params defaults)
RCLDIFF = 1.0e-6
RKCONV = 1.0 / 6000.0
SKCONV = 1.0 / 6000.0
RCOVPMIN = 0.1
RPECONS = 5.547e-5
AUTO_RATE_KHAIR = 0.355
AUTO_EXPON_KHAIR = 1.47


class NogtomOut(NamedTuple):
    tten: jax.Array      # uncoupled K/s, (kz, iy, jx)
    qxten: jax.Array     # uncoupled (5, kz, iy, jx)
    rainnc: jax.Array    # surface liquid precip flux (mm/s = kg/m2/s)
    snownc: jax.Array    # surface frozen precip flux
    pfplsl: jax.Array    # (kz+1, iy, jx) liquid sedimentation flux
    pfplsn: jax.Array


def _qliq_phase(t):
    """Mixed-phase partition function ((T−Tice)/(T0−Tice))²."""
    rtice = c.tzero - 23.0
    return jnp.clip(((jnp.clip(t, rtice, c.tzero) - rtice)
                     / 23.0) ** 2, 0.0, 1.0)


def _eeliq(t):
    return c.c2es * jnp.exp(c.c3les * (t - c.tzero) / (t - c.c4les))


def _eeice(t):
    return c.c2es * jnp.exp(c.c3ies * (t - c.tzero) / (t - c.c4ies))


def _eewm(t, phase):
    return phase * _eeliq(t) + (1.0 - phase) * _eeice(t)


def _edem(t, phase):
    return phase * c.c5alvcp / (t - c.c4les) ** 2 \
        + (1.0 - phase) * c.c5alscp / (t - c.c4ies) ** 2


def _eldcpm(t):
    ph = _qliq_phase(t)
    return ph * c.wlhvocp + (1.0 - ph) * c.wlhsocp


def nogtom(t3, qx5, phs, pfs, rho, fcc, qdetr, heatrt, pverv,
           landmask, dt, iautoconv: int = 4):
    """One microphysics step (nogtom, mod_micro_nogtom.F90:358-1935).

    t3 (kz,iy,jx) K; qx5 (5,kz,iy,jx) mixing ratios; phs/pfs half/full
    level pressures (Pa); rho density; fcc cloud fraction; qdetr
    convective detrainment (kg/kg per step); heatrt radiative heating
    (K/s); pverv omega (Pa/s); landmask (iy,jx). Returns uncoupled
    tendencies + surface precipitation fluxes."""
    kz, iy, jx = t3.shape
    ncol = iy * jx
    oneodt = 1.0 / dt
    f = lambda a: a.reshape(a.shape[0], ncol) if a.ndim == 3 \
        else a.reshape(a.shape[0], a.shape[1], ncol)
    tL = f(t3)
    qxL = f(qx5)                       # (5, kz, ncol)
    phsL = f(phs)
    pfsL = f(pfs)
    rhoL = f(rho)
    fccL = jnp.clip(f(fcc), 0.0, 1.0)
    qdetrL = f(qdetr)
    heatL = f(heatrt)
    vervL = f(pverv)
    xlcrit = jnp.where(landmask.reshape(ncol) > 0.5, RCLCRIT_LAND,
                       RCLCRIT_SEA)
    pbot = pfsL[kz]
    dpfs = pfsL[1:] - pfsL[:-1]

    qliq = _qliq_phase(tL)
    eeliq = _eeliq(tL)
    eeice = _eeice(tL)
    koop = jnp.minimum(RKOOP1 - RKOOP2 * tL, eeliq / eeice)
    eewmt = jnp.minimum((eeliq * qliq + eeice * (1.0 - qliq)) / phsL,
                        0.5)
    qsmix = eewmt / (1.0 - c.ep1 * eewmt)
    zdelta = (tL > c.tzero).astype(tL.dtype)
    eew = jnp.minimum((zdelta * eeliq + (1.0 - zdelta) * eeice) / phsL,
                      0.5)
    qsice = jnp.minimum(eeice / phsL, 0.5)
    qsice = qsice / (1.0 - c.ep1 * qsice)
    eeliqt = jnp.minimum(eeliq / phsL, 0.5)
    qsliq = eeliqt / (1.0 - c.ep1 * eeliqt)
    qlt = qxL[IQL] + qxL[IQI]
    qliqfrac = jnp.where(qlt > 0.0, qxL[IQL] / jnp.maximum(qlt, 1e-30),
                         0.0)
    qicefrac = jnp.where(qlt > 0.0, 1.0 - qliqfrac, 0.0)

    def level_step(carry, x):
        pfplsx, covptot = carry            # (5, ncol), (ncol,)
        (tk, qx0in, ph, dens, ccov_in, qdet, hrt, wv, dp, alfaw,
         koopk, sqmix0, eewk, qsicek, qsliqk, eeliqtk, eeliqk, eeicek,
         qlf, qif, lccover) = x
        qsexp = jnp.zeros((ncol, 5, 5), tk.dtype)
        qsimp = jnp.zeros((ncol, 5, 5), tk.dtype)
        qxfg = qx0in + 0.0                          # (5, ncol)
        qx0 = qx0in

        def addexp(qsexp, qxfg, src, snk, amt, update_fg=True):
            qsexp = qsexp.at[:, src, snk].add(amt)
            qsexp = qsexp.at[:, snk, src].add(-amt)
            if update_fg:
                qxfg = qxfg.at[src].add(amt)
            return qsexp, qxfg

        # evaporate tiny amounts (into vapour; :793-812)
        for n in (IQL, IQI, IQR, IQS):
            tiny = qxfg[n] < ACTIVQX
            amt = jnp.where(tiny, qxfg[n], 0.0)
            qsexp, qxfg = addexp(qsexp, qxfg, IQV, n, amt,
                                 update_fg=False)
            qxfg = qxfg.at[n].set(jnp.where(tiny, 0.0, qxfg[n]))

        tc = tk - c.tzero
        gdp = c.egrav / dp
        dtgdp = dt * gdp
        rdtgdp = 1.0 / dtgdp
        # dqs/dT correction factors
        facw = c.c5les / (tk - c.c4les) ** 2
        corr = 1.0 / (1.0 - c.ep1 * eeliqtk)
        dqsliqdt = facw * corr * qsliqk
        corqsliq = 1.0 + c.wlhvocp * dqsliqdt
        faci = c.c5ies / (tk - c.c4ies) ** 2
        corr = 1.0 / (1.0 - c.ep1 * eewk)
        dqsicedt = faci * corr * qsicek
        corqsice = 1.0 + c.wlhsocp * dqsicedt
        facl = alfaw * facw + (1.0 - alfaw) * faci
        corr = 1.0 / (1.0 - c.ep1 * (eewk * 0.0 + sqmix0
                                     / (1.0 + c.ep1 * sqmix0)))
        dqsmixdt = facl * corr * sqmix0
        corqsmix = 1.0 / (1.0 + _eldcpm(tk) * dqsmixdt)
        evaplimmix = jnp.maximum((sqmix0 - qx0[IQV]) * corqsmix, 0.0)

        # fall source from above (:902-910)
        for n in range(5):
            if LFALL[n]:
                src = pfplsx[n] * dtgdp
                qsexp = qsexp.at[:, n, n].add(src)
                qxfg = qxfg.at[n].add(src)

        # supersaturation adjustment (:930-995)
        ltkgt0 = tk > c.tzero
        ltkgthomo = tk > THOMO
        facl_s = jnp.where(ltkgt0, 1.0,
                          ccov_in + koopk * (1.0 - ccov_in))
        supsat = jnp.maximum((qx0[IQV] - facl_s * sqmix0) * corqsmix,
                             0.0)
        subsat = jnp.minimum((qx0[IQV] - facl_s * sqmix0) * corqsmix,
                             0.0)
        sup_l = jnp.where((supsat > c.dlowval) & ltkgthomo, supsat, 0.0)
        sup_i = jnp.where((supsat > c.dlowval) & ~ltkgthomo, supsat,
                          0.0)
        qsexp, qxfg = addexp(qsexp, qxfg, IQL, IQV, sup_l)
        qsexp, qxfg = addexp(qsexp, qxfg, IQI, IQV, sup_i)
        qlifg = qxfg[IQL] + qxfg[IQI]
        lliq = qlifg > ACTIVQX
        excess = qlifg + subsat
        do_ev = (supsat <= c.dlowval) & (subsat < 0.0) & lliq \
            & (excess < 0.0)
        evap = jnp.maximum(-qlifg, -evaplimmix)
        ev_l = jnp.where(do_ev & ltkgthomo, evap, 0.0)
        ev_i = jnp.where(do_ev & ~ltkgthomo, evap, 0.0)
        qsexp, qxfg = addexp(qsexp, qxfg, IQL, IQV, ev_l)
        qsexp, qxfg = addexp(qsexp, qxfg, IQI, IQV, ev_i)

        # convective detrainment (:1021-1036)
        has_det = qdet > ACTIVQX
        det_l = jnp.where(has_det, alfaw * qdet, 0.0)
        det_i = jnp.where(has_det, (1.0 - alfaw) * qdet, 0.0)
        qsexp = qsexp.at[:, IQL, IQL].add(det_l)
        qsexp = qsexp.at[:, IQI, IQI].add(det_i)
        qxfg = qxfg.at[IQL].add(det_l)
        qxfg = qxfg.at[IQI].add(det_i)

        # cloud cover refresh for the saturation-adjusted state (:1044)
        ccover = 1.0 - jnp.sqrt(jnp.maximum(
            0.0, 1.0 - qx0[IQV] / sqmix0) / 0.4)
        ccover = jnp.clip(ccover, 0.0, ONECF)
        lcloud = ccover >= ZEROCF
        locast = ccover >= ONECF
        tmpa = 1.0 / jnp.maximum(ccover, ZEROCF)
        ql_incld = jnp.where(lcloud, qxfg[IQL] * tmpa, 0.0)
        qi_incld = jnp.where(lcloud, qxfg[IQI] * tmpa, 0.0)
        qli_incld = ql_incld + qi_incld

        # turbulent erosion (:1074-1094)
        leros = ccover * RCLDIFF * dt \
            * jnp.maximum(sqmix0 - qx0[IQV], 0.0)
        leros = jnp.minimum(jnp.minimum(leros, evaplimmix), qlifg)
        leros = jnp.where(lliq, leros, 0.0)
        qsexp, qxfg = addexp(qsexp, qxfg, IQL, IQV,
                             -qlf * leros)
        qsexp, qxfg = addexp(qsexp, qxfg, IQI, IQV,
                             -qif * leros)

        # condensation from dqsat/dt forcing (:1102-1216)
        dtdp = c.rovcp * tk / ph
        dpmxdt = dp * oneodt
        wtot = jnp.clip(wv, -dpmxdt, dpmxdt)
        dtdiab = jnp.clip(hrt, -dpmxdt * dtdp, dpmxdt * dtdp) * dt
        dtforc = dtdp * wtot * dt + dtdiab
        qold = sqmix0
        tcond = jnp.maximum(tk + dtforc, 160.0)
        qp = 1.0 / ph
        sqmix = qold
        for _ in range(2):
            phase2 = _qliq_phase(tcond)
            qsat = jnp.minimum(_eewm(tcond, phase2) * qp, 0.5)
            qsat = qsat / (1.0 - c.ep1 * qsat)
            cond = (sqmix - qsat) / (1.0 + qsat * _edem(tcond, phase2))
            tcond = tcond + _eldcpm(tcond) * cond
            sqmix = sqmix - cond
        dqs = sqmix - qold
        sqmix = qold
        # dqs > 0: evaporation
        levap = ccover * jnp.minimum(dqs, qli_incld)
        levap = jnp.minimum(levap, evaplimmix)
        levap = jnp.maximum(jnp.minimum(
            levap, jnp.maximum(sqmix - qx0[IQV], 0.0)), 0.0)
        levap = jnp.where(dqs > 0.0, levap, 0.0)
        qsexp, qxfg = addexp(qsexp, qxfg, IQV, IQL, qlf * levap,
                             update_fg=False)
        qsexp, qxfg = addexp(qsexp, qxfg, IQV, IQI, qif * levap,
                             update_fg=False)
        qxfg = qxfg.at[IQL].add(-qlf * levap)
        qxfg = qxfg.at[IQI].add(-qif * levap)
        # dqs < 0: formation in existing clouds
        chng = jnp.maximum(-dqs, 0.0)
        corr = 1.0 / (1.0 - c.ep1 * sqmix)
        cdmax_oc = (qx0[IQV] - sqmix) \
            / (1.0 + corr * sqmix * _edem(tk, alfaw))
        cdmax_pc = (qx0[IQV] - ccover * sqmix) \
            / jnp.maximum(ccover, ZEROCF)
        cdmax = jnp.where(locast, cdmax_oc, cdmax_pc)
        chng = ccover * jnp.clip(chng, 0.0, jnp.maximum(cdmax, 0.0))
        chng = jnp.where(chng < ACTIVQX, 0.0, chng)
        chng = jnp.where(lcloud & (dqs <= -ACTIVQX), chng, 0.0)
        ch_l = jnp.where(ltkgthomo, chng, 0.0)
        ch_i = jnp.where(~ltkgthomo, chng, 0.0)
        qsexp, qxfg = addexp(qsexp, qxfg, IQL, IQV, ch_l)
        qsexp, qxfg = addexp(qsexp, qxfg, IQI, IQV, ch_i)

        # sedimentation sink, included in first guess (:1232-1249)
        fallsink = jnp.zeros((5, ncol), tk.dtype)
        for n in range(5):
            if LFALL[n]:
                sink = dtgdp * VQX[n] * dens
                fallsink = fallsink.at[n].set(sink)
                qxfg = qxfg.at[n].set(qxfg[n] / (1.0 + sink))

        # vapour deposition on ice (Rotstayn/Meyers, :1275-1335)
        can_dep = (~ltkgt0) & (qxfg[IQL] > ACTIVQX)
        icenuclei = 1000.0 * jnp.exp(
            12.96 * (eeliqk - eeicek) / eeicek - 0.639)
        xadd = c.wlhs * (c.wlhs / (c.rwat * tk) - 1.0) \
            / (AIRCONDUCT * tk)
        xbdd = c.rwat * tk * ph / (2.21 * eeicek)
        cvds = jnp.maximum(
            (7.8 / jnp.maximum(CLFEPS, qlf))
            * (icenuclei / dens) ** 0.666 * (eeliqk - eeicek)
            / (CIDEN13 * (xadd + xbdd) * eeicek), 0.0)
        qice0 = jnp.maximum(jnp.maximum(qi_incld,
                                        icenuclei * ICEINIT / dens),
                            0.0)
        qinew = (0.666 * cvds * dt + qice0 ** 0.666) ** 1.5
        dep = jnp.maximum(ccover * (qinew - qice0), 0.0)
        dep = jnp.minimum(dep, jnp.maximum(qxfg[IQL], 0.0))
        dep = jnp.where(can_dep, dep, 0.0)
        qsexp, qxfg = addexp(qsexp, qxfg, IQI, IQL, dep)
        qxfg = qxfg.at[IQL].add(-dep)

        tmpa = 1.0 / jnp.maximum(ccover, ZEROCF)
        ql_incld = jnp.where(lcloud, qxfg[IQL] * tmpa, 0.0)
        qi_incld = jnp.where(lcloud, qxfg[IQI] * tmpa, 0.0)

        # precip cover max-random overlap (:1364-1373)
        qpretot0 = sum(qxfg[n] for n in range(5) if LFALL[n])
        has_pre = (qpretot0 > c.dlowval) & (lccover > c.dlowval)
        covptot = jnp.where(
            has_pre,
            jnp.maximum(1.0 - ((1.0 - covptot)
                               * (1.0 - jnp.maximum(ccover, lccover))
                               / (1.0 - jnp.minimum(lccover, ONECF))),
                        RCOVPMIN),
            0.0)
        covpclr = jnp.maximum(0.0, covptot - ccover)

        # warm autoconversion (:1378-1402; Sundqvist default)
        do_auto = (ql_incld > ACTIVQX) & lcloud
        rainp = pfplsx[IQR]
        snowp = pfplsx[IQS]
        if iautoconv == 2:      # Khairoutdinov-Kogan
            rainaut = dt * ccover * AUTO_RATE_KHAIR \
                * ql_incld ** AUTO_EXPON_KHAIR
            rainaut = jnp.where(rainaut < ACTIVQX, 0.0, rainaut)
        else:                   # Sundqvist (default iautoconv=4)
            alpha1 = jnp.minimum(RKCONV * dt, ql_incld)
            acrit = xlcrit
            hasp = covptot > c.dlowval
            precip = jnp.where(hasp, (rainp + snowp)
                               / jnp.maximum(covptot, RCOVPMIN), 0.0)
            cfpr = 1.0 + RPRC1 * jnp.sqrt(jnp.maximum(precip, 0.0))
            alpha1 = jnp.where(hasp, alpha1 * cfpr, alpha1)
            acrit = jnp.where(hasp, acrit / jnp.maximum(cfpr,
                                                        c.dlowval),
                              acrit)
            arg = (ql_incld / acrit) ** 2
            rainaut = ccover * alpha1 * jnp.where(
                arg < 25.0, 1.0 - jnp.exp(-jnp.minimum(arg, 25.0)),
                1.0)
            rainaut = jnp.where(rainaut < ACTIVQX, 0.0, rainaut)
        rainaut = jnp.where(do_auto, rainaut, 0.0)
        qsimp = qsimp.at[:, IQR, IQL].add(jnp.where(ltkgt0, rainaut,
                                                    0.0))
        qsimp = qsimp.at[:, IQS, IQL].add(jnp.where(~ltkgt0, rainaut,
                                                    0.0))

        # snow autoconversion (cold; Lin 83, :1409-1423)
        do_snow = (~ltkgt0) & (qi_incld > ACTIVQX) & lcloud
        alpha1 = jnp.minimum(dt * SKCONV * jnp.exp(0.025 * tc),
                             qi_incld)
        arg = (qi_incld / RLCRITSNOW) ** 2
        snowaut = ccover * alpha1 * jnp.where(
            arg < 25.0, 1.0 - jnp.exp(-jnp.minimum(arg, 25.0)), 1.0)
        qsimp = qsimp.at[:, IQS, IQI].add(jnp.where(do_snow, snowaut,
                                                    0.0))

        # melting (warm; :1434-1478)
        qicetot = qxfg[IQI] + qxfg[IQS]
        subsat2 = jnp.maximum(sqmix0 - qx0[IQV], 0.0)
        tdiff = tc - subsat2 * (TW1 + TW2 * (ph - TW3)
                                - TW4 * (tk - TW5))
        chngmax = jnp.maximum(tdiff * RLDCP, 0.0)
        can_melt = ltkgt0 & (qicetot > ACTIVQX) \
            & (chngmax > c.dlowval)
        for n, m2 in ((IQI, IQL), (IQS, IQR)):
            phase_n = qxfg[n] / jnp.maximum(qicetot, 1e-30)
            mlt = jnp.clip(jnp.minimum(qxfg[n], phase_n * chngmax),
                           0.0, None)
            mlt = jnp.where(can_melt, mlt, 0.0)
            qxfg = qxfg.at[n].add(-mlt)
            qxfg = qxfg.at[m2].add(mlt)
            qsexp = qsexp.at[:, m2, n].add(mlt)
            qsexp = qsexp.at[:, n, m2].add(-mlt)

        # freezing of rain (:1489-1500)
        chngmax = jnp.maximum((c.tzero - tk) * RLDCP, 0.0)
        frz_r = jnp.where((chngmax > c.dlowval)
                          & (qxfg[IQR] > ACTIVQX),
                          jnp.minimum(qxfg[IQR], chngmax), 0.0)
        qsexp = qsexp.at[:, IQS, IQR].add(frz_r)
        qsexp = qsexp.at[:, IQR, IQS].add(-frz_r)
        # homogeneous freezing of liquid (:1506-1519)
        chngmax = jnp.maximum((THOMO - tk) * RLDCP, 0.0)
        frz_l = jnp.where((chngmax > c.dlowval)
                          & (qxfg[IQL] > ACTIVQX),
                          jnp.minimum(qxfg[IQL], chngmax), 0.0)
        qsexp, qxfg = addexp(qsexp, qxfg, IQI, IQL, frz_l)
        qxfg = qxfg.at[IQL].add(-frz_l)

        # precip evaporation (rain, then snow; :1537-1660)
        qpretot = sum(qxfg[n] for n in range(5) if LFALL[n])
        for n, qsat_k, corq in ((IQR, qsliqk, corqsliq),
                                (IQS, qsicek, corqsice)):
            zrh = jnp.clip(RPRECRHMAX + (1.0 - RPRECRHMAX) * covpclr
                           / jnp.maximum(1.0 - ccover, 1e-6),
                           RPRECRHMAX, 1.0)
            qe = (qx0[IQV] - ccover * qsat_k) \
                / jnp.maximum(1.0 - ccover, 1e-6)
            qe = jnp.clip(qe, 0.0, qsat_k)
            lactiv = (covpclr > c.dlowval) & (covptot > c.dlowval) \
                & (qpretot > c.dlowval) & (qxfg[n] > ACTIVQX) \
                & (qe < zrh * qsat_k)
            preclr = qpretot * covpclr \
                / (jnp.maximum(covptot, RCOVPMIN) * dtgdp)
            beta1 = jnp.sqrt(ph / pbot) / 5.09e-3 * preclr \
                / jnp.maximum(covpclr, 1e-6)
            beta = 0.5 * c.egrav * RPECONS \
                * jnp.maximum(beta1, 0.0) ** 0.5777
            denom = 1.0 + beta * dt * corq
            dpr = covpclr * beta * (qsat_k - qe) / denom * dp \
                * c.regrav
            dpevap = dpr * dtgdp
            dpevap = jnp.where(qxfg[n] < ACTIVQX, qxfg[n], dpevap)
            chng_e = jnp.where(beta1 >= 0.0,
                               jnp.minimum(dpevap, qxfg[n]), qxfg[n])
            chng_e = jnp.maximum(jnp.where(lactiv, chng_e, 0.0), 0.0)
            covptot = jnp.where(
                lactiv & (beta1 >= 0.0),
                jnp.maximum(covptot - jnp.maximum(
                    0.0, (covptot - ccover) * dpevap
                    / jnp.maximum(qpretot, c.dlowval)), RCOVPMIN),
                covptot)
            qsexp = qsexp.at[:, IQV, n].add(chng_e)
            qsexp = qsexp.at[:, n, IQV].add(-chng_e)
            qxfg = qxfg.at[n].add(-chng_e)

        # ---- sink overshoot rescale (:1670-1752) ----------------------
        sinksum = -jnp.sum(qsexp, axis=2)            # (ncol, 5)
        qx0T = jnp.moveaxis(qx0, 0, 1)               # (ncol, 5)
        ratio = jnp.where(qx0T > c.dlowval,
                          jnp.maximum(qx0T, c.dlowval)
                          / jnp.maximum(sinksum, qx0T), 1.0)
        scale = jnp.where(ratio < c.dlowval, ratio, 1.0)
        neg = qsexp < 0.0
        qsexp = jnp.where(neg, qsexp * scale[:, :, None], qsexp)
        # mirror entries: scale positive (jn, jo) where (jo, jn) was neg
        qsexp = jnp.where(jnp.swapaxes(neg, 1, 2),
                          qsexp * scale[:, None, :], qsexp)

        # ---- implicit 5×5 solve (:1757-1785 + mysolve) ----------------
        # qlhs[jn,n] = -qsimp[jn,n] off-diagonal;
        # diagonal: 1 + fallsink[n] + Σ_jo qsimp[jo,n] (:1757-1771)
        eye = jnp.eye(5, dtype=tk.dtype)
        diag = 1.0 + jnp.moveaxis(fallsink, 0, 1) \
            + jnp.sum(qsimp, axis=1)                 # (ncol, 5)
        qlhs = -qsimp * (1.0 - eye)[None] \
            + eye[None] * diag[:, None, :]
        rhs = qx0T + jnp.sum(qsexp, axis=2)
        qxn = jnp.linalg.solve(qlhs, rhs[..., None])[..., 0]
        qxnT = jnp.moveaxis(qxn, 0, 1)               # (5, ncol)

        fs = fallsink
        pfpl_next = fs * qxnT * rdtgdp
        fallsrce = pfplsx * dtgdp
        fluxq = fallsrce - fs * qxnT
        dq = (qxnT - qx0) * oneodt
        dtt = jnp.zeros_like(tk)
        for n in range(5):
            if n == IQV:
                continue
            lat = c.wlhvocp if n in (IQL, IQR) else c.wlhsocp
            dtt = dtt + lat * (qxnT[n] - qx0[n] - fluxq[n]) * oneodt
        return (pfpl_next, covptot), (dq, dtt, pfpl_next)

    # per-level inputs stacked for scan; lccover needs level k-1 cloud
    lcc = jnp.concatenate([jnp.zeros_like(fccL[:1]), fccL[:-1]], axis=0)
    xs = (tL, jnp.moveaxis(qxL, 0, 1), phsL, rhoL, fccL, qdetrL,
          heatL, vervL, dpfs, qliq, koop, qsmix, eew, qsice, qsliq,
          eeliqt, eeliq, eeice, qliqfrac, qicefrac, lcc)

    carry0 = (jnp.zeros((5, ncol), tL.dtype), jnp.zeros((ncol,),
                                                        tL.dtype))
    (pf_end, _), (dq, dtt, pfl) = jax.lax.scan(level_step, carry0, xs)

    qxten = jnp.moveaxis(dq, 1, 0).reshape(5, kz, iy, jx)
    tten = dtt.reshape(kz, iy, jx)
    # sedimentation fluxes at interfaces 1..kz (pfl[k] = flux leaving
    # layer k); prepend zero top flux
    pfall = jnp.concatenate([jnp.zeros((1, 5, ncol), tL.dtype), pfl],
                            axis=0)
    pfplsl = (pfall[:, IQL] + pfall[:, IQR]).reshape(kz + 1, iy, jx)
    pfplsn = (pfall[:, IQI] + pfall[:, IQS]).reshape(kz + 1, iy, jx)
    rain = pfplsl[kz]
    snow = pfplsn[kz]
    return NogtomOut(tten=tten, qxten=qxten, rainnc=rain, snownc=snow,
                     pfplsl=pfplsl, pfplsn=pfplsn)
