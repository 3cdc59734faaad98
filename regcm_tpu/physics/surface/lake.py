"""Hostetler 1-D lake model (lakemod=1) — re-derived TPU-first from the
reference ``Main/ocnlib/mod_ocn_lake.F90`` (Hostetler et al. 1991-95,
Henderson-Sellers 1985 eddy diffusion).

Each lake point carries a 1 m-resolution water temperature profile
``tlak`` (up to ``nlak`` layers, actual depth from the DOMAIN lake-depth
field), prognostic ice thickness / snow cover, and feeds back the lake
surface temperature + recomputed drag/sensible/latent fluxes onto the
grid (``lakedrv`` :203-367).

TPU re-design: the packed lake-point vectors (``lakmsk``/pack/unpack,
:825-878) become dense masked whole-grid arrays — every grid cell
carries a profile, masked by ``lakmsk``; the per-column sequential
pieces become fixed-iteration masked updates:
- convective mixer (``lakemixer`` :632-669): a `lax.scan` down the
  profile carrying the adjusted (T, ρ) columns — same cascade order;
- ice-surface temperature secant solve (``lakeice`` :740-757): fixed
  10-iteration masked secant, matching maxiter;
- the Patterson-Hamblin snow→ice conversion and freeze/melt branches
  are masked ``where`` algebra.

Layer 0 thickness = ``surf`` = 1 m; dz = 1 m below.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import constants as c
from ...utils.thermo import pfqsat

SURF = 1.0          # surface layer thickness (m) (:41)
DZ = 1.0            # grid spacing (m) (:43)
ICEMINH = 0.01      # minimum ice thickness (m) (Share/mod_constants)
HREF = 2.0 * ICEMINH
STEEPF = 1.0
ZLND = 0.01
ZOCE = 0.00023
ZSNO = 0.00040
WTUR = 0.1
AAREA = 0.02        # lead fraction (mod_constants aarea)
AGE3 = 0.3          # dirt/soot snow-age term (BATS age3)
CPW = 4186.0        # specific heat of water (J/kg/K)
EMSW = 0.97         # water emissivity
HDMW = 1.39e-7      # molecular diffusion of heat in water (m2/s)
# lakeice constants (:679-705)
ISURF = 0.6
LAMI1, LAMI2 = 1.5, 20.0
LAMS1, LAMS2 = 6.0, 20.0
KICE, KSNOW = 2.3, 0.31
QW = 1.389
LFUS = 334.0e3
CDICE = 0.001
RHOSNOW = 330.0     # rhosnow (kg/m3)
RHOICE = 917.0
RHOSNOWP = 0.10     # rhosnowp used in snow melt (Mg units in ref)
SLAKE_TROP, BLAKE_TROP = 26.0, 22.0


class LakeOut(NamedTuple):
    tlak: jax.Array      # (nlak, iy, jx) water T profile (°C)
    lakhi: jax.Array     # ice thickness state hi (m)
    lakice: jax.Array    # average ice (aveice, m; 0 = ice free)
    laksnow: jax.Array   # snow cover (mm w.e.)
    laksnag: jax.Array   # snow age
    tg: jax.Array        # lake surface temperature (K)
    sent: jax.Array      # sensible heat flux (W/m2, + upward)
    evpr: jax.Array      # evaporation (kg/m2/s)
    drag: jax.Array      # rho·Cd·V


def init_lake(dhlake: np.ndarray, xlat: np.ndarray, tg: np.ndarray,
              nlak: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Initial profile/eta/depth-index (initlake, :96-201). Returns
    (tlak(nlak,iy,jx) °C, eta(iy,jx), idep(iy,jx) int)."""
    idep = np.clip(np.maximum(2.0, np.minimum(dhlake, float(nlak)))
                   / DZ, 2, nlak).astype(np.int32)
    eta = np.where(idep < 5, -1.20,
                   np.where(idep < 10, -0.80,
                            np.where(idep < 40, -0.60,
                                     np.where(idep < 100, -0.40,
                                              -0.20))))
    iy, jx = dhlake.shape
    tlak = np.zeros((nlak, iy, jx))
    k = np.arange(nlak)[:, None, None]
    # extratropical: start near ground T, -0.1 °C per layer below 2
    t1 = np.clip(tg - c.tzero + 1.0, 4.0, 20.0)
    tex = np.clip(t1[None] - 0.1 * np.maximum(k - 1, 0), 4.0, 20.0)
    # tropical: warm surface, thermocline 20-40 m (:170-194)
    ttr = np.where(k <= 19, SLAKE_TROP,
                   np.where(k <= 38,
                            SLAKE_TROP - (k - 19) / 20.0
                            * (SLAKE_TROP - BLAKE_TROP), BLAKE_TROP))
    tlak = np.where(np.abs(xlat)[None] > 25.0, tex,
                    np.broadcast_to(ttr, (nlak, iy, jx)))
    return tlak, eta, idep


def _density(t):
    """Water density (°C input; :528)."""
    return 1000.0 * (1.0 - 1.9549e-5 * jnp.abs(t - 4.0) ** 1.68)


def _lakeeddy(nlak, karr, dtlake, u2, xl, tprof, kmask):
    """Eddy diffusivity profile (lakeeddy, :506-592)."""
    demin = HDMW
    demax = 0.99 * 0.50 * DZ * DZ / dtlake
    dnsty = _density(tprof)
    ks = jnp.where(jnp.abs(xl) > 25.0,
                   6.6 * jnp.sqrt(jnp.abs(jnp.sin(xl * c.degrad)))
                   * jnp.maximum(u2, 0.01) ** (-1.84), 0.001)
    zmax = jnp.ceil(SURF + 40.0 / (c.vonkar * ks))
    ws = 0.0012 * u2
    z = SURF + karr * DZ                       # depth of layer k bottom
    dn_dn = jnp.concatenate([dnsty[1:], dnsty[-1:]], axis=0)
    dpdz = (dn_dn - dnsty) / jnp.where(karr == 0, SURF, DZ)
    n2 = (dpdz / dnsty) * c.egrav
    rad = jnp.maximum(
        0.0, 1.0 + 40.0 * n2 * ((c.vonkar * z)
                                / (ws * jnp.exp(-ks * z))) ** 2)
    ri = (-1.0 + jnp.sqrt(rad)) / 20.0
    de = demin + c.vonkar * ws * z * jnp.exp(-ks * z) \
        / (1.0 + 37.0 * ri ** 2)
    de = jnp.where((z >= zmax) | (ks * z > 12.0)
                   | (jnp.abs(n2) < c.dlowval), demin, de)
    de = jnp.clip(de, demin, demax)
    de = jnp.where(kmask, de, demin)
    # bottom level: molecular
    return de, dnsty


def _laketemp(nlak, karr, dtlake, fsw, flw, qe, qh, eta, tprof, de,
              dnsty, kmask, kbot):
    """Heat transfer update (laketemp, :594-630)."""
    # shortwave absorption between layer tops (Beer's law)
    ztop = jnp.where(karr == 0, 0.0, SURF + (karr - 1) * DZ)
    zbot = jnp.where(karr == 0, SURF, SURF + karr * DZ)
    thick = jnp.where(karr == 0, SURF, DZ)
    sw = fsw[None] * (jnp.exp(eta[None] * ztop)
                      - jnp.exp(eta[None] * zbot)) \
        / (thick * dnsty * CPW)
    # surface layer gets the non-penetrative fluxes too
    dt1 = sw.at[0].add((flw + qe + qh) / (SURF * dnsty[0] * CPW))
    # bottom: all remaining SW absorbed
    swbot = fsw * jnp.take_along_axis(
        jnp.exp(eta[None] * ztop), kbot[None], axis=0)[0]
    dnb = jnp.take_along_axis(dnsty, kbot[None], axis=0)[0]
    dt1 = dt1 + jnp.where(
        karr == kbot[None],
        (swbot / (DZ * dnb * CPW))[None]
        - sw, 0.0)
    # diffusion term
    t_up = jnp.concatenate([tprof[:1], tprof[:-1]], axis=0)
    t_dn = jnp.concatenate([tprof[1:], tprof[-1:]], axis=0)
    de_up = jnp.concatenate([de[:1], de[:-1]], axis=0)
    flux_up = de_up * (t_up - tprof)
    flux_dn = de * (tprof - t_dn)
    dt2 = (flux_up - flux_dn) / DZ
    dt2 = jnp.where(karr == 0, -de[0:1] * (tprof[0:1] - tprof[1:2])
                    / SURF, dt2)
    dt2 = jnp.where(karr == kbot[None],
                    de_up * (t_up - tprof) / DZ, dt2)
    tnew = tprof + (dt1 + dt2) * dtlake
    return jnp.where(kmask, tnew, tprof)


def _lakemixer(nlak, dtlake, tprof, kmask, kbot):
    """Convective mixing cascade (lakemixer, :632-669): scan down the
    profile, averaging any statically-unstable 3-layer window."""
    karr = jnp.arange(nlak)[:, None, None]
    vol = jnp.where(karr == 0, SURF, DZ)

    def body(tt, k):
        dn = _density(tt)
        dnk = jax.lax.dynamic_index_in_dim(dn, k, axis=0,
                                           keepdims=False)
        dnk1 = jax.lax.dynamic_index_in_dim(
            dn, jnp.minimum(k + 1, nlak - 1), axis=0, keepdims=False)
        active = (dnk > dnk1) & (k >= 1) & (k + 1 <= kbot)
        win = (karr >= k - 1) & (karr <= k + 1)
        wv = jnp.where(win, vol, 0.0)
        tav = jnp.sum(tt * wv, axis=0) / jnp.maximum(
            jnp.sum(wv, axis=0), 1e-12)
        tt = jnp.where(win & active[None], tav[None], tt)
        return tt, None

    tt, _ = jax.lax.scan(body, tprof, jnp.arange(1, nlak - 1))
    return jnp.where(kmask, tt, tprof)


def _eomb(x):
    """Vapor pressure over water (mb) from T in °C (:807-814)."""
    tr1 = 1.0 - c.tboil / (x + c.tzero)
    return c.stdpmb * jnp.exp(13.3185 * tr1 - 1.976 * tr1 ** 2
                              - 0.6445 * tr1 ** 3 - 0.1299 * tr1 ** 4)


def _lakeice(dtx, fsw, ld, tac, u2, ea, hs0, hi0, aveice0, evl0, prec,
             ps, tprof, dens):
    """Ice/snow growth + surface temperature (lakeice, :671-796).
    hs in m, hi/aveice in m, prec in mm, ps in cb→the reference passes
    sfps — here Pa. Returns (hs, hi, aveice, evl, tprof)."""
    # snowfall accumulation + Patterson-Hamblin max snow depth
    snowing = (tac <= 0.0) & (aveice0 > 0.0)
    hs = jnp.where(snowing, hs0 + prec * 1e-2, hs0)
    ds = hi0 * (c.rhoh2o - RHOICE) / RHOSNOW
    conv = jnp.maximum(hs - ds, 0.0)
    hi = hi0 + jnp.where(snowing, conv, 0.0)
    hs = jnp.where(snowing, hs - conv, hs)
    hs = jnp.where(hs < c.dlowval, 0.0, hs)

    t0 = tprof[0]
    tf = 0.0
    khat = (KICE * hs + KSNOW * hi) / (KICE * KSNOW)
    theta = CPW * dens * CDICE * u2
    psi = c.wlhv * dens * CDICE * u2 * c.ep2 / (ps * 1e-2)
    evl = psi * (_eomb(t0) - ea) / (c.wlhv * dens)
    # penetrating radiation (:734-739, incl. the reference's literal
    # second-band expression)
    qpen = fsw * 0.7 * ((1.0 - jnp.exp(-LAMS1 * hs)) / (KSNOW * LAMS1)
                        + jnp.exp(-LAMS1 * hs)
                        * (1.0 - jnp.exp(-LAMI1 * hi))
                        / (KICE * LAMI1)) \
        + fsw * 0.3 * ((1.0 - jnp.exp(-LAMS2)) / (KSNOW * LAMS2)
                       + (-LAMS2 * hs) * (1.0 - jnp.exp(-LAMI2 * hi))
                       / (KICE * LAMI2))

    def f(x):
        return (-ld + EMSW * c.sigm * (x + c.tzero) ** 4
                + psi * (_eomb(x) - ea) + theta * (x - tac) - fsw) \
            - 1.0 / khat * (qpen + tf - x)

    # masked secant iteration (maxiter=10)
    t1 = jnp.full_like(t0, -50.0)
    f0 = f(t0)
    f1 = f(t1)
    done = jnp.zeros_like(t0, bool)
    t2 = t1
    ta, tb_, fa, fb = t0, t1, f0, f1
    for _ in range(10):
        t2n = tb_ - (tb_ - ta) * fb / jnp.where(
            jnp.abs(fb - fa) < 1e-12, 1e-12, fb - fa)
        stop = ((t2n - tb_) / jnp.where(jnp.abs(tb_) < 1e-6, 1e-6, tb_)
                < 0.001) | (t2n > 0.0)
        t2 = jnp.where(done, t2, t2n)
        done = done | stop
        ta = jnp.where(done, ta, tb_)
        fa = jnp.where(done, fa, fb)
        tb_ = jnp.where(done, tb_, t2n)
        fb = jnp.where(done, fb, f(t2n))
    t0n = t2

    melt_flux = (-ld + EMSW * c.sigm * (tf + c.tzero) ** 4
                 + psi * (_eomb(tf) - ea) + theta * (tf - tac) - fsw) \
        - 1.0 / khat * (tf - t0n + qpen)
    warm = t0n >= tf
    # melt snow first (ds ≤ 0), then ice
    ds_m = jnp.minimum(dtx * melt_flux / (RHOSNOWP * LFUS), 0.0)
    hs_warm = jnp.maximum(hs + ds_m * 10.0, 0.0)
    di_m = jnp.minimum(dtx * melt_flux / (RHOICE * LFUS), 0.0)
    hi_warm = hi + jnp.where((hs_warm < c.dlowval) & (aveice0 > 0.0),
                             di_m, 0.0)
    # freezing growth
    q0 = -ld + EMSW * c.sigm * (t0n + c.tzero) ** 4 \
        + psi * (_eomb(t0n) - ea) + theta * (t0n - tac) - fsw
    qpen2 = fsw * 0.7 * (1.0 - jnp.exp(-(LAMS1 * hs + LAMI1 * hi))) \
        + fsw * 0.3 * (1.0 - jnp.exp(-(LAMS2 * hs + LAMI2 * hi)))
    di_f = dtx * (q0 - QW - qpen2) / (RHOICE * LFUS)
    hi_cold = hi + di_f
    hs = jnp.where(warm, hs_warm, hs)
    hi = jnp.where(warm, hi_warm, hi_cold)

    gone = hi <= ICEMINH
    aveice = jnp.where(gone, 0.0, hi)
    hi = jnp.where(gone, ICEMINH, hi)
    hs = jnp.where(gone, 0.0, hs)
    tsfc = jnp.where(gone,
                     (hi * t0n + (ISURF - hi) * tprof[1]) / ISURF,
                     jnp.minimum(t0n, 0.0))
    tprof = tprof.at[0].set(tsfc)
    return hs, hi, aveice, evl, tprof


def lakedrv(tatm, qv, usw, vsw, za, rswf, rlwf, prcp, sent_in, evpr_in,
            rhox, sfps, tlak, lakhi, lakice, laksnow, laksnag, tg_in,
            eta, idep, lakmsk, xlat, dtlake):
    """One lake step over the dense grid (lakedrv, :203-367).

    rswf: absorbed SW at surface (W/m2, down+); rlwf: net downward LW
    (W/m2); sent_in/evpr_in: previous-step sensible flux (+up) and
    evaporation feeding the water heat budget; sfps in Pa.
    Non-lake points pass through unchanged (masked)."""
    nlak = tlak.shape[0]
    karr = jnp.arange(nlak)[:, None, None]
    kbot = jnp.asarray(idep, jnp.int32) - 1
    kmask = karr <= kbot[None]

    tc = tatm - c.tzero
    vl = jnp.sqrt(usw ** 2 + vsw ** 2)
    fswx = rswf
    # rlwf here is NET DOWNWARD longwave (suite convention); the
    # reference passes flwx = −rlwf with its net-upward storage — same
    # quantity
    flwx = rlwf
    prec = prcp * dtlake
    hsen = -sent_in
    qe = -evpr_in * c.wlhv

    # 2 m wind via log profile (:446)
    u2 = jnp.maximum(vl * jnp.log(2.0 / 0.001)
                     / jnp.log(jnp.maximum(za, 2.5) / 0.001), 0.5)

    openwater = (lakice < ICEMINH) & (tlak[0] > -0.001)

    # --- open-water branch: eddy diffusion + temperature + mixing -----
    de, dnsty = _lakeeddy(nlak, karr, dtlake, u2, xlat, tlak, kmask)
    t_open = _laketemp(nlak, karr, dtlake, fswx, flwx, qe, hsen, eta,
                       tlak, de, dnsty, kmask, kbot)
    t_open = _lakemixer(nlak, dtlake, t_open, kmask, kbot)

    # --- ice branch ----------------------------------------------------
    ea = qv * 88.0 / (c.ep2 + 0.378 * qv)
    ev_mmhr = evpr_in * 3600.0
    hs_m = laksnow * 1e-2
    hs, hi, aveice, ev_new, t_ice = _lakeice(
        dtlake, fswx, rlwf + EMSW * c.sigm * (tlak[0] + c.tzero) ** 4,
        tc, u2, ea, hs_m, lakhi, lakice, ev_mmhr, prec, sfps, tlak,
        rhox)
    t_ice = _lakemixer(nlak, dtlake, t_ice, kmask, kbot)

    tlak_new = jnp.where(openwater[None], t_open, t_ice)
    hi_new = jnp.where(openwater, ICEMINH, hi)
    ice_new = jnp.where(openwater, 0.0, aveice)
    snow_new = jnp.where(openwater, 0.0, hs * 1e2)
    evpr_lake = jnp.where(openwater, evpr_in, ev_new / 3600.0)

    tgl = tlak_new[0] + c.tzero

    # --- surface fluxes from the new lake temperature ------------------
    qs = qv / (1.0 + qv)
    qgrd_mr = pfqsat(tgl, sfps)
    qgrd = qgrd_mr / (1.0 + qgrd_mr)
    delt = tatm - tgl
    delq = qs - qgrd
    icefree = ice_new <= ICEMINH

    # ice-free: BATS bulk over water roughness (:272-288)
    ribd = usw ** 2 + vsw ** 2 + WTUR ** 2
    vspda = jnp.sqrt(ribd)
    cdrn_w = (c.vonkar / jnp.log(za / ZOCE)) ** 2
    br = za * c.egrav * (delt / tatm) / ribd
    cdrx_w = jnp.where(br < 0.0,
                       cdrn_w * (1.0 + 24.5
                                 * jnp.sqrt(cdrn_w * jnp.abs(br))),
                       cdrn_w / (1.0 + 11.5 * br))
    cdrx_w = jnp.maximum(cdrx_w, jnp.maximum(0.25 * cdrn_w, 6.0e-4))
    drag_w = cdrx_w * vspda * rhox
    evpr_w = -drag_w * delq
    sent_w = -drag_w * c.cpd * delt

    # iced: snow-age dependent drag + lead fraction (:289-351)
    sold = laksnow
    arg = 5.0e3 * (1.0 / c.tzero - 1.0 / jnp.maximum(tgl, 200.0))
    age1 = jnp.exp(arg)
    age2 = jnp.exp(jnp.minimum(0.0, 10.0 * arg))
    age = age1 + age2 + AGE3
    dela = 1.0e-6 * dtlake * age
    dels = 0.1 * jnp.maximum(0.0, snow_new - sold)
    snag = (laksnag + dela) * (1.0 - dels)
    snag = jnp.where((snow_new < c.dlowval) | (snow_new > 800.0),
                     0.0, snag)
    cdrn_i = (c.vonkar / jnp.log(za / ZLND)) ** 2
    u1 = jnp.where(delt < 0.0, WTUR + 2.0 * jnp.sqrt(-jnp.minimum(
        delt, 0.0)), WTUR)
    ribd_i = usw ** 2 + vsw ** 2 + u1 ** 2
    vspda_i = jnp.sqrt(ribd_i)
    br_i = za * c.egrav * (delt / tatm) / ribd_i
    cdr = jnp.where(br_i < 0.0,
                    cdrn_i * (1.0 + 24.5
                              * jnp.sqrt(cdrn_i * jnp.abs(br_i))),
                    cdrn_i / (1.0 + 11.5 * br_i))
    cdr = jnp.maximum(cdr, jnp.maximum(0.25 * cdrn_i, 6.0e-4))
    cdrn_s = (c.vonkar / jnp.log(za / ZSNO)) ** 2
    ribl = (1.0 - 271.5 / tatm) * za * c.egrav / ribd_i
    clead = jnp.where(ribl < 0.0,
                      cdrn_s * (1.0 + 24.5
                                * jnp.sqrt(cdrn_s * jnp.abs(ribl))),
                      cdrn_s / (1.0 + 11.5 * br_i))
    cdrx_i = (1.0 - AAREA) * cdr + AAREA * clead
    drag_i = cdrx_i * vspda_i * rhox
    qice = 3.3e-3 * c.stdp / sfps
    qgrnd = ((1.0 - AAREA) * cdr * qgrd + AAREA * clead * qice) / cdrx_i
    tgb = ((1.0 - AAREA) * cdr * tgl
           + AAREA * clead * (c.tzero - 1.8)) / cdrx_i
    delt_i = tatm - tgb
    delq_i = qs - qgrnd
    evpr_i = -drag_i * delq_i
    sent_i = -drag_i * c.cpd * delt_i
    toth = ice_new + snow_new
    sent_i = jnp.where(toth > HREF,
                       sent_i * (HREF / jnp.maximum(toth, HREF))
                       ** STEEPF, sent_i)

    sent = jnp.where(icefree, sent_w, sent_i)
    evpr = jnp.where(icefree, evpr_w, evpr_i)
    drag = jnp.where(icefree, drag_w, drag_i)
    sent = jnp.where(jnp.abs(sent) < c.dlowval, 0.0, sent)
    evpr = jnp.where(jnp.abs(evpr) < c.dlowval, 0.0, evpr)

    m = lakmsk > 0.5
    m3 = m[None]
    return LakeOut(
        tlak=jnp.where(m3, tlak_new, tlak),
        lakhi=jnp.where(m, hi_new, lakhi),
        lakice=jnp.where(m, ice_new, lakice),
        laksnow=jnp.where(m, snow_new, laksnow),
        laksnag=jnp.where(m, snag, laksnag),
        tg=jnp.where(m, tgl, tg_in),
        sent=jnp.where(m, sent, 0.0),
        evpr=jnp.where(m, evpr, 0.0),
        drag=jnp.where(m, drag, 0.0))
