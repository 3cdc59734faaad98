"""Sea-ice surface scheme (iseaice=1) — re-derived from the reference
``Main/ocnlib/mod_ocn_bats.F90:105-319`` (``seaice``; dispatched from
``vecocn``, ``mod_ocn_common.F90:62``).

Ocean points whose driving SST is at/below the freezing trigger
(icetriggert) become ice points: BATS drag with lead fraction (aarea),
snow accumulation/aging on the ice, conductive heat flux through the
ice following Maykut-Untersteiner/Semtner (snow-covered) or Slack 1980
(bare ice), prognostic ice thickness growth/melt, and lead-weighted
sensible/latent fluxes. Everything is elementwise → dense masked
whole-grid algebra.

Packed persistent state (4, iy, jx): sfice (m), sncv (mm w.e.),
snag (snow age), tgrd_ice (ice surface temperature K).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c
from ...utils.thermo import pfqsat

ICETRIGGERT = 271.35       # icetriggert (Share/mod_constants)
ICEMINH = 0.01
AAREA = 0.02
AGE3 = 0.3
ZLND, ZSNO, ZOCE = 0.01, 0.00040, 0.00023
WTUR = 0.1
SHICE = 2.0e6              # sea-ice heat capacity per volume (J/m3/K)
CSNW = 0.49 * 4.186e6


class SeaIceOut(NamedTuple):
    ice: jax.Array       # packed (4, iy, jx) updated state
    tg: jax.Array
    sent: jax.Array
    evpr: jax.Array
    drag: jax.Array
    icemask: jax.Array   # 1 where the point is ice-covered


def seaice(tatm, qv, usw, vsw, zh, rhox, sfps, prcp, rswf, rlwf_up,
           sst, ice_in, ocnmask, dtocn):
    """One sea-ice step over the dense grid. rlwf_up: net upward LW.
    sst: the driving ocean temperature (tgb). Non-ice points pass
    through zeros; blend with the open-ocean fluxes by `icemask`."""
    sfice0, sncv0, snag0, tgrd0 = ice_in[0], ice_in[1], ice_in[2], \
        ice_in[3]
    # ice exists where the driving SST is below trigger or thickness>0
    icemask = (ocnmask < 0.5) & ((sst < ICETRIGGERT)
                                 | (sfice0 > ICEMINH))
    # surface temperature init (:127-135)
    tgrd = jnp.where(sst >= ICETRIGGERT, sst,
                     jnp.where(tatm > ICETRIGGERT, ICETRIGGERT,
                               tatm - 0.01))
    tgrd = jnp.where(sfice0 > ICEMINH, jnp.minimum(tgrd, tgrd0), tgrd)
    tgbrd = jnp.full_like(tgrd, ICETRIGGERT)
    # seed thickness for newly frozen points
    sfice = jnp.where(icemask & (sfice0 <= ICEMINH), 2.0 * ICEMINH,
                      sfice0)

    uv995 = jnp.sqrt(usw ** 2 + vsw ** 2)
    delt = tatm - tgrd
    # snowfall on ice (:141-147)
    ps = jnp.where(tatm < c.tzero, prcp, 0.0)
    sold = sncv0
    sncv = sncv0 + dtocn * ps
    # snow age (:149-166)
    arg = 5.0e3 * (1.0 / c.tzero - 1.0 / jnp.maximum(tgrd, 150.0))
    age1 = jnp.exp(jnp.minimum(arg, 10.0))
    age2 = jnp.exp(jnp.clip(10.0 * arg, -25.0, 0.0))
    dela = 1.0e-6 * dtocn * (age1 + age2 + AGE3)
    dels = 0.1 * jnp.maximum(0.0, sncv - sold)
    snag = (snag0 + dela) * (1.0 - dels)
    snow_gone = sncv < c.dlowval
    sncv = jnp.where(snow_gone, 0.0, sncv)
    snag = jnp.where(snow_gone | (sncv > 800.0), 0.0, snag)
    age = 1.0 - 1.0 / (1.0 + snag)

    # drag over ice + leads (:169-204)
    cdrn = (c.vonkar / jnp.log(zh / ZLND)) ** 2
    u1 = jnp.where(delt < 0.0,
                   WTUR + 2.0 * jnp.sqrt(jnp.maximum(-delt, 0.0)),
                   WTUR)
    ribd = usw ** 2 + vsw ** 2 + u1 ** 2
    vspda = jnp.sqrt(ribd)
    br = zh * c.egrav * (delt / tatm) / ribd
    cdr = jnp.where(br < 0.0,
                    cdrn * (1.0 + 24.5 * jnp.sqrt(cdrn * jnp.abs(br))),
                    cdrn / (1.0 + 11.5 * br))
    cdr = jnp.maximum(cdr, jnp.maximum(0.25 * cdrn, 6.0e-4))
    rhosw3 = (0.10 * (1.0 + 3.0 * age)) ** 3
    cdrn_s = (c.vonkar / jnp.log(zh / ZSNO)) ** 2
    ribl = (1.0 - ICETRIGGERT / tatm) * zh * c.egrav / ribd
    clead = jnp.where(
        ribl < 0.0,
        cdrn_s * (1.0 + 24.5 * jnp.sqrt(cdrn_s * jnp.abs(ribl))),
        cdrn_s / (1.0 + 11.5 * br))
    cdrx = (1.0 - AAREA) * cdr + AAREA * clead
    drag = cdrx * vspda * rhox

    # conductive flux through ice/snow (:210-228)
    qs = qv / (1.0 + qv)
    sficemm = jnp.maximum(sfice, ICEMINH) * 1000.0
    rsd1 = SHICE * sficemm * 1e-3
    qgrd_i = pfqsat(jnp.full_like(tgrd, ICETRIGGERT), sfps)
    snowy = sncv > 0.0
    rsd1 = jnp.where(snowy, rsd1 + CSNW * sncv * 1e-3, rsd1)
    rsi = 1.4 * rhosw3 * sficemm / jnp.maximum(sncv, c.dlowval)
    ksnow = 7.0e-4 * rhosw3 / jnp.maximum(sncv, c.dlowval)
    fss = jnp.where(snowy,
                    ksnow * (tgbrd - tgrd) / (1.0 + rsi),
                    2.14 * (tgbrd - tgrd) / sficemm)
    # ice growth from the conductive flux (:229-231)
    sfice = jnp.where(icemask,
                      (sficemm + 1.087 * (fss / c.wlhf) * dtocn)
                      * 1e-3, sfice)

    melted = sfice <= ICEMINH
    # thin-ice: back to open water fluxes at SST (:233-247)
    qgrd_w = pfqsat(sst, sfps)
    delq_w = qs - qgrd_w
    delt_w = tatm - sst
    evpr_thin = jnp.maximum(-drag * delq_w, 0.0)
    sent_thin = -drag * c.cpd * delt_w

    # thick ice: lead-weighted fluxes (:248-300)
    qice = qgrd_i
    qgrnd = ((1.0 - AAREA) * cdr * qgrd_i + AAREA * clead * qice) \
        / cdrx
    tgrnd = ((1.0 - AAREA) * cdr * tgrd
             + AAREA * clead * ICETRIGGERT) / cdrx
    delt_i = tatm - tgrnd
    delq_i = qs - qgrnd
    evpr_ice = jnp.maximum(-drag * delq_i, 0.0)
    sncv = jnp.where(icemask & ~melted,
                     jnp.maximum(sncv - dtocn * evpr_ice, 0.0), sncv)
    sent_ice = -drag * c.cpd * delt_i
    hrl = rhox * vspda * clead * (qice - qs)
    hsl = rhox * vspda * clead * (ICETRIGGERT - tatm) * c.cpd
    fseng = (sent_ice - AAREA * hsl) / (1.0 - AAREA)
    fevpg = (evpr_ice - AAREA * hrl) / (1.0 - AAREA)
    hs = rswf - rlwf_up - fseng - c.wlhs * fevpg
    bb = dtocn * (hs + fss) / rsd1
    # snowmelt (:304-310)
    sm = jnp.where(tgrd >= c.tzero, jnp.maximum((hs + fss) / c.wlhf,
                                                0.0), 0.0)
    sm = jnp.minimum(sm, sncv / dtocn)
    sncv_new = jnp.maximum(sncv - sm * dtocn, 0.0)
    # surface temperature update, capped at freezing (:332-336)
    tg_new = jnp.minimum(tgrd + bb, ICETRIGGERT)
    sncv = jnp.where(icemask & ~melted, sncv_new, sncv)
    tgrd = jnp.where(icemask & ~melted, tg_new, tgrd)
    # melted-out points revert to SST / open water
    sncv = jnp.where(melted, 0.0, sncv)
    snag = jnp.where(melted, 0.0, snag)
    sfice = jnp.where(melted, 0.0, sfice)
    tgrd = jnp.where(melted, sst, tgrd)

    sent = jnp.where(melted, sent_thin, sent_ice)
    evpr = jnp.where(melted, evpr_thin, evpr_ice)
    sent = jnp.where(jnp.abs(sent) < c.dlowval, 0.0, sent)

    m = icemask
    ice_out = jnp.stack([
        jnp.where(m, sfice, 0.0), jnp.where(m, sncv, 0.0),
        jnp.where(m, snag, 0.0), jnp.where(m, tgrd, ICETRIGGERT)])
    return SeaIceOut(
        ice=ice_out,
        tg=jnp.where(m, tgrd, sst),
        sent=jnp.where(m, sent, 0.0),
        evpr=jnp.where(m, evpr, 0.0),
        drag=jnp.where(m, drag, 0.0),
        icemask=m.astype(tatm.dtype))
