"""Zeng ocean-flux scheme (iocnflx=2).

Faithful jax port of ``Main/ocnlib/mod_ocn_zeng.F90`` (``zengocndrv``
:55-420, Zeng et al. 1998): Monin-Obukhov similarity with convective
gustiness, Charnock-type roughness (iocnrough=1 default), smooth-surface
scalar roughness (Brutsaert Re^1/4 form, iocnzoq default), and fixed-count
batched iterations (the reference's early-exit loop becomes 10 masked
iterations — identical fixed point, TPU-friendly control flow).

The diurnal skin-SST scheme (ldcsst/ZB2005) is a later-round addition.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c
from ...utils.thermo import pfwsat, wlh

ZETAT = 0.465
ZETAM = 1.574
MINW = 0.1
MINZ = 1.0e-6
ONET = 1.0 / 3.0


def _psi(k, zeta):
    """Unstable similarity functions (mod_ocn_zeng.F90:411-424)."""
    chik = (1.0 - 16.0 * jnp.minimum(zeta, 0.0)) ** 0.25
    if k == 1:
        return (2.0 * jnp.log((1.0 + chik) * 0.5)
                + jnp.log((1.0 + chik * chik) * 0.5)
                - 2.0 * jnp.arctan(chik) + 0.5 * jnp.pi)
    return 2.0 * jnp.log((1.0 + chik * chik) * 0.5)


def _ocnrough(ustar, visa, iocnrough=1):
    """zo/zot/zoq (ocnrough, mod_ocn_zeng.F90:428-512)."""
    if iocnrough == 2:
        zo = 0.013 * c.regrav * ustar ** 2 + 0.11 * visa / ustar
    else:
        zo = 0.0065 * c.regrav * ustar ** 2
    zo = jnp.maximum(zo, 1.0e-8)
    re = ustar * zo / visa
    xtq = 2.67 * re ** 0.25 - 2.57
    zoq = zo / jnp.exp(xtq)
    return zo, zoq, zoq


class ZengOut(NamedTuple):
    sent: jax.Array
    evpr: jax.Array
    drag: jax.Array      # rho·ustar²·uv/um ≡ tau (for uvdrag use tau/uv)
    ustar: jax.Array
    u10: jax.Array
    t2m: jax.Array
    q2m: jax.Array


def zengocn(usw, vsw, tatm, qv, ht, sfps, patm, tgrd, hpbl) -> ZengOut:
    """Ocean fluxes. Inputs: lowest-level winds/T/qv (mixing ratio),
    height ht (m), surface/level pressure (Pa), SST tgrd (K), PBL height.
    """
    uv995 = jnp.sqrt(usw ** 2 + vsw ** 2)
    t995 = tatm - c.tzero
    z995 = ht
    zi = jnp.maximum(z995, hpbl)
    th = tgrd * (c.stdp / sfps) ** c.rovcp
    tha = tatm * (c.stdp / patm) ** c.rovcp
    dth = tha - th
    qs = pfwsat(tgrd, sfps) * 0.98
    dqh = qv - qs
    thv = th * (1.0 + c.ep1 * qv)
    dthv = dth * (1.0 + c.ep1 * qv) + c.ep1 * th * dqh
    xdens = sfps / (c.rgas * tatm * (1.0 + c.ep1 * qv))
    visa = 1.326e-5 * (1.0 + 6.542e-3 * t995 + 8.301e-6 * t995 ** 2
                       - 4.840e-9 * t995 ** 3)

    ustar = jnp.full_like(uv995, 0.06)
    wc = jnp.full_like(uv995, 0.5)
    um = jnp.where(dthv >= 0.0, jnp.maximum(uv995, MINW),
                   jnp.sqrt(uv995 ** 2 + wc ** 2))
    for _ in range(2):
        zo, zot, zoq = _ocnrough(ustar, visa)
        ustar = c.vonkar * um / jnp.log(z995 / zo)
    br = c.egrav * z995 * dthv / (thv * um * um)
    zeta = jnp.where(
        br >= 0.0,
        jnp.clip(br * jnp.log(z995 / zo)
                 / (1.0 - 5.0 * jnp.minimum(br, 0.19)), MINZ, 2.0),
        jnp.clip(br * jnp.log(z995 / zo), -100.0, -MINZ))
    obu = z995 / zeta
    wc = ustar * jnp.maximum(-zi * c.vonkar / obu, 0.0) ** ONET

    tstar = jnp.zeros_like(ustar)
    qstar = jnp.zeros_like(ustar)
    ram1 = jnp.log(z995 / 1e-4)
    for _ in range(10):
        zo, zot, zoq = _ocnrough(ustar, visa)
        # momentum (mod_ocn_zeng.F90:186-205)
        zeta = z995 / obu
        ram1 = jnp.where(
            zeta < -ZETAM,
            jnp.log(-ZETAM * obu / zo) - _psi(1, -ZETAM)
            + _psi(1, zo / obu)
            + 1.14 * ((-zeta) ** ONET - ZETAM ** ONET),
            jnp.where(
                zeta < 0.0,
                jnp.log(z995 / zo) - _psi(1, zeta) + _psi(1, zo / obu),
                jnp.where(zeta <= 1.0,
                          jnp.log(z995 / zo) + 5.0 * zeta - 5.0 * zo / obu,
                          jnp.log(obu / zo) + 5.0 - 5.0 * zo / obu
                          + 5.0 * jnp.log(jnp.maximum(zeta, 1.0))
                          + zeta - 1.0)))
        ustar = c.vonkar * um / jnp.maximum(ram1, 0.1)
        # heat
        rah1 = jnp.where(
            zeta < -ZETAT,
            jnp.log(-ZETAT * obu / zot) - _psi(2, -ZETAT)
            + _psi(2, zot / obu)
            + 0.8 * (ZETAT ** (-ONET) - (-zeta) ** (-ONET)),
            jnp.where(
                zeta < 0.0,
                jnp.log(z995 / zot) - _psi(2, zeta) + _psi(2, zot / obu),
                jnp.where(zeta <= 1.0,
                          jnp.log(z995 / zot) + 5.0 * zeta
                          - 5.0 * zot / obu,
                          jnp.log(obu / zot) + 5.0 - 5.0 * zot / obu
                          + 5.0 * jnp.log(jnp.maximum(zeta, 1.0))
                          + zeta - 1.0)))
        tstar = c.vonkar * dth / jnp.maximum(rah1, 0.1)
        # moisture (same stability functions with zoq)
        raq1 = jnp.where(
            zeta < -ZETAT,
            jnp.log(-ZETAT * obu / zoq) - _psi(2, -ZETAT)
            + _psi(2, zoq / obu)
            + 0.8 * (ZETAT ** (-ONET) - (-zeta) ** (-ONET)),
            jnp.where(
                zeta < 0.0,
                jnp.log(z995 / zoq) - _psi(2, zeta) + _psi(2, zoq / obu),
                jnp.where(zeta <= 1.0,
                          jnp.log(z995 / zoq) + 5.0 * zeta
                          - 5.0 * zoq / obu,
                          jnp.log(obu / zoq) + 5.0 - 5.0 * zoq / obu
                          + 5.0 * jnp.log(jnp.maximum(zeta, 1.0))
                          + zeta - 1.0)))
        qstar = c.vonkar * dqh / jnp.maximum(raq1, 0.1)
        thvstar = tstar * (1.0 + c.ep1 * qv) + c.ep1 * th * qstar
        zeta_n = c.vonkar * c.egrav * thvstar * z995 \
            / (ustar ** 2 * thv)
        stable = zeta_n >= 0.0
        um = jnp.where(stable, jnp.maximum(uv995, MINW),
                       jnp.sqrt(uv995 ** 2 + wc ** 2))
        wc = jnp.where(stable, wc,
                       (jnp.maximum(-c.egrav * ustar * thvstar * zi
                                    / thv, 0.0)) ** ONET)
        zeta_n = jnp.where(stable, jnp.clip(zeta_n, MINZ, 2.0),
                           jnp.clip(zeta_n, -100.0, -MINZ))
        obu = z995 / zeta_n

    tau = xdens * ustar ** 2 * uv995 / jnp.maximum(um, MINW)
    lh = -xdens * wlh(tatm) * qstar * ustar
    sh = -xdens * c.cpd * tstar * ustar
    evpr = jnp.maximum(lh / wlh(tatm), 0.0)
    # 10m wind (:230-238)
    zeta10 = 10.0 / obu
    uv10 = jnp.where(
        zeta10 < 0.0,
        uv995 + (ustar / c.vonkar) * (jnp.log(10.0 / z995)
                                      - (_psi(1, zeta10)
                                         - _psi(1, z995 / obu))),
        uv995 + (ustar / c.vonkar) * (jnp.log(10.0 / z995)
                                      + 5.0 * zeta10 - 5.0 * z995 / obu))
    fact = jnp.log(z995 * 0.5) / jnp.log(z995 / jnp.maximum(zo, 1e-8))
    t2m = tatm - dth * fact
    q2m = qv - dqh * fact
    return ZengOut(sent=sh, evpr=evpr,
                   drag=tau / jnp.maximum(uv995, MINW),
                   ustar=ustar, u10=uv10, t2m=t2m, q2m=q2m)
