"""COARE 3.0 bulk ocean-flux scheme (iocnflx=3).

Faithful jax port of ``Main/ocnlib/mod_ocn_coare.F90`` (``coare3_drv``
:46-419, Fairall et al. 2003 bulk algorithm with cool-skin correction):
Monin-Obukhov similarity with Liu-Katsaros-Businger scalar roughness,
gustiness from the convective velocity scale, and a cool-skin (``dter``)
sublayer model. The reference's per-point early-exit (``niter=1`` when
``zetu > 50``) becomes a masked freeze inside a fixed 3-iteration loop —
identical fixed point, TPU-friendly static control flow. Sea-ice points
(``iflag``) use the Andreas (1987) roughness branch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c
from ...utils.thermo import pfqsat, pfqsdt, wlh, cpmf

BETA = 1.25     # gustiness coefficient
FDG = 1.0       # thermal/wind von Karman ratio
VISW = 1.0e-6   # water kinematic viscosity
TCW = 0.6       # water thermal diffusivity
RHOW = 1022.0   # water density
BE = 0.026      # salinity expansion coefficient
CPW = 4.0e3     # specific heat of water


def _psiuo(zet):
    """Velocity profile function (mod_ocn_coare.F90:378-397)."""
    zet_n = jnp.minimum(zet, -1e-12)
    x = (1.0 - 15.0 * zet_n) ** 0.25
    psik = (2.0 * jnp.log((1.0 + x) / 2.0)
            + jnp.log((1.0 + x * x) / 2.0)
            - 2.0 * jnp.arctan(x) + 2.0 * jnp.arctan(1.0))
    x = (1.0 - 10.15 * zet_n) ** 0.3333
    psic = (1.5 * jnp.log((1.0 + x + x * x) / 3.0)
            - jnp.sqrt(3.0) * jnp.arctan((1.0 + 2.0 * x) / jnp.sqrt(3.0))
            + 4.0 * jnp.arctan(1.0) / jnp.sqrt(3.0))
    f = zet_n * zet_n / (1.0 + zet_n * zet_n)
    unstable = (1.0 - f) * psik + f * psic
    zet_p = jnp.maximum(zet, 0.0)
    cc = jnp.minimum(50.0, 0.35 * zet_p)
    stable = -((1.0 + 1.0 * zet_p) ** 1.0
               + 0.667 * (zet_p - 14.28) / jnp.exp(cc) + 8.525)
    return jnp.where(zet < 0.0, unstable, stable)


def _psit(zet):
    """Scalar profile function (mod_ocn_coare.F90:399-417)."""
    zet_n = jnp.minimum(zet, -1e-12)
    x = (1.0 - 15.0 * zet_n) ** 0.5
    psik = 2.0 * jnp.log((1.0 + x) / 2.0)
    x = (1.0 - 34.15 * zet_n) ** 0.3333
    psic = (1.5 * jnp.log((1.0 + x + x * x) / 3.0)
            - jnp.sqrt(3.0) * jnp.arctan((1.0 + 2.0 * x) / jnp.sqrt(3.0))
            + 4.0 * jnp.arctan(1.0) / jnp.sqrt(3.0))
    f = zet_n * zet_n / (1.0 + zet_n * zet_n)
    unstable = (1.0 - f) * psik + f * psic
    zet_p = jnp.maximum(zet, 0.0)
    cc = jnp.minimum(50.0, 0.35 * zet_p)
    stable = -((1.0 + 2.0 / 3.0 * zet_p) ** 1.5
               + 0.667 * (zet_p - 14.28) / jnp.exp(cc) + 8.525)
    return jnp.where(zet < 0.0, unstable, stable)


def _scalar_roughness_ice(rr):
    """Andreas (1987) snow/ice roughness Reynolds laws (:231-244)."""
    lrr = jnp.log(jnp.maximum(rr, 1e-30))
    rt = jnp.where(
        rr <= 0.135, rr * jnp.exp(1.250),
        jnp.where(rr <= 2.5, rr * jnp.exp(0.149 - 0.550 * lrr),
                  jnp.where(rr <= 1000.0,
                            rr * jnp.exp(0.317 - 0.565 * lrr
                                         - 0.183 * lrr * lrr),
                            1e-10)))
    rq = jnp.where(
        rr <= 0.135, rr * jnp.exp(1.610),
        jnp.where(rr <= 2.5, rr * jnp.exp(0.351 - 0.628 * lrr),
                  jnp.where(rr <= 1000.0,
                            rr * jnp.exp(0.396 - 0.512 * lrr
                                         - 0.180 * lrr * lrr),
                            1e-10)))
    return rt, rq


def _scalar_roughness_ocean(rr):
    """Liu et al. (1979) roughness Reynolds laws (:246-274)."""
    rs = jnp.maximum(rr, 1e-30)
    bounds = [0.11, 0.8, 3.0, 10.0, 30.0, 100.0, 300.0, 1000.0]
    rt_co = [(0.177, 0.0), (1.376, 0.929), (1.026, -0.599),
             (1.625, -1.018), (4.661, -1.475), (34.904, -2.067),
             (1667.19, -2.907), (5.88e5, -3.935)]
    rq_co = [(0.292, 0.0), (1.808, 0.826), (1.393, -0.528),
             (1.956, -0.870), (4.994, -1.297), (30.709, -1.845),
             (1448.68, -2.682), (2.98e5, -3.616)]
    rt = jnp.full_like(rr, 1e-10)
    rq = jnp.full_like(rr, 1e-10)
    for b, (at, pt), (aq, pq) in zip(reversed(bounds),
                                     reversed(rt_co), reversed(rq_co)):
        rt = jnp.where(rr <= b, at * rs ** pt, rt)
        rq = jnp.where(rr <= b, aq * rs ** pq, rq)
    return rt, rq


class CoareOut(NamedTuple):
    sent: jax.Array      # sensible heat flux (W/m2, + upward)
    evpr: jax.Array      # evaporation (kg/m2/s)
    drag: jax.Array      # usr²·rhox/uv995 (uvdrag)
    ustar: jax.Array
    u10: jax.Array
    t2m: jax.Array
    q2m: jax.Array
    zo: jax.Array


def coare3(usw, vsw, tatm, qvmix, ht, sfps, sfta, tgrd, hpbl,
           rswf, rlwf, rhox, icemask=None) -> CoareOut:
    """COARE3 fluxes over ocean (and sea ice, via ``icemask``).

    usw/vsw: lowest-level winds (m/s); tatm: lowest-level T (K);
    qvmix: lowest-level water vapor mixing ratio; ht: level height (m);
    sfps: surface pressure (Pa); sfta: surface air temperature (K,
    ``lm%sfta = tp3d[kz]``, mod_lm_interface.F90:339); tgrd: SST (K);
    hpbl: PBL height (m); rswf: net surface SW (+down, W/m2); rlwf: net
    surface LW cooling (+up, W/m2, ``flw``); rhox: surface air density.

    Note the reference's temperature contrast (``dt = ta - t995 - tzero``,
    :143) is ``sfta − tatm`` — the adiabatic surface-referencing offset,
    NOT the sea−air difference; the SST drives the fluxes through
    ``qs(SST)``, the cool-skin model and the latent heat. This port
    reproduces that behavior exactly (it is the parity contract).
    """
    iflag = (icemask > 0.5) if icemask is not None \
        else jnp.zeros_like(tatm, bool)
    ts = tgrd - c.tzero
    uv995 = jnp.maximum(jnp.sqrt(usw ** 2 + vsw ** 2), 0.02)
    t995 = tatm - c.tzero
    q995 = qvmix
    zu = zt = zq = ht
    zi = jnp.maximum(hpbl, 10.0)
    ta = sfta

    cpv = cpmf(q995)
    le = wlh(tgrd)
    rhoa = sfps / (c.rgas * ta * (1.0 + c.ep1 * q995))
    visa = 1.326e-5 * (1.0 + 6.542e-3 * t995 + 8.301e-6 * t995 ** 2
                       - 4.84e-9 * t995 ** 3)
    bigc = 16.0 * c.egrav * CPW * (RHOW * VISW) ** 3 / (TCW * TCW
                                                        * rhoa * rhoa)
    al = jnp.where(ts > -2.0,
                   2.1e-5 * jnp.maximum(ts + 3.2, 1e-6) ** 0.79,
                   2.4253e-05)
    rns = rswf
    rnl = rlwf

    qs = pfqsat(tgrd, sfps) * 0.98
    wetc = pfqsdt(tgrd, sfps)
    q995 = q995 / (1.0 + q995)          # specific humidity
    dt = ta - t995 - c.tzero
    dq = qs - q995
    du = uv995                           # us = 0 (no currents)
    ug = 0.5
    ut = jnp.sqrt(du * du + ug * ug)
    dter = jnp.where(iflag, 0.0, 0.3)

    zogs = jnp.where(iflag, 4.5e-4, 1e-4)
    u10 = ut * jnp.log(10.0 / zogs) / jnp.log(zu / zogs)
    cdhg = c.vonkar / jnp.log(10.0 / zogs)
    usr = cdhg * u10
    zo10 = jnp.where(iflag, zogs,
                     0.011 * usr * usr * c.regrav + 0.11 * visa / usr)
    cd10 = (c.vonkar / jnp.log(10.0 / zo10)) ** 2
    ch10 = jnp.where(iflag, 0.0015, 0.00115)
    ct10 = ch10 / jnp.sqrt(cd10)
    zot10 = 10.0 / jnp.exp(c.vonkar / ct10)
    cd = (c.vonkar / jnp.log(zu / zo10)) ** 2
    ct = c.vonkar / jnp.log(zt / zot10)
    cc = c.vonkar * ct / cd
    ribcu = -zu / zi / 0.004 / BETA ** 3
    br = -c.egrav * zu / ta * ((dt - dter) + c.ep1 * ta * dq) / ut ** 2
    zetu = jnp.where(br < 0.0, cc * br / (1.0 + br / ribcu),
                     cc * br * (1.0 + 3.0 * br / cc))
    l10 = zu / zetu
    one_iter = zetu > 50.0

    usr = ut * c.vonkar / (jnp.log(zu / zo10) - _psiuo(zu / l10))
    tsr = -(dt - dter) * c.vonkar * FDG \
        / (jnp.log(zt / zot10) - _psit(zt / l10))
    qsr = -(dq - wetc * dter) * c.vonkar * FDG \
        / (jnp.log(zq / zot10) - _psit(zq / l10))
    tkt = jnp.full_like(usr, 0.001)
    ram1 = jnp.log(zu / zo10)
    zo = zo10

    def body(k, carry):
        usr, tsr, qsr, ut, ug, dter, tkt, zo, ram1 = carry
        zet = c.vonkar * c.egrav * zu / ta \
            * (tsr + c.ep1 * ta * qsr) / (usr * usr)
        zo_n = jnp.where(iflag, zogs,
                         0.011 * usr * usr * c.regrav + 0.11 * visa / usr)
        rr = zo_n * usr / visa
        rt_i, rq_i = _scalar_roughness_ice(rr)
        rt_o, rq_o = _scalar_roughness_ocean(rr)
        rt = jnp.where(iflag, rt_i, rt_o)
        rq = jnp.where(iflag, rq_i, rq_o)
        ll = zu / zet
        zot = rt * visa / usr
        zoq = rq * visa / usr
        ram = jnp.log(zu / zo_n) - _psiuo(zu / ll)
        rah = jnp.log(zt / zot) - _psit(zt / ll)
        usr_n = ut * c.vonkar / ram
        tsr_n = -(dt - dter) * c.vonkar * FDG / rah
        qsr_n = -(dq - wetc * dter) * c.vonkar * FDG \
            / (jnp.log(zq / zoq) - _psit(zq / ll))
        bf = -c.egrav / ta * usr_n * (tsr_n + c.ep1 * ta * qsr_n)
        ug_n = jnp.where(bf > 0.0,
                         BETA * jnp.maximum(bf * zi, 0.0) ** 0.333, 0.2)
        ut_n = jnp.sqrt(du * du + ug_n * ug_n)
        hsb = -rhoa * c.cpd * usr_n * tsr_n
        hlb = -rhoa * le * usr_n * qsr_n
        qout = rnl + hsb + hlb
        dels = rns * (0.137 + 11.0 * tkt
                      - 6.6e-5 / tkt * (1.0 - jnp.exp(-tkt / 8.0e-4)))
        qcol = qout - dels
        alq = al * qcol + BE * hlb * CPW / le
        xlamx = 6.0 / (1.0 + (bigc * jnp.maximum(alq, 0.0)
                              / usr_n ** 4) ** 0.75) ** 0.333
        tkt_n = xlamx * VISW / (jnp.sqrt(rhoa / RHOW) * usr_n)
        dter_n = jnp.where(
            (qcol > 0.0) & (alq >= 0.0), qcol * tkt_n / TCW, 0.0)
        tkt_n = jnp.where((qcol > 0.0) & (alq >= 0.0), tkt_n, tkt)
        dter_n = jnp.where(iflag, 0.0, dter_n)
        # per-point early exit: points with zetu>50 keep iteration-1
        # values (reference niter=1, :205)
        upd = (k == 0) | (~one_iter)
        sel = lambda new, old: jnp.where(upd, new, old)
        return (sel(usr_n, usr), sel(tsr_n, tsr), sel(qsr_n, qsr),
                sel(ut_n, ut), sel(ug_n, ug), sel(dter_n, dter),
                sel(tkt_n, tkt), sel(zo_n, zo), sel(ram, ram1))

    carry = (usr, tsr, qsr, ut, ug, dter, tkt, zo, ram1)
    for k in range(3):
        carry = body(k, carry)
    usr, tsr, qsr, ut, ug, dter, tkt, zo, ram1 = carry

    uv10 = jnp.where(
        zetu < 0.0,
        uv995 + (usr / c.vonkar) * (jnp.log(10.0 / zu)
                                    - (_psiuo(zetu) - _psiuo(zu / l10))),
        uv995 + (usr / c.vonkar) * (jnp.log(10.0 / zu)
                                    + 5.0 * zetu - 5.0 * zu / l10))
    hsb = -rhoa * c.cpd * usr * tsr
    hlb = -rhoa * le * usr * qsr
    sent = jnp.where(jnp.abs(hsb) < c.dlowval, 0.0, hsb)
    evpr = jnp.maximum(hlb / le, 0.0)
    evpr = jnp.where(evpr < c.dlowval, 0.0, evpr)
    facttq = jnp.log(ht * 0.5) / jnp.log(ht / zo)
    drag = usr ** 2 * rhox / uv995
    t2m = t995 + c.tzero - dt * facttq
    q2m = q995 - dq * facttq
    return CoareOut(sent=sent, evpr=evpr, drag=drag, ustar=usr,
                    u10=uv10, t2m=t2m, q2m=q2m, zo=zo)
