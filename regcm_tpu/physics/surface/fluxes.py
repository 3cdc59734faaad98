"""Surface turbulent fluxes + ground temperature (round-1 surface model).

Ocean: exact port of the BATS ocean-flux scheme (iocnflx=1, ``ocnbats``
``Main/ocnlib/mod_ocn_bats.F90:18-85``): fixed SST, bulk drag with
Richardson-number stability corrections.

Land: "BATS-lite" — the same BATS drag/stability formulas over land
roughness (zlnd) with a prescribed moisture availability and a
force-restore prognostic ground temperature closing the surface energy
balance (full BATS1e vegetation/soil/snow physics:
``Main/batslib/mod_bats_*`` is a later-round port; this module carries
its interface contract).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c
from ...utils.thermo import pfqsat

ZLND = 0.01     # land roughness (Share/mod_constants.F90:290)
ZOCE = 0.00023  # ocean roughness (:292)
WTUR = 0.1      # turbulent wind floor (:300)


class SurfaceOut(NamedTuple):
    hfx: jax.Array      # sensible heat flux (W/m2, + upward)
    qfx: jax.Array      # moisture flux (kg/m2/s)
    uvdrag: jax.Array   # rho·Cd·V (surface drag)
    tg: jax.Array       # updated ground temperature
    t2m: jax.Array
    q2m: jax.Array
    u10m: jax.Array
    v10m: jax.Array


def bats_drag(usw, vsw, tatm, tgrd, ht, rhox, z0):
    """BATS bulk drag (ocnbats, Main/ocnlib/mod_ocn_bats.F90:44-60)."""
    ribd = usw ** 2 + vsw ** 2 + WTUR ** 2
    vspda = jnp.sqrt(ribd)
    cdrn = (c.vonkar / jnp.log(ht / z0)) ** 2
    ribn = ht * c.egrav * (1.0 - tgrd / tatm)
    br = ribn / ribd
    cdrx = jnp.where(br < 0.0,
                     cdrn * (1.0 + 24.5 * jnp.sqrt(cdrn * jnp.abs(br))),
                     cdrn / (1.0 + 11.5 * br))
    cdrmin = jnp.maximum(0.25 * cdrn, 6.0e-4)
    cdrx = jnp.maximum(cdrx, cdrmin)
    drag = cdrx * vspda * rhox
    return drag, vspda, cdrn


def surface_fluxes(usw, vsw, tatm, qvatm, ht, rhox, sfps, tg, sst,
                   landmask, swabs, lwnet, prcp, dtsrf,
                   beta_lnd=0.5, iocnflx=2, hpbl=None) -> SurfaceOut:
    """Compute surface fluxes and advance land Tg by one surface step.

    usw/vsw: lowest-level winds (m/s); tatm/qvatm lowest-level T (K) and
    qv (mixing ratio); ht: lowest-level height (m); rhox: surface air
    density; sfps: surface pressure (Pa); tg: prognostic ground T;
    sst: prescribed ocean surface T; swabs: absorbed SW at surface
    (W/m2); lwnet: net downward LW (W/m2); dtsrf: surface timestep (s).
    """
    land = landmask > 0.5
    tgrd = jnp.where(land, tg, sst)
    z0 = jnp.where(land, ZLND, ZOCE)
    drag, vspda, cdrn = bats_drag(usw, vsw, tatm, tgrd, ht, rhox, z0)

    qs = qvatm / (1.0 + qvatm)            # specific humidity
    qgrd = pfqsat(tgrd, sfps)
    delt = tatm - tgrd
    delq = qs - qgrd
    beta = jnp.where(land, beta_lnd, 1.0)
    evpr = jnp.maximum(-drag * beta * delq, 0.0)
    sent = -drag * c.cpd * delt
    sent = jnp.where(jnp.abs(sent) < c.dlowval, 0.0, sent)
    evpr = jnp.where(evpr < c.dlowval, 0.0, evpr)
    if iocnflx == 2:
        # Zeng ocean fluxes replace BATS bulk over ocean points
        from .zeng import zengocn
        if hpbl is None:
            hpbl = jnp.full_like(ht, 500.0)
        zo = zengocn(usw, vsw, tatm, qvatm, ht, sfps,
                     sfps * 0.99, sst, hpbl)
        sent = jnp.where(land, sent, zo.sent)
        evpr = jnp.where(land, evpr, jnp.maximum(zo.evpr, 0.0))
        drag = jnp.where(land, drag, jnp.maximum(zo.drag, 1e-5))
    elif iocnflx == 3:
        # COARE3 bulk fluxes over ocean points (mod_ocn_coare.F90)
        from .coare import coare3
        if hpbl is None:
            hpbl = jnp.full_like(ht, 500.0)
        # sfta = tp3d[kz]: air T referenced adiabatically to the surface
        # (mod_slice.F90:125, mod_lm_interface.F90:339)
        sfta = tatm * (sfps / (sfps - rhox * c.egrav * ht)) ** c.rovcp
        co = coare3(usw, vsw, tatm, qvatm, ht, sfps,
                    sfta, sst, hpbl, swabs,
                    -lwnet, rhox)
        sent = jnp.where(land, sent, co.sent)
        evpr = jnp.where(land, evpr, jnp.maximum(co.evpr, 0.0))
        drag = jnp.where(land, drag, jnp.maximum(co.drag, 1e-5))

    # land ground temperature: force-restore energy balance
    # C_s dTg/dt = SWabs + LWnet − H − L·E − G;  G = restoring to deep T
    lh = jnp.where(tgrd > c.tzero, c.wlhv, c.wlhs)
    csoil = 3.0e5          # areal heat capacity (J/m2/K), ~5cm soil
    tau_deep = 86400.0
    tdeep = tatm           # diurnal force-restore toward near-sfc air T
    netflx = swabs + lwnet - sent - lh * evpr
    tg_new = tg + dtsrf * (netflx / csoil - (tg - tdeep) / tau_deep)
    # numerical safety
    tg_new = jnp.clip(tg_new, 180.0, 340.0)
    tg_out = jnp.where(land, tg_new, sst)

    fact = jnp.log(ht * 0.5) / jnp.log(ht / z0)
    factuv = jnp.log(ht * 0.1) / jnp.log(ht / z0)
    return SurfaceOut(
        hfx=sent, qfx=evpr, uvdrag=drag, tg=tg_out,
        t2m=tatm - delt * fact, q2m=qs - delq * fact,
        u10m=usw * (1.0 - factuv), v10m=vsw * (1.0 - factuv))
