"""Diurnal cycle of SST (idcsst=1) — Zeng & Beljaars (2005) prognostic
skin temperature, re-derived from the reference's dcsst branch of the
Zeng ocean-flux driver (``Main/ocnlib/mod_ocn_zeng.F90:293-377``).

A warm-layer temperature difference dts between the 3 m bulk SST and
the sublayer top evolves prognostically with solar absorption in the
layer (3-exponential transmission), Monin-Obukhov-stable mixing, and
an exponential-in-time update; a molecular cool-skin correction then
gives the skin temperature fed back to the flux calculation as Tg.

Packed persistent state (3, iy, jx): deltas (cool-skin thickness, m),
tdeltas (warm-layer top temperature, K), tskin (skin temperature, K).
Everything elementwise → dense masked algebra.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c

A1, A2, A3 = 0.28, 0.27, 0.45
B1, B2, B3 = 71.5, 2.8, 0.07
ALPHAW = 0.207e-06       # thermal expansion of water
NUW = 1.004e-06          # kinematic viscosity of water
KW = 0.60                # thermal conductivity of water
NU = 0.3                 # warm-layer profile exponent
DD = 3.0                 # bulk SST reference depth (m)
CPW0 = 4190.0            # specific heat of sea water


class DcsstOut(NamedTuple):
    dcsst: jax.Array     # packed (3, iy, jx) updated state
    tskin: jax.Array     # skin temperature to use as ocean Tg


def dcsst(sst_bulk, swabs, lwnet_up, hfx, qfx, ustar_air, rhox,
          state_in, ocnmask, dtsst):
    """One skin-temperature step (mod_ocn_zeng.F90:293-377).

    sst_bulk: driving (3 m) SST; swabs: net absorbed SW (W/m2);
    lwnet_up: net upward LW; hfx/qfx: sensible flux (W/m2, +up) and
    evaporation (kg/m2/s); ustar_air: air-side friction velocity."""
    deltas0 = jnp.maximum(state_in[0], 1.0e-6)
    tdeltas0 = state_in[1]
    td = sst_bulk
    # first step: tdeltas uninitialized (0) → start at bulk SST
    tdelta = jnp.where(tdeltas0 > 100.0, tdeltas0, td)
    delta = jnp.where(state_in[0] > 0.0, deltas0, 0.001)

    rs = swabs
    rd = rs * (A1 * jnp.exp(-DD * B1) + A2 * jnp.exp(-DD * B2)
               + A3 * jnp.exp(-DD * B3))
    ustarw = 0.5 * ustar_air * jnp.sqrt(rhox / c.rhoh2o)
    ustarw = jnp.maximum(ustarw, 1.0e-5)
    lh = qfx * c.wlhv
    q = -(lh + hfx + lwnet_up)
    fs = 0.065 + 11.0 * delta - (6.6e-5 / delta) \
        * (1.0 - jnp.exp(-delta / 8.0e-4))
    dts = tdelta - td
    fd = jnp.where(
        dts > 0.0,
        jnp.sqrt(NU * c.egrav * ALPHAW / (5.0 * DD)) * c.rhoh2o
        * CPW0 * ustarw ** 2 * jnp.sqrt(jnp.maximum(dts, 0.0)),
        c.egrav * ALPHAW * (q + rs - rd))
    lmo = c.rhoh2o * CPW0 * ustarw ** 3 \
        / (c.vonkar * jnp.where(jnp.abs(fd) < 1e-12, 1e-12, fd))
    dol = DD / lmo
    phidl = jnp.where(fd > 0.0,
                      jnp.where(dol >= 0.0, 1.0 + 5.0 * dol,
                                (1.0 - 16.0 * dol) ** -0.5),
                      1.0)
    aa = (q + rs - rd) / (DD * CPW0 * c.rhoh2o * NU / (NU + 1.0))
    bb = (NU + 1.0) * c.vonkar * ustarw / (DD * phidl)
    dtstend = aa - dts * (1.0 - jnp.exp(-bb * dtsst)) / dtsst
    dts = dts + dtstend * dtsst
    tdelta = dts + td
    # cool-skin correction
    aa2 = -16.0 * c.egrav * ALPHAW * c.rhoh2o * CPW0 * NUW ** 3 \
        / (ustarw ** 4 * KW ** 2)
    qfs = q + rs * fs
    cool = aa2 * qfs > 0.0
    lamb = 6.0 * (1.0 + jnp.maximum(aa2 * qfs, 0.0) ** 0.75) \
        ** (-1.0 / 3.0)
    delta_new = jnp.where(cool, lamb * NUW / ustarw, delta)
    tskin = jnp.where(cool,
                      delta_new / (c.rhoh2o * CPW0 * KW) * qfs
                      + tdelta,
                      tdelta)
    m = (ocnmask < 0.5)
    out = jnp.stack([
        jnp.where(m, delta_new, 0.0),
        jnp.where(m, tdelta, 0.0),
        jnp.where(m, tskin, sst_bulk)])
    return DcsstOut(dcsst=out, tskin=jnp.where(m, tskin, sst_bulk))
