"""Carbonaceous aerosol aging (``aging_carb``/``doaging``,
``Main/chemlib/mod_che_carbonaer.F90:145-180,265-300``).

Hydrophobic → hydrophilic conversion with the constant Cooke et al.
(1999) 1.15-day e-folding time (carb_aging_control=.false., the
reference default).  The condensation/coagulation dynamic aging
(doagingdyn) needs the SO4 production coupling and is a later tail.
Tendencies returned uncoupled (kg/kg/s).
"""
from __future__ import annotations

import jax.numpy as jnp

from .species import CARB_AGING_EFOLD

MINTR = 1.0e-30


def aging_tend(chi, aging_pairs, dt, efold=CARB_AGING_EFOLD):
    """chi: (ntr, kz, iy, jx) uncoupled mixing ratios.  For each
    (hydrophobic b1 → hydrophilic b2) pair, moves mass with the
    e-folding law (doaging, mod_che_carbonaer.F90:265-300)."""
    ten = jnp.zeros_like(chi)
    factor = (1.0 - jnp.exp(-dt / efold)) / dt
    for b1, b2 in aging_pairs:
        kav = jnp.maximum(chi[b1] - MINTR, 0.0)
        a = -kav * factor
        ten = ten.at[b1].add(a)
        ten = ten.at[b2].add(-a)
    return ten
