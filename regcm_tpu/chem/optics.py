"""Aerosol optical properties for the CCM3 (standard) radiation —
the dust part of ``aeroppt`` (``Main/radlib/mod_rad_aerosol.F90:
1955-2260``): external mixture over tracer bins, per CCM3 spectral
interval (nspi=19), plus the grey LW dust transmission ``aertrlw``.

The SW mixture quantities follow the reference's layout for radcsw:
tauxar3d = Σ τ; tauasc3d = Σ ω·τ; gtota3d = Σ g·ω·τ;
ftota3d = Σ g²·ω·τ (already ω-and-τ-weighted numerators).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import constants as c
from ._dust_optics_data import (KSDUST_STAND, WSDUST_STAND,
                                GSDUST_STAND, KSDUST12_STAND,
                                WSDUST12_STAND, GSDUST12_STAND)

QABSLW_DUST = 0.1      # grey LW absorption coeff m²/g (aeroppt :2203)
FIVEOTHREE = 5.0 / 3.0


class AerosolOptics(NamedTuple):
    """Per-tracer SW tables for the external mixture (nspi, ntr)."""
    ks: jax.Array
    ws: jax.Array
    gs: jax.Array
    lw_mask: jax.Array    # per-tracer 1.0 where the grey LW term applies


def dust_optics_tables(ntr: int, dtype=None) -> AerosolOptics:
    """DUST/DU12 SW tables (ksdust_stand/ksdust12_stand)."""
    if ntr == 4:
        ks, ws, gs = KSDUST_STAND, WSDUST_STAND, GSDUST_STAND
    elif ntr == 12:
        ks, ws, gs = KSDUST12_STAND, WSDUST12_STAND, GSDUST12_STAND
    else:
        raise ValueError(f"no dust optics for ntr={ntr}")
    f = (lambda x: jnp.asarray(x, dtype)) if dtype is not None \
        else jnp.asarray
    return AerosolOptics(ks=f(ks), ws=f(ws), gs=f(gs),
                         lw_mask=f(np.ones(ntr)))


class SWAerosol(NamedTuple):
    """radcsw aerosol inputs, (ncol, kz+1, nspi) padded like the cloud
    optical arrays (extra CCM3 top layer at index 0)."""
    tauxar: jax.Array
    tauasc: jax.Array
    gtota: jax.Array
    ftota: jax.Array


def sw_aerosol_mixture(aermmr, pint_pa, tab: AerosolOptics) -> SWAerosol:
    """External mixture over bins (aeroppt spectral loop :2010-2140).

    aermmr (ntr, ncol, kz) decoupled kg/kg; pint_pa (ncol, kz+1) Pa.
    """
    path = (pint_pa[:, 1:] - pint_pa[:, :-1]) * c.regrav   # kg/m²
    u = aermmr * path[None] * 1000.0                       # g/m²
    # tau (ntr, ncol, kz, nspi)
    tau = u[..., None] * tab.ks.T[:, None, None, :]
    wtau = tau * tab.ws.T[:, None, None, :]
    tauxar = jnp.sum(tau, axis=0)
    tauasc = jnp.sum(wtau, axis=0)
    gtota = jnp.sum(wtau * tab.gs.T[:, None, None, :], axis=0)
    ftota = jnp.sum(wtau * tab.gs.T[:, None, None, :] ** 2, axis=0)
    pad = lambda a: jnp.concatenate(
        [jnp.zeros_like(a[:, :1]), a], axis=1)
    return SWAerosol(tauxar=pad(tauxar), tauasc=pad(tauasc),
                     gtota=pad(gtota), ftota=pad(ftota))


def lw_dust_path(aermmr, pint_pa, lw_mask):
    """Cumulative dust path u(k) from TOA (g/m²) for the grey LW
    transmission aertrlw(k1,k2)=exp(−5/3·qabs·|u(k2)−u(k1)|)
    (aeroppt :2203-2250).  Returns (ncol, kz+1) cumulative path."""
    path = (pint_pa[:, 1:] - pint_pa[:, :-1]) * c.regrav
    u = jnp.sum(aermmr * lw_mask[:, None, None], axis=0) \
        * path * 1000.0
    return jnp.concatenate(
        [jnp.zeros_like(u[:, :1]), jnp.cumsum(u, axis=1)], axis=1)
