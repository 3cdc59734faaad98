"""Cloud fraction schemes (icldfrac dispatch).

jax ports of the ``Main/cloudlib/`` scheme family selected by
``icldfrac`` (dispatch at ``Main/mod_micro_interface.F90:254-268``):
1 Xu-Randall, 3 Gultepe-Isaac, 4 Texeira, 5 Tompkins, 6 ECHAM5
(0/default = SUBEX-Sundqvist lives in physics/micro/subex.py; 2 Thompson
scale-aware is a later round, needing the ice-saturation tables).
All elementwise on (kz, iy, jx) arrays.
"""
from __future__ import annotations

import jax.numpy as jnp


def xuran_cldfrac(p, qc, qv, qs, rh, rhmin=0.01, rhmax=1.01):
    """Xu & Randall (1996) (mod_cloud_xuran.F90)."""
    rhrng = jnp.clip(rh, rhmin, rhmax)
    botm = rhrng ** 0.25
    rm = -(100.0 * qc) / jnp.maximum(
        ((1.0 - rhrng) * qs) ** 0.49, 1e-12)
    fcc = botm * (1.0 - jnp.exp(rm))
    fcc = jnp.where(rhrng > 0.99999, 1.0, fcc)
    return jnp.where(qc < 1.0e-7, 0.0, jnp.clip(fcc, 0.0, 1.0))


def gulisa_cldfrac(qv, qs, qt, ds_km):
    """Gultepe & Isaac (mod_cloud_guli2007.F90): resolution-blended
    power laws of total condensate (g/kg)."""
    qgkg = (qt + jnp.maximum(qv - qs, 0.0)) * 1.0e3
    qgkg = jnp.maximum(qgkg, 0.0)
    fcc = (1.0 / 90.0) * ((100.0 - ds_km) * 5.57 * qgkg ** 0.78
                          + (ds_km - 10.0) * 4.82 * qgkg ** 0.94)
    return jnp.clip(fcc, 0.0, 1.0)


def texeira_cldfrac(qc, qs, rh):
    """Texeira (2001) source/dissipation equilibrium
    (mod_cloud_texeira.F90)."""
    kappa = 1.0e-6
    d = 4.0e-6
    rhrng = jnp.clip(rh, 0.001, 0.999)
    spq = qs / (1.0 + qs)
    arg = (4.0 * spq * (1.0 - rhrng) * kappa) \
        / jnp.maximum(d * qc, 1e-20)
    fcc = d * qc / (2.0 * spq * (1.0 - rhrng) * kappa) \
        * (-1.0 + jnp.sqrt(1.0 + arg))
    return jnp.where(qc > 1.0e-7, jnp.clip(fcc, 0.0, 1.0), 0.0)


def tompkins_cldfrac(qc, rh, p, ps):
    """Tompkins-style sigma-dependent critical RH
    (mod_cloud_tompkins.F90)."""
    rhrng = jnp.clip(rh, 0.001, 0.999)
    sig = p / ps[None]
    kappa = jnp.maximum(0.0, 0.9 * jnp.abs(sig - 0.2) ** 0.2)
    rhcrit = 0.7 * sig * (1.0 - sig) * (1.85 + 0.95 * (sig - 0.5))
    fcc = 1.0 - jnp.sqrt(jnp.clip(
        (1.0 - rhrng) / jnp.maximum(1.0 - rhcrit
                                    - kappa * (rhrng - rhcrit), 1e-10),
        0.0, None))
    fcc = jnp.where(rhrng > rhcrit, fcc, 0.0)
    return jnp.where(qc < 1.0e-7, 0.0, jnp.clip(fcc, 0.0, 1.0))


def echam5_cldfrac(qc, rh, p, ps):
    """ECHAM5 critical-RH Sundqvist form (mod_cloud_echam5.F90)."""
    ct, cs, nx = 0.35, 0.85, 4.0
    rhrng = jnp.clip(rh, 0.001, 0.999)
    sig = ps[None] / jnp.maximum(p, 1.0)
    rhcrit = ct + (ct - cs) * jnp.exp(
        jnp.clip(1.0 - sig ** nx, -50.0, 50.0))
    fcc = 1.0 - jnp.sqrt(jnp.clip(
        (1.0 - rhrng) / jnp.maximum(1.0 - rhcrit, 1e-10), 0.0, None))
    fcc = jnp.where(rhrng < rhcrit, 0.0,
                    jnp.where(rhrng > 0.99999, 1.0, fcc))
    return jnp.where(qc > 1.0e-7, jnp.clip(fcc, 0.0, 1.0), 0.0)


def cldfrac_dispatch(icldfrac, tb3, pb3, qvb3, qcb3, rh, qs, rh0, ps2d,
                     ds_km):
    """icldfrac dispatch (mod_micro_interface.F90:254-268)."""
    from ..micro.subex import subex_cldfrac
    if icldfrac == 1:
        return xuran_cldfrac(pb3, qcb3, qvb3, qs, rh)
    if icldfrac == 3:
        return gulisa_cldfrac(qvb3, qs, qcb3, ds_km)
    if icldfrac == 4:
        return texeira_cldfrac(qcb3, qs, rh)
    if icldfrac == 5:
        return tompkins_cldfrac(qcb3, rh, pb3, ps2d)
    if icldfrac == 6:
        return echam5_cldfrac(qcb3, rh, pb3, ps2d)
    return subex_cldfrac(tb3, pb3, qvb3, qcb3, rh, rh0)
