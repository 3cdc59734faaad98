"""Tracer convective transport — the well-mixed redistribution of
``Main/chemlib/mod_che_cumtran.F90`` (cumtran1 :73, cumtran2 :118).

On every syncro_cum alarm (mod_tendency.F90:595-603), columns whose
active cumulus scheme does not transport tracers internally (anything
but Emanuel/Tiedtke, init_cumtran :56-68) blend each tracer toward its
sigma-weighted column mean over the cumulus-cloud depth, weighted by
the convective cloud fraction:

    chi(k) ← chi(k)·(1−f(k)) + f(k)·⟨chi⟩        k ∈ [kctop, kz]

with ⟨chi⟩ = Σ chi·Δσ / Σ Δσ over the same span and f = convcldfra
(the cumulus scheme's cloud fraction, mod_tendency.F90:1727). The
cloud-top index is recovered from the held convective cloud fraction;
the reference clamps it to level 4 (1-based) — here 0-based index 3.
"""
from __future__ import annotations

import jax.numpy as jnp


def cumtran(chis, cucldfra, dsigma, dotran):
    """Redistribute tracers in convective columns.

    chis: tuple of (ntr, kz, iy, jx) tracer arrays (the leapfrog
    pair for the hydrostatic core — cumtran2 —, a 1-tuple for
    MOLOCH — cumtran1); cucldfra (kz, iy, jx) held cumulus cloud
    fraction; dsigma (kz,); dotran (iy, jx) bool mask of columns
    whose scheme needs external transport. Returns the tuple updated.
    """
    kz = cucldfra.shape[0]
    karr = jnp.arange(kz)[:, None, None]
    cloudy = cucldfra > 0.0
    has_cloud = cloudy.any(axis=0)
    # top-down index of the first cloudy level, clamped (:92)
    kctop = jnp.maximum(jnp.argmax(cloudy, axis=0), 3)
    span = (karr >= kctop[None]) & has_cloud[None] & dotran[None]
    ds = dsigma[:, None, None]
    deltas = jnp.sum(jnp.where(span, ds, 0.0), axis=0)
    f = jnp.where(span, cucldfra, 0.0)
    out = []
    for chi in chis:
        chibar = jnp.sum(jnp.where(span[None], chi * ds[None], 0.0),
                         axis=1) / jnp.maximum(deltas, 1e-10)[None]
        out.append(jnp.where(span[None],
                             chi * (1.0 - f[None])
                             + f[None] * chibar[:, None],
                             chi))
    return tuple(out)
