"""TPU-friendly math primitives shared across the physics stack."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cumsum_mm(x, axis, reverse=False):
    """Cumulative sum via triangular matmul.

    Replaces ``jnp.cumsum`` on model-level axes: XLA's reduce-window
    lowering of cumsum trips a libtpu fusion-emitter assert
    (``window_bounds kz-1 vs stride kz``) when the cumulus and
    radiation stages fuse at small kz (seen at kz=14, f32), and the
    (n, n) triangular matmul runs on the MXU instead of the vector
    unit anyway (n = kz+1 ≤ 64 for every supported configuration).

    ``reverse=True`` gives the suffix sum out[i] = Σ_{j≥i} x[j]
    (equivalent to ``cumsum(x[::-1])[::-1]`` on ``axis``).
    """
    n = x.shape[axis]
    tri = jnp.tril(jnp.ones((n, n), x.dtype))
    if reverse:
        tri = tri.T
    xm = jnp.moveaxis(x, axis, -1)
    # HIGHEST: the MXU's default bf16 rounding would turn an exact
    # 0/1-weighted prefix sum into a ~1e-2-relative one
    out = jnp.matmul(xm, tri.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, axis)


def cumprod_hs(x, axis):
    """Cumulative product via Hillis-Steele doubling (log₂ n fused
    shift-multiply steps) — same libtpu reduce-window workaround as
    :func:`cumsum_mm`, for the product case.  Matches
    ``jnp.cumprod`` up to multiply reassociation."""
    n = x.shape[axis]
    xm = jnp.moveaxis(x, axis, -1)
    sh = 1
    while sh < n:
        ones = jnp.ones_like(xm[..., :sh])
        xm = xm * jnp.concatenate([ones, xm[..., :-sh]], axis=-1)
        sh *= 2
    return jnp.moveaxis(xm, -1, axis)
