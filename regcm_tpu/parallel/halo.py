"""Explicit ring halo exchange for shard_map regions.

The model's stencils normally partition through GSPMD (pad/slice →
collective-permute, SURVEY §2.7), but a ``pallas_call`` inside a
GSPMD-sharded jit does not partition — the Pallas kernels must be
wrapped in ``shard_map`` with halos fed explicitly.  This module is
the TPU-native analogue of the reference's nonblocking halo exchange
(``exchange_lrbt``, Main/mpplib/mod_mppparam.F90:209-261): width-h
neighbor bands move over ICI via ``lax.ppermute`` ring shifts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _edge_fill(sl, h, axis):
    """Replicate the outermost slice of `sl` h times (jnp.pad 'edge')."""
    return jnp.repeat(sl, h, axis=axis) if sl.shape[axis] == 1 else sl


def halo_expand(a, axis_name: str, axis: int, h: int, n: int,
                mode: str = "zero", periodic: bool = False):
    """Extend the local block `a` by h rows before and after along
    `axis`, filled from the ring neighbors on mesh axis `axis_name`
    (n devices).  At a non-periodic domain edge the halo is zeros
    (mode='zero', the stencil shift() fill) or edge-replicated
    (mode='edge', the shifte() metric-factor fill)."""
    la = a.shape[axis]
    assert la >= h, f"local extent {la} < halo {h}"
    first = jax.lax.slice_in_dim(a, 0, h, axis=axis)
    last = jax.lax.slice_in_dim(a, la - h, la, axis=axis)
    if n == 1:
        from_prev, from_next = last, first       # periodic self-wrap
    else:
        # prev neighbor's last h rows arrive as my leading halo
        from_prev = jax.lax.ppermute(
            last, axis_name, [(i, (i + 1) % n) for i in range(n)])
        # next neighbor's first h rows arrive as my trailing halo
        from_next = jax.lax.ppermute(
            first, axis_name, [(i, (i - 1) % n) for i in range(n)])
    if not periodic:
        if mode == "edge":
            lo = _edge_fill(jax.lax.slice_in_dim(a, 0, 1, axis=axis),
                            h, axis)
            hi = _edge_fill(jax.lax.slice_in_dim(a, la - 1, la,
                                                 axis=axis), h, axis)
        else:
            lo = jnp.zeros_like(first)
            hi = jnp.zeros_like(last)
        if n == 1:
            from_prev, from_next = lo, hi
        else:
            idx = jax.lax.axis_index(axis_name)
            from_prev = jnp.where(idx == 0, lo, from_prev)
            from_next = jnp.where(idx == n - 1, hi, from_next)
    return jnp.concatenate([from_prev, a, from_next], axis=axis)


def halo_expand2d(a, h: int, ny: int, nx: int, mode: str = "zero",
                  axis_names=("y", "x"), periodic_x: bool = False):
    """Halo-extend the trailing (y, x) dims by h on each side.
    Corners are filled by the second (x) exchange re-sending the
    already-extended y halo — the reference's corner composition."""
    a = halo_expand(a, axis_names[0], a.ndim - 2, h, ny, mode)
    return halo_expand(a, axis_names[1], a.ndim - 1, h, nx, mode,
                       periodic=periodic_x)
