"""Stencil helpers for (…, y, x) arrays.

Shifts are implemented with static pad+slice so the XLA SPMD partitioner
turns them into halo exchanges (collective-permutes) when the arrays are
sharded over a device mesh — the TPU-native equivalent of the reference's
``exchange`` MPI halo calls (``Main/mpplib/mod_mppparam.F90:209-261``).
"""
from __future__ import annotations

import contextlib
import functools

import jax.numpy as jnp

# Trace-time topology flags (band / CRM modes). The reference's
# set_nproc builds an x-periodic (tropical band, i_band=1) or doubly
# periodic (CRM, i_crm=1) cartesian topology
# (Main/mpplib/mod_mppparam.F90:1131 dim_period); here periodic
# directions turn pad/slice shifts into jnp.roll, which the XLA SPMD
# partitioner lowers to wrap-around collective permutes on the mesh.
_PX = False     # periodic in x (band or CRM)
_PY = False     # periodic in y (CRM)


@contextlib.contextmanager
def topology(periodic_x: bool = False, periodic_y: bool = False):
    """Set the stencil topology for code traced within this context."""
    global _PX, _PY
    old = (_PX, _PY)
    _PX, _PY = bool(periodic_x), bool(periodic_y)
    try:
        yield
    finally:
        _PX, _PY = old


def with_topology(fn):
    """Method decorator: trace the body under the core's grid topology
    (core.periodic_x/periodic_y attributes, default non-periodic)."""
    @functools.wraps(fn)
    def wrapped(self, *a, **k):
        with topology(getattr(self, "periodic_x", False),
                      getattr(self, "periodic_y", False)):
            return fn(self, *a, **k)
    return wrapped


def periodic_x() -> bool:
    return _PX


def periodic_y() -> bool:
    return _PY


def shift(a, dy: int, dx: int, fill=0.0):
    """out[..., y, x] = a[..., y+dy, x+dx]; out-of-range → fill (or
    wraps around on a periodic axis).

    dy/dx are static Python ints (|d| small). Matches reading the
    neighbour's halo cell in the reference's exchanged arrays.
    """
    if dy == 0 and dx == 0:
        return a
    if _PX and dx != 0:
        a = jnp.roll(a, -dx, axis=-1)
        dx = 0
        if dy == 0:
            return a
    if _PY and dy != 0:
        a = jnp.roll(a, -dy, axis=-2)
        dy = 0
        if dx == 0:
            return a
    ny, nx = a.shape[-2], a.shape[-1]
    pad = [(0, 0)] * (a.ndim - 2)
    py = (max(-dy, 0), max(dy, 0))
    px = (max(-dx, 0), max(dx, 0))
    ap = jnp.pad(a, pad + [py, px], constant_values=fill)
    ys = py[0] + dy
    xs = px[0] + dx
    return ap[..., ys:ys + ny, xs:xs + nx]


def shifte(a, dy: int, dx: int):
    """Shift with edge-replication fill (for smooth padding); periodic
    axes wrap instead."""
    if dy == 0 and dx == 0:
        return a
    if _PX and dx != 0:
        a = jnp.roll(a, -dx, axis=-1)
        dx = 0
        if dy == 0:
            return a
    if _PY and dy != 0:
        a = jnp.roll(a, -dy, axis=-2)
        dy = 0
        if dx == 0:
            return a
    ny, nx = a.shape[-2], a.shape[-1]
    pad = [(0, 0)] * (a.ndim - 2)
    py = (max(-dy, 0), max(dy, 0))
    px = (max(-dx, 0), max(dx, 0))
    ap = jnp.pad(a, pad + [py, px], mode="edge")
    ys = py[0] + dy
    xs = px[0] + dx
    return ap[..., ys:ys + ny, xs:xs + nx]


def kshift(a, dk: int, fill=0.0):
    """Shift along the level axis (axis -3): out[k] = a[k+dk]."""
    if dk == 0:
        return a
    nk = a.shape[-3]
    pad = [(0, 0)] * a.ndim
    pad[-3] = (max(-dk, 0), max(dk, 0))
    ap = jnp.pad(a, pad, constant_values=fill)
    ks = pad[-3][0] + dk
    return ap[..., ks:ks + nk, :, :]


def cross2dot(pc):
    """4-point average of a cross field to dot points with the reference's
    edge handling (psc2psd, Main/mpplib/mod_mppparam.F90:13811-13862):
    interior 4-pt, edges 2-pt, corners 1-pt.

    Implemented via edge-replicated SW shift: since the cross array's dead
    last row/col is edge-replicated, averaging a[y,x], a[y-1,x], a[y,x-1],
    a[y-1,x-1] with replicate padding reproduces edge/corner formulas.
    """
    a00 = pc
    a10 = shifte(pc, -1, 0)
    a01 = shifte(pc, 0, -1)
    a11 = shifte(pc, -1, -1)
    return 0.25 * (a00 + a10 + a01 + a11)


def dot2cross(pd):
    """4-point average of a dot field to cross points:
    0.25*(d[y,x]+d[y,x+1]+d[y+1,x]+d[y+1,x+1]) (see mkslice
    Main/mod_slice.F90:186-193)."""
    return 0.25 * (pd + shift(pd, 0, 1) + shift(pd, 1, 0) + shift(pd, 1, 1))
