"""Pallas TPU kernels for the MOLOCH hot path (SURVEY §7 stage 5).

The acoustic substep's implicit-w solve is two vertical sweeps
(Thomas algorithm) per substep; as ``lax.scan``s they materialize
their operands to HBM twice per substep × nsound × step — the
dominant share of the base step's 2.5 GB/step traffic.  Here the two
sweeps run inside one kernel with the whole column resident in VMEM,
tiled over (y, x) blocks (column-local: no halos), so the operands
make one HBM round trip.

Backend gating: the kernel runs on TPU; everywhere else the caller's
pure-``lax.scan`` path is used (and the equivalence test runs this
kernel in interpreter mode against it).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tridiag_w_kernel(wexpl_ref, zm_ref, zp_ref, wbot_ref, out_ref,
                      wprov_ref, wwkw_ref):
    """Implicit-w up/down sweeps (sound, mod_moloch.F90:838-905) for
    one (y, x) block; interfaces K = 1..kz-1 are rows 0..n-1 of the
    refs, with K increasing DOWNWARD (row n-1 is the lowest interior
    interface, next to the surface)."""
    n = wexpl_ref.shape[0]

    # upward sweep: K = kz-1 .. 1 (rows n-1 .. 0); carry w_{K+1}
    def up(j, carry):
        w_below, wwkw_below = carry
        i = n - 1 - j
        zm = zm_ref[i]
        zp = zp_ref[i]
        zrapp = 1.0 / (1.0 + zm + zp - zm * wwkw_below)
        w_k = zrapp * (wexpl_ref[i] + zm * w_below)
        wwkw_k = zrapp * zp
        wprov_ref[i] = w_k
        wwkw_ref[i] = wwkw_k
        return (w_k, wwkw_k)

    zero = jnp.zeros_like(wbot_ref[:])
    jax.lax.fori_loop(0, n, up, (wbot_ref[:], zero))

    # downward sweep: w[K] = w_prov[K] + wwkw[K]·w[K-1], w[0] = 0
    def dn(i, w_above):
        w_k = wprov_ref[i] + wwkw_ref[i] * w_above
        out_ref[i] = w_k
        return w_k

    jax.lax.fori_loop(0, n, dn, zero)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tridiag_w(wexpl, zm, zp, w_bot, interpret=False):
    """Batched implicit-w solve.  wexpl/zm/zp (n, iy, jx) with n =
    kz-1 interior interfaces ordered top→bottom; w_bot (iy, jx) the
    surface boundary value.  Returns w at the interior interfaces,
    (n, iy, jx)."""
    n, iy, jx = wexpl.shape
    by = 8
    bx = 128
    grid = (pl.cdiv(iy, by), pl.cdiv(jx, bx))
    spec3 = pl.BlockSpec((n, by, bx), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((by, bx), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _tridiag_w_kernel,
        out_shape=jax.ShapeDtypeStruct((n, iy, jx), wexpl.dtype),
        grid=grid,
        in_specs=[spec3, spec3, spec3, spec2],
        out_specs=spec3,
        scratch_shapes=[
            pltpu.VMEM((n, by, bx), wexpl.dtype),
            pltpu.VMEM((n, by, bx), wexpl.dtype),
        ],
        interpret=interpret,
    )(wexpl, zm, zp, w_bot)


def tpu_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
