"""Semi-Lagrangian tracer advection (isladvec=1) — re-derived from the
reference ``Main/mod_sladvection.F90`` (trajcalc_x :121, slhadv_x3d/x4d
:335-470; McGregor 1993 3rd-order departure points, Bermejo-Staniforth
quasi-monotone limiter per iqmsl).

Per step: departure displacements from a 3rd-order Taylor series of the
cross-point advective velocity, split into an integer cell offset
(|offset| ≤ 1, enforced by the model CFL) plus a fractional weight;
the upstream value is reconstructed with the reference's mixed
cubic/bilinear 4×4 stencil (cubic in x on the two inner y rows, linear
on the outer rows, cubic in y across), optionally clipped to the
bilinear box min/max (QMSL). The tendency is (upstream − var)/dt on the
coupled field, exactly like ``slhadv_x``.

TPU re-design: the per-point integer departure indices become gather
index arrays consumed by ``take_along_axis`` on the flattened (y, x)
plane — 10 dense gathers per field, no data-dependent control flow; the
reference's fatal on |offset|>1 becomes an index clip (the same CFL
contract guards both)."""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .stencil import shift, shifte, dot2cross


def sl_weights(ud, vd, msfx, dx, dt, iy, jx) -> Dict[str, jax.Array]:
    """Departure-point indices + interpolation weights on the cross
    grid (trajcalc_x). ud/vd: decoupled dot winds (kz, iy, jx)."""
    uadv = dot2cross(ud) / msfx[None]
    vadv = dot2cross(vd) / msfx[None]
    uap1 = shifte(uadv, 0, 1)
    uam1 = shifte(uadv, 0, -1)
    vap1 = shifte(vadv, 1, 0)
    vam1 = shifte(vadv, -1, 0)
    dtsq = dt * dt
    dtcb = dtsq * dt

    def displacement(a, ap1, am1):
        g1 = 0.5 * (ap1 - am1) / dx
        g2 = (ap1 - 2.0 * a + am1) / (dx * dx)
        return (-a * dt + 0.5 * dtsq * a * g1
                - dtcb * a * (g1 * g1 + a * g2) / 6.0)

    xdis = displacement(uadv, uap1, uam1)
    ydis = displacement(vadv, vap1, vam1)

    def split(dis):
        n = dis / dx
        # reference fatals on |int(n)| > 1; clip (same CFL contract)
        n = jnp.clip(n, -1.999, 1.999)
        npart = jnp.trunc(n)
        alfa = jnp.abs(npart - n)      # |(np*dx - dis)/dx|
        sn = jnp.where(n >= 0.0, 1, -1).astype(jnp.int32)
        return npart.astype(jnp.int32), alfa, sn

    xnp, alfax, xsn = split(xdis)
    ynp, betay, ysn = split(ydis)

    kz = ud.shape[0]
    jj = jnp.arange(jx, dtype=jnp.int32)[None, None, :]
    ii = jnp.arange(iy, dtype=jnp.int32)[None, :, None]
    clipx = lambda a: jnp.clip(a, 0, jx - 2)
    clipy = lambda a: jnp.clip(a, 0, iy - 2)
    xndp = clipx(jj + xnp)
    xnnm1 = clipx(xndp + xsn)
    xnnm2 = clipx(xnnm1 + xsn)
    xnnp1 = clipx(xndp - xsn)
    yndp = clipy(ii + ynp)
    ynnm1 = clipy(yndp + ysn)
    ynnm2 = clipy(ynnm1 + ysn)
    ynnp1 = clipy(yndp - ysn)

    def cubic(a):
        return (-(a * (1.0 - a * a)) / 6.0,
                (a * (1.0 + a) * (2.0 - a)) / 2.0,
                ((1.0 - a * a) * (2.0 - a)) / 2.0,
                -(a * (1.0 - a) * (2.0 - a)) / 6.0)

    am2, am1w, a0, ap1w = cubic(alfax)
    bm2, bm1w, b0, bp1w = cubic(betay)
    return dict(alffbl=alfax,
                am2=am2, am1=am1w, a0=a0, ap1=ap1w,
                bm2=bm2, bm1=bm1w, b0=b0, bp1=bp1w,
                xndp=xndp, xnnm1=xnnm1, xnnm2=xnnm2, xnnp1=xnnp1,
                yndp=yndp, ynnm1=ynnm1, ynnm2=ynnm2, ynnp1=ynnp1)


def _gather(var, yi, xi):
    """var[..., yi, xi] with (kz, iy, jx) index arrays; var may carry a
    leading species axis (broadcast over it)."""
    jx = var.shape[-1]
    flat = var.reshape(var.shape[:-2] + (-1,))
    idx = (yi * jx + xi).reshape((1,) * (var.ndim - 3) + yi.shape)
    idx = jnp.broadcast_to(idx, var.shape[:-2] + yi.shape[-2:])
    return jnp.take_along_axis(
        flat, idx.reshape(var.shape[:-2] + (-1,)), axis=-1
    ).reshape(var.shape)


def slhadv(var, w: Dict[str, jax.Array], dt, qmsl: bool = True):
    """SL horizontal advective tendency of a coupled cross field
    (slhadv_x3d/x4d). var: (kz, iy, jx) or (n, kz, iy, jx)."""
    g = lambda yi, xi: _gather(var, w[yi], w[xi])
    al = w["alffbl"]
    # bilinear on the outer y rows (:355-360)
    bl1 = al * g("ynnp1", "xnnm1") + (1.0 - al) * g("ynnp1", "xndp")
    bl2 = al * g("ynnm2", "xnnm1") + (1.0 - al) * g("ynnm2", "xndp")
    # cubic in x on the two inner y rows
    cb1 = (w["am2"] * g("yndp", "xnnm2") + w["am1"] * g("yndp", "xnnm1")
           + w["a0"] * g("yndp", "xndp") + w["ap1"] * g("yndp", "xnnp1"))
    cb2 = (w["am2"] * g("ynnm1", "xnnm2")
           + w["am1"] * g("ynnm1", "xnnm1")
           + w["a0"] * g("ynnm1", "xndp")
           + w["ap1"] * g("ynnm1", "xnnp1"))
    tbadp = (w["bm2"] * bl2 + w["bm1"] * cb2 + w["b0"] * cb1
             + w["bp1"] * bl1)
    if qmsl:
        c00 = g("yndp", "xndp")
        c01 = g("ynnm1", "xndp")
        c10 = g("yndp", "xnnm1")
        c11 = g("ynnm1", "xnnm1")
        tbmax = jnp.maximum(jnp.maximum(c00, c01),
                            jnp.maximum(c10, c11))
        tbmin = jnp.minimum(jnp.minimum(c00, c01),
                            jnp.minimum(c10, c11))
        tbadp = jnp.clip(tbadp, tbmin, tbmax)
    return (tbadp - var) / dt
