"""Pallas TPU kernels for the MOLOCH hot path (SURVEY §7 stage 5).

The acoustic substep's implicit-w solve is two vertical sweeps
(Thomas algorithm) per substep; as ``lax.scan``s they materialize
their operands to HBM twice per substep × nsound × step — the
dominant share of the base step's 2.5 GB/step traffic.  Here the two
sweeps run inside one kernel with the whole column resident in VMEM,
tiled over (y, x) blocks (column-local: no halos), so the operands
make one HBM round trip.

Backend gating: the kernels run on TPU; everywhere else the caller's
pure-``lax``/XLA path is used (and the equivalence tests run the
kernels in interpreter mode against it).  Measured on a single v5e
chip, 192×192×41 f32: dynamics-only step 10.35 → 6.03 ms (−42%) —
tridiag_w alone −32%, waf_advect the rest.

Multi-chip: a bare ``pallas_call`` under a GSPMD-sharded jit does not
partition (it would all-gather the full domain into every chip), so
``waf_advect_sharded`` / ``tridiag_w_sharded`` wrap the kernels in
``jax.shard_map`` — width-2 halos move via ``lax.ppermute`` ring
shifts (parallel/halo.py) and the domain-edge overrides key on global
offsets fed through SMEM.  MolochCore.set_mesh() selects them.
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


# ---------------------------------------------------------------------------
# fused WAF advection (wafone, mod_moloch.F90:1098-1361)
# ---------------------------------------------------------------------------

def _limiter(amu, f_up2, f_up1, f_c, f_d):
    """Superbee WAF weight (wafone limiter, :1120-1135)."""
    is_ = jnp.sign(amu)
    is_ = jnp.where(is_ == 0.0, 1.0, is_)
    den = f_c - f_d
    r = (f_up1 - f_up2) / jnp.where(
        jnp.abs(den) < 1e-15, jnp.sign(den) * 1e-15 + 1e-30, den)
    b = jnp.maximum(0.0, jnp.minimum(
        2.0, jnp.maximum(r, jnp.minimum(2.0 * r, 1.0))))
    return is_ + amu * b - is_ * b


def _waf_kernel(scal_ref, off_ref, pp_hbm, wind_hbm, s_hbm, fmz_hbm,
                fmzf_hbm, c2d_hbm, out_ref, ppv, windv, sv, fmzv,
                fmzfv, c2v, outv, sems, *, nf, kz, by, wx, iy, jx,
                y_pad):
    """One y-slab: vertical → meridional → zonal WAF sweeps for all
    nf fields, full-x rows resident in VMEM; the shared met/metric
    windows are DMA'd once per slab, each field once.

    Layout: HBM arrays padded to (·, Y, wx) with ZERO fill for
    pp/wind/s/c2d (the global shift() semantics) and EDGE fill for
    fmz/fmzf (shifte() semantics); the y window starts sublane-
    aligned at i·by and spans by + 2·y_pad rows.

    `iy`/`jx` are the GLOBAL domain sizes and ``off_ref`` holds the
    [y, x] global offset of this device's block (0 when unsharded, or
    fed from ``lax.axis_index`` inside shard_map) — the domain-edge
    row overrides key on global indices, so only edge-owning shards
    apply them.

    pp_hbm (nf, kz, Y, wx); wind (2, kz, Y, wx) [um, vm];
    s (kz+1, Y, wx); fmz (kz, Y, wx); fmzf (kz+1, Y, wx);
    c2d (2, Y, wx) [mx2, m_ci]."""
    i = pl.program_id(0)
    y0 = i * by
    wy = by + 2 * y_pad
    dtrdx = scal_ref[0]
    dtrdz = scal_ref[1]
    y_off = off_ref[0]
    x_off = off_ref[1]

    copies = [
        pltpu.make_async_copy(
            wind_hbm.at[:, :, pl.ds(y0, wy), :], windv, sems.at[1]),
        pltpu.make_async_copy(
            s_hbm.at[:, pl.ds(y0, wy), :], sv, sems.at[2]),
        pltpu.make_async_copy(
            fmz_hbm.at[:, pl.ds(y0, wy), :], fmzv, sems.at[3]),
        pltpu.make_async_copy(
            fmzf_hbm.at[:, pl.ds(y0, wy), :], fmzfv, sems.at[4]),
        pltpu.make_async_copy(
            c2d_hbm.at[:, pl.ds(y0, wy), :], c2v, sems.at[5]),
    ]
    for cc in copies:
        cc.start()
    for cc in copies:
        cc.wait()

    um = windv[0]
    vm = windv[1]
    s = sv[:]
    fmz = fmzv[:]
    fmzf = fmzfv[:]
    mx2 = c2v[0]
    m_ci = c2v[1]

    def sh(a, d):
        # out[y] = a[y+d]; zero fill (global shift() semantics —
        # window edges live in the halo, never written back)
        if d > 0:
            return jnp.concatenate([a[:, d:], a[:, :d] * 0.0], axis=1)
        return jnp.concatenate([a[:, :-d] * 0.0, a[:, :d]], axis=1)

    def shx(a, d):
        if d > 0:
            return jnp.concatenate([a[:, :, d:], a[:, :, :d] * 0.0],
                                   axis=2)
        return jnp.concatenate([a[:, :, :-d] * 0.0, a[:, :, :d]],
                               axis=2)

    def she(a, dy, dx_):
        # edge-replicating shifte() for the metric factors
        if dy == 1:
            a = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        elif dy == -1:
            a = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
        if dx_ == 1:
            a = jnp.concatenate([a[:, :, 1:], a[:, :, -1:]], axis=2)
        elif dx_ == -1:
            a = jnp.concatenate([a[:, :, :1], a[:, :, :-1]], axis=2)
        return a

    gy = y_off + y0 - y_pad + jax.lax.broadcasted_iota(
        jnp.int32, (1, wy, wx), 1)
    gx = x_off - 2 + jax.lax.broadcasted_iota(jnp.int32, (1, wy, wx),
                                              2)

    for f in range(nf):
        cp = pltpu.make_async_copy(
            pp_hbm.at[f, :, pl.ds(y0, wy), :], ppv, sems.at[0])
        cp.start()
        cp.wait()
        pp = ppv[:]

        # ---- vertical sweep (:1115-1160).  The metric coefficients
        # recompute per field — VPU work is free next to the VMEM
        # live-set they would otherwise occupy across the loop.
        rfm_m = dtrdz * fmz / fmzf[1:]
        fa = fmzf[:kz]
        rfm_p = dtrdz * fmz / jnp.where(fa == 0.0, 1.0, fa)
        k0 = jax.lax.broadcasted_iota(jnp.int32, (kz, 1, 1), 0)
        rfm_p = jnp.where(k0 == 0, 0.0, rfm_p)
        amu_v = s[1:kz] * dtrdz
        pos_v = amu_v >= 0.0
        above = pp[:-1]
        below = pp[1:]
        below2 = jnp.concatenate([pp[2:], pp[-1:]], axis=0)
        above2 = jnp.concatenate([pp[:1], pp[:-2]], axis=0)
        f1 = jnp.where(pos_v, below, above2)
        f2 = jnp.where(pos_v, below2, above)
        zphi = _limiter(amu_v, f2, f1, above, below)
        wfw = 0.5 * s[1:kz] * ((1.0 + zphi) * below
                               + (1.0 - zphi) * above)
        ztop = jnp.zeros_like(wfw[:1])
        zwf = jnp.concatenate([ztop, wfw, ztop], axis=0)
        zdv = (s[:kz] * rfm_p - s[1:] * rfm_m) * pp
        wz = pp - zwf[:kz] * rfm_p + zwf[1:] * rfm_m + zdv
        # domain-edge rows (:1166-1180): y==0 ← 1; y>=iy-2 ← iy-3
        wz = jnp.where(
            gy == 0, sh(wz, 1),
            jnp.where(gy == iy - 2, sh(wz, -1),
                      jnp.where(gy >= iy - 1, sh(wz, -2), wz)))

        # ---- meridional sweep (:1278-1310) --------------------------
        rfmn = dtrdx * 2.0 * fmz / (fmz + she(fmz, 1, 0))
        rfms = dtrdx * 2.0 * fmz / (fmz + she(fmz, -1, 0))
        amu_y = vm * dtrdx
        pos_y = amu_y > 0.0
        wz_m1 = sh(wz, -1)
        f1 = jnp.where(pos_y, wz_m1, sh(wz, 1))
        f2 = jnp.where(pos_y, sh(wz, -2), wz)
        zphi = _limiter(amu_y, f2, f1, wz, wz_m1)
        zpby = 0.5 * vm * ((1.0 + zphi) * wz_m1 + (1.0 - zphi) * wz)
        p0 = wz + mx2 * (zpby * rfms - sh(zpby, 1) * rfmn
                         + (sh(vm, 1) * rfmn - vm * rfms) * pp)
        p0 = jnp.where(
            gx == 0, shx(p0, 1),
            jnp.where(gx == jx - 2, shx(p0, -1),
                      jnp.where(gx >= jx - 1, shx(p0, -2), p0)))

        # ---- zonal sweep (:1330-1360) -------------------------------
        rfme = dtrdx * 2.0 * fmz / (fmz + she(fmz, 0, 1))
        rfmw = dtrdx * 2.0 * fmz / (fmz + she(fmz, 0, -1))
        amu_x = um * dtrdx
        pos_x = amu_x > 0.0
        p0_m1 = shx(p0, -1)
        f1 = jnp.where(pos_x, p0_m1, shx(p0, 1))
        f2 = jnp.where(pos_x, shx(p0, -2), p0)
        zphi = _limiter(amu_x, f2, f1, p0, p0_m1)
        zpbw = 0.5 * um * ((1.0 + zphi) * p0_m1 + (1.0 - zphi) * p0)
        outw = p0 + mx2 * (zpbw * rfmw - shx(zpbw, 1) * rfme
                           + (shx(um, 1) * rfme - um * rfmw) * pp)
        outw = jnp.where(m_ci > 0.5, outw, pp)
        outv[:] = jax.lax.slice_in_dim(outw, y_pad, y_pad + by,
                                       axis=1)
        co = pltpu.make_async_copy(
            outv, out_ref.at[f, :, pl.ds(y0, by), :], sems.at[0])
        co.start()
        co.wait()


def _waf_call(pp_p, wind, s_p, fmz_p, fmzf_p, c2d, offs, dtrdx, dtrdz,
              giy, gjx, ly, lx, interpret, by):
    """Invoke the WAF kernel on pre-padded (·, Y, wx) arrays.

    ``ly``/``lx`` are the rows/cols to write back (the local block);
    ``giy``/``gjx`` the global domain sizes; ``offs`` the int32 [y, x]
    global offset of the block (SMEM)."""
    nf, kz = pp_p.shape[:2]
    dt = pp_p.dtype
    y_pad = 8
    ny = pl.cdiv(ly, by)
    wx = pp_p.shape[-1]
    scal = jnp.stack([jnp.asarray(dtrdx, dt), jnp.asarray(dtrdz, dt)])

    import functools as _ft
    kern = _ft.partial(_waf_kernel, nf=nf, kz=kz, by=by, wx=wx,
                       iy=giy, jx=gjx, y_pad=y_pad)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    wy = by + 2 * y_pad
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nf, kz, ny * by, wx), dt),
        grid=(ny,),
        in_specs=[smem, smem] + [hbm] * 6,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((kz, wy, wx), dt),
            pltpu.VMEM((2, kz, wy, wx), dt),
            pltpu.VMEM((kz + 1, wy, wx), dt),
            pltpu.VMEM((kz, wy, wx), dt),
            pltpu.VMEM((kz + 1, wy, wx), dt),
            pltpu.VMEM((2, wy, wx), dt),
            pltpu.VMEM((kz, by, wx), dt),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, offs, pp_p, wind, s_p, fmz_p, fmzf_p, c2d)
    return out[:, :, :ly, 2:2 + lx]


def waf_advect(pp_fields, um, vm, s, fmz, fmzf, mx2, m_ci,
               dtrdx, dtrdz, interpret=False, by=8):
    """Fused WAF advection for a stack of fields (single device).

    pp_fields (nf, kz, iy, jx); um/vm (kz, iy, jx) map-scaled winds;
    s (kz+1, iy, jx); fmz (kz, iy, jx) / fmzf (kz+1, iy, jx) metric
    factors; mx2/m_ci (iy, jx).  Returns (nf, kz, iy, jx)."""
    nf, kz, iy, jx = pp_fields.shape
    y_pad = 8                         # sublane-aligned y halo (>= 2)
    ny = pl.cdiv(iy, by)
    ey = ny * by + y_pad - iy         # trailing y pad
    wx = ((jx + 4 + 127) // 128) * 128
    ex = wx - (jx + 2)

    def padz(a):
        return jnp.pad(a, ((0, 0),) * (a.ndim - 2)
                       + ((y_pad, ey), (2, ex)))

    def pade(a):
        return jnp.pad(a, ((0, 0),) * (a.ndim - 2)
                       + ((y_pad, ey), (2, ex)), mode="edge")

    offs = jnp.zeros((2,), jnp.int32)
    return _waf_call(
        padz(pp_fields), padz(jnp.stack([um, vm])), padz(s),
        pade(fmz), pade(fmzf), padz(jnp.stack([mx2, m_ci])),
        offs, dtrdx, dtrdz, iy, jx, iy, jx, interpret, by)


def waf_advect_sharded(mesh, pp_fields, um, vm, s, fmz, fmzf, mx2,
                       m_ci, dtrdx, dtrdz, interpret=False, by=8):
    """WAF advection partitioned over a ('y', 'x') device mesh.

    A plain ``pallas_call`` under a GSPMD-sharded jit does not
    partition (it all-gathers the full domain into every chip's
    kernel) — here the kernel runs inside ``shard_map``: width-2
    halos move over ICI via ``lax.ppermute`` (parallel/halo.py), each
    device runs the slab kernel on its local block + halo, and the
    domain-edge row overrides key on the global offsets fed through
    SMEM.  Bit-identical to ``waf_advect`` on one device (same sweep
    arithmetic, same window layout)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.halo import halo_expand2d

    nf, kz, iy, jx = pp_fields.shape
    nyd, nxd = mesh.devices.shape
    ly, lx = iy // nyd, jx // nxd
    assert ly * nyd == iy and lx * nxd == jx, \
        f"grid {iy}x{jx} not divisible by mesh {nyd}x{nxd}"
    assert ly >= 4 and lx >= 4, \
        "local block must be >= 4 so the 2-row domain-edge overrides " \
        "stay within the owning shard's window"
    h = 2
    y_pad = 8
    ny = pl.cdiv(ly, by)
    ey = ny * by + y_pad - ly - h       # after leading y_pad-h + ext
    wx = ((lx + 2 * h + 127) // 128) * 128
    ex = wx - (lx + 2 * h)

    def body(pp, uvw, s_, fz, fzf, c2):
        yo = (jax.lax.axis_index("y") * ly).astype(jnp.int32)
        xo = (jax.lax.axis_index("x") * lx).astype(jnp.int32)
        offs = jnp.stack([yo, xo])
        # halo exchange, then pad to the kernel's aligned layout:
        # leading y_pad-h zero rows put the first REAL row at padded
        # row y_pad, exactly like the unsharded padz/pade layout.
        def prep(a, mode):
            e = halo_expand2d(a, h, nyd, nxd, mode)
            w = ((0, 0),) * (a.ndim - 2) + ((y_pad - h, ey), (0, ex))
            return jnp.pad(e, w, mode="edge" if mode == "edge"
                           else "constant")

        return _waf_call(
            prep(pp, "zero"), prep(uvw, "zero"), prep(s_, "zero"),
            prep(fz, "edge"), prep(fzf, "edge"), prep(c2, "zero"),
            offs, dtrdx, dtrdz, iy, jx, ly, lx, interpret, by)

    sm = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None, "y", "x"), P(None, None, "y", "x"),
                  P(None, "y", "x"), P(None, "y", "x"),
                  P(None, "y", "x"), P(None, "y", "x")),
        out_specs=P(None, None, "y", "x"), check_vma=False)
    return sm(pp_fields, jnp.stack([um, vm]), s, fmz, fmzf,
              jnp.stack([mx2, m_ci]))


def tridiag_w_sharded(mesh, wexpl, zm, zp, w_bot, interpret=False):
    """Column-local implicit-w solve under shard_map: each device runs
    ``tridiag_w`` on its own (y, x) block — no halos needed."""
    from jax.sharding import PartitionSpec as P

    body = lambda a, b, c, d: tridiag_w(a, b, c, d,
                                        interpret=interpret)
    sm = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, "y", "x"),) * 3 + (P("y", "x"),),
        out_specs=P(None, "y", "x"), check_vma=False)
    return sm(wexpl, zm, zp, w_bot)


# ---------------------------------------------------------------------------
# Emanuel mixing-matrix reduction (cupeman :723-840 + :975-1100 sums)
# ---------------------------------------------------------------------------
def emanuel_mixing(body, laycls, h, hp, q, qs, t, lv, qti, clw, ep, m,
                   u, v, dph, unk, vnk, icb, ict, cloud,
                   cb: int = 128, interpret: bool = False):
    """Compute the reduced Emanuel mixing terms with the (i, j) mixing
    matrices resident in VMEM, one ``cb``-column block per grid step.

    The XLA path materializes ~10 (ncol, L, L) matrices in HBM
    (~83 GB of traffic at 192²×41); here only the 2D level profiles
    stream in and the eight reduced 2D terms stream out (~0.5 MB per
    block).  ``body`` is emanuel._mixing_body and ``laycls`` its
    columns-last layout, so the arithmetic is op-for-op the XLA path's;
    arrays are (L, cb) with the column block on the 128-lane axis.
    """
    ncol, L = h.shape
    dt = h.dtype
    npad = (-ncol) % cb
    nblk = (ncol + npad) // cb

    def prep(x, as_int=False):
        x = jnp.pad(x, ((0, npad),) + ((0, 0),) * (x.ndim - 1))
        if as_int:
            x = x.astype(jnp.int32)
        x = x.T if x.ndim == 2 else x[None, :]
        return x

    lev = [prep(x) for x in
           (h, hp, q, qs, t, lv, qti, clw, ep, m, u, v, dph)]
    # icb/ict default to 0 in padded columns -> harmless (cloud=False)
    col = [prep(unk), prep(vnk), prep(icb, True), prep(ict, True)]
    cld = prep(cloud.astype(dt))

    lay = laycls(L)
    keys = ("wdtrain_mix", "amp1_e", "ad", "mentii", "qentii",
            "sum_q", "sum_u", "sum_v")

    def kern(*refs):
        in_refs, out_refs = refs[:18], refs[18:]
        lev_b = [r[...] for r in in_refs[:13]]
        col_b = [r[0] for r in in_refs[13:17]]
        cloud_b = in_refs[17][...] > 0.5
        out = body(*lev_b, *col_b, cloud_b, lay)
        for r, k in zip(out_refs, keys):
            r[...] = out[k]

    lev_spec = pl.BlockSpec((L, cb), lambda i: (0, i))
    col_spec = pl.BlockSpec((1, cb), lambda i: (0, i))
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((L, ncol + npad), dt)] * 8,
        grid=(nblk,),
        in_specs=[lev_spec] * 13 + [col_spec] * 4 + [lev_spec],
        out_specs=[lev_spec] * 8,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*lev, *col, cld)
    return {k: o.T[:ncol] for k, o in zip(keys, outs)}


# ---------------------------------------------------------------------------
# PBL implicit-diffusion tridiagonal (holtbl, mod_pbl_holtbl.F90:566-660)
# ---------------------------------------------------------------------------

def _pbl_tridiag_kernel(c1_ref, c2_ref, c3_ref, rhs_ref, out_ref,
                        ce, cf):
    """Thomas solve for one (system, y, x) block with the whole
    column resident in VMEM: the XLA scan form makes 2·kz HBM round
    trips per system (the dominant PBL cost at flagship size)."""
    n = c1_ref.shape[1]

    def fwd(k, carry):
        ce_m1, cf_m1 = carry
        denom = c2_ref[0, k] - c3_ref[0, k] * ce_m1
        ce_k = c1_ref[0, k] / denom
        cf_k = (rhs_ref[0, k] + c3_ref[0, k] * cf_m1) / denom
        ce[k] = ce_k
        cf[k] = cf_k
        return ce_k, cf_k

    z = jnp.zeros_like(rhs_ref[0, 0])
    jax.lax.fori_loop(0, n, fwd, (z, z))

    out_ref[0, n - 1] = cf[n - 1]

    def bwd(j, x_kp1):
        k = n - 2 - j
        x = ce[k] * x_kp1 + cf[k]
        out_ref[0, k] = x
        return x

    jax.lax.fori_loop(0, n - 1, bwd, cf[n - 1])


@functools.partial(jax.jit, static_argnames=("interpret",))
def pbl_tridiag(c1, c2, c3, rhs, interpret=False):
    """Batched tridiagonal solve −c3·x[k−1] + c2·x[k] − c1·x[k+1] =
    rhs (the holtbl implicit-diffusion recurrence).  Inputs
    (ns, kz, iy, jx); returns x of the same shape.  Edge tiles are
    padded with the identity system (c2=1, off-diagonals 0)."""
    ns, kz, iy, jx = c1.shape
    by, bx = 8, 128
    py = (-iy) % by
    px = (-jx) % bx
    if py or px:
        pad = ((0, 0), (0, 0), (0, py), (0, px))
        c1 = jnp.pad(c1, pad)
        c3 = jnp.pad(c3, pad)
        rhs = jnp.pad(rhs, pad)
        c2 = jnp.pad(c2, pad, constant_values=1.0)
    grid = (ns, pl.cdiv(iy + py, by), pl.cdiv(jx + px, bx))
    spec = pl.BlockSpec((1, kz, by, bx), lambda s, i, j: (s, 0, i, j),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _pbl_tridiag_kernel,
        out_shape=jax.ShapeDtypeStruct(c1.shape, c1.dtype),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((kz, by, bx), c1.dtype),
            pltpu.VMEM((kz, by, bx), c1.dtype),
        ],
        interpret=interpret,
    )(c1, c2, c3, rhs)
    return out[..., :iy, :jx]


def pbl_tridiag_sharded(mesh, c1, c2, c3, rhs, interpret=False):
    """Column-local: each device solves its own (y, x) block."""
    from jax.sharding import PartitionSpec as P

    body = lambda a, b, c, d: pbl_tridiag(a, b, c, d,
                                          interpret=interpret)
    sm = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None, "y", "x"),) * 4,
        out_specs=P(None, None, "y", "x"), check_vma=False)
    return sm(c1, c2, c3, rhs)
