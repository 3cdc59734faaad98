"""Holtslag PBL scheme (ibltyp=1).

Faithful jax port of ``Main/pbllib/mod_pbl_holtbl.F90`` (``holtbl`` :129,
``blhnew`` :1132): Holtslag-Boville nonlocal K-profile diffusion with
counter-gradient transport, Blackadar free-atmosphere mixing, and
implicit (tridiagonal) vertical diffusion of u, v, T (as
surface-referenced potential temperature), qv and cloud water.

Layout: (kz, iy, jx) columns; the tridiagonal forward/backward sweeps are
``lax.scan``s along k — batched over the whole (y, x) plane per step,
which is the TPU-native expression of the reference per-column solver.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c

# constants (mod_pbl_holtbl.F90:63-76)
KZO = 1.0
SZKM = 1600.0
FAK = 8.5
SFFRAC = 0.1
BETAM = 15.0
BETAS = 5.0
BETAH = 15.0
CCON = FAK * SFFRAC * c.vonkar
GVK = c.egrav * c.vonkar
BINM = BETAM * SFFRAC
BINH = BETAH * SFFRAC
PINK = 2.0
KZFRAC = 0.8
ONET = 1.0 / 3.0


class HoltslagOut(NamedTuple):
    uten: jax.Array       # coupled dot tendencies (cb m/s /s)
    vten: jax.Array
    tten: jax.Array       # coupled cross
    qvten: jax.Array
    qcten: jax.Array
    zpbl: jax.Array       # PBL height (m)
    kpbl: jax.Array       # PBL top level index (float)
    # scalar diffusion coefficients for the tracer solve (the chi
    # tridiagonal block, mod_pbl_holtbl.F90:985-1095, reuses these)
    alphak: jax.Array
    betak_q: jax.Array


def _tridiag_implicit(f, alphak, betak, dt, sfc_extra):
    """Implicit vertical diffusion solve (holtbl tridiagonal,
    mod_pbl_holtbl.F90:566-660): returns predicted field.

    f: (kz,…); alphak: (kz,…); betak: (kz,…) with betak[0] unused;
    sfc_extra: extra RHS at the lowest level (dt·α·flux term).
    Trailing dims are free — batch extra systems there rather than
    vmapping (each vmapped copy adds a full 2·kz-step scan; the
    fully-unrolled sweeps below compile to a handful of fused TPU
    kernels instead of 2·kz tiny launches, which dominated the
    flagship PBL cost)."""
    kz = f.shape[0]
    bkp = jnp.concatenate([betak[1:], jnp.zeros_like(betak[:1])], axis=0)
    c1 = dt * alphak * bkp                   # coef1, zero at kz-1
    c3 = dt * alphak * betak                 # coef3 (zero at 0 via betak[0])
    c3 = c3.at[0].set(0.0)
    c2 = 1.0 + c1 + c3
    rhs = f.at[kz - 1].add(sfc_extra)

    def fwd(carry, k):
        ce_m1, cf_m1 = carry
        denom = c2[k] - c3[k] * ce_m1
        ce = c1[k] / denom
        cf = (rhs[k] + c3[k] * cf_m1) / denom
        return (ce, cf), (ce, cf)

    z2 = jnp.zeros_like(f[0])
    (_, _), (ce, cf) = jax.lax.scan(fwd, (z2, z2), jnp.arange(kz),
                                    unroll=kz)

    def bwd(x_kp1, k):
        x = ce[k] * x_kp1 + cf[k]
        return x, x

    _, xs = jax.lax.scan(bwd, cf[kz - 1], jnp.arange(kz - 2, -1, -1),
                         unroll=kz - 1)
    x = jnp.concatenate([jnp.flip(xs, 0), cf[kz - 1:kz]], axis=0)
    return x


def _tridiag_implicit_many(fs, alphaks, betaks, dt, sfc_extras,
                           mesh=None):
    """Solve several implicit-diffusion systems of identical shape at
    once.  On TPU the systems go through the column-resident Pallas
    kernel (pallas_kernels.pbl_tridiag — one HBM round trip instead
    of 2·kz scan steps per system; shard_map'ped when ``mesh`` spans
    several devices).  Elsewhere they are stacked on a new axis 1 so
    the whole PBL column block costs two fused sweeps instead of 2
    per prognostic field."""
    import os

    from ...dynamics.pallas_kernels import (pbl_tridiag,
                                            pbl_tridiag_sharded,
                                            tpu_available)
    shp = fs[0].shape[1:]
    kz = fs[0].shape[0]
    f = jnp.stack(fs, axis=1)
    al = jnp.stack(alphaks, axis=1)
    be = jnp.stack(betaks, axis=1)
    se = jnp.stack([jnp.broadcast_to(jnp.asarray(s, f.dtype), shp)
                    for s in sfc_extras], axis=0)
    use_pallas = (tpu_available() and len(shp) == 2
                  and os.environ.get("REGCM_PBL_PALLAS", "1") != "0")
    if not use_pallas:
        x = _tridiag_implicit(f, al, be, dt, se)
        return tuple(x[:, i] for i in range(len(fs)))
    # (kz, ns, iy, jx) → (ns, kz, iy, jx) coefficient build
    bkp = jnp.concatenate([be[1:], jnp.zeros_like(be[:1])], axis=0)
    c1 = dt * al * bkp
    c3 = (dt * al * be).at[0].set(0.0)
    c2 = 1.0 + c1 + c3
    rhs = f.at[kz - 1].add(se)
    tr = lambda a: jnp.swapaxes(a, 0, 1)
    solver = pbl_tridiag if mesh is None or mesh.devices.size == 1 \
        else (lambda *a: pbl_tridiag_sharded(mesh, *a))
    x = tr(solver(tr(c1), tr(c2), tr(c3), tr(rhs)))
    return tuple(x[:, i] for i in range(len(fs)))


def holtbl(tpatm, tatm, patm, patmf, qv, qc, ux, vx, udd, vdd,
           za, dzq, rhox2d, uvdrag, hfx, qfx, tg, coriol,
           psb, psdotb, kmxpbl, dt, ricr=0.25, zhnew_fac=0.25,
           cross2dot_fn=None, m_di=None, m_ci=None,
           mesh=None) -> HoltslagOut:
    """One Holtslag PBL step. All 3-D inputs (kz, iy, jx) decoupled;
    udd/vdd decoupled dot winds; returns coupled tendencies."""
    kz = tpatm.shape[0]
    rdt = 1.0 / dt

    hydf = c.egrav / (patmf[1:] - patmf[:-1])            # (kz,…)
    thvx = tpatm * (1.0 + c.ep1 * qv)
    dza = za[:-1] - za[1:]                               # (kz-1,…)
    rhohf = (patm[1:] - patm[:-1]) / (c.egrav * dza)
    govrth = c.egrav / tpatm[kz - 1]

    # Blackadar free-atmosphere diffusivity (holtbl :180-212)
    rc = 0.257 * dzq ** 0.175
    kzmax = KZFRAC * dza * dzq[1:] * rdt
    vv = ux ** 2 + vx ** 2
    ss = ((ux[:-1] - ux[1:]) ** 2 + (vx[:-1] - vx[1:]) ** 2) \
        / (dza * dza) + 1.0e-9
    ri_fa = govrth[None] * (thvx[:-1] - thvx[1:]) / (ss * dza)
    kzm_i = jnp.where(ri_fa >= rc[1:], KZO,
                      KZO + jnp.sqrt(ss) * (rc[1:] - ri_fa)
                      * SZKM / rc[1:])
    kzm_i = jnp.minimum(kzm_i, kzmax)
    zpad = jnp.zeros_like(kzm_i[:1])
    kzm = jnp.concatenate([zpad, kzm_i], axis=0)         # index k ↔ iface

    # surface layer (holtbl :236-300)
    uflxsfx = uvdrag * ux[kz - 1]
    vflxsfx = uvdrag * vx[kz - 1]
    ustr = jnp.sqrt(jnp.sqrt(uflxsfx ** 2 + vflxsfx ** 2)
                    / jnp.maximum(rhox2d, 1e-3))
    ustr = jnp.maximum(ustr, 1e-4)
    xhfx = hfx / (c.cpd * rhox2d)
    xqfx = qfx / rhox2d
    hfxv = xhfx + 0.61 * tpatm[kz - 1] * xqfx
    hfxv = hfxv + jnp.sign(hfxv) * 1.0e-5 + \
        jnp.where(hfxv == 0.0, 1.0e-5, 0.0)
    pfcor = jnp.maximum(jnp.abs(coriol), 2.546e-5)

    # theta_v at 10 m (ifaholtth10=1 default + one iteration)
    sh10 = qv[kz - 1] / (qv[kz - 1] + 1.0)
    zakz = za[kz - 1]
    th10_0 = (0.25 * tpatm[kz - 1] + 0.75 * tg) * (1.0 + c.ep1 * sh10)
    oblen = -(th10_0 * ustr ** 3) / (GVK * hfxv)
    th10_it = jnp.where(
        oblen >= zakz,
        thvx[kz - 1] + hfxv / (c.vonkar * ustr)
        * (jnp.log(zakz * 0.1) + 5.0 / oblen * (zakz - 10.0)),
        jnp.where((oblen < zakz) & (oblen > 10.0),
                  thvx[kz - 1] + hfxv / (c.vonkar * ustr)
                  * (jnp.log(jnp.abs(oblen) * 0.1)
                     + 5.0 / oblen * (oblen - 10.0)
                     + 6.0 * jnp.log(zakz / jnp.maximum(oblen, 1e-3))),
                  thvx[kz - 1] + hfxv / (c.vonkar * ustr)
                  * 6.0 * jnp.log(zakz * 0.1)))
    th10 = jnp.where(hfxv > 0.0, thvx[kz - 1], th10_it)
    obklen = -(th10 * ustr ** 3) / (GVK * hfxv)

    # -- blhnew: PBL height (mod_pbl_holtbl.F90:1147-1255) ---------------
    ki = jnp.arange(kz)[:, None, None]
    valid = ki >= kmxpbl[None]            # levels allowed for PBL top
    ri = jnp.where(valid,
                   c.egrav * (thvx - th10[None]) * za
                   / (th10[None] * jnp.maximum(vv, 1e-10)), 0.0)

    def find_zpbl(ri):
        zpbl = za[kz - 1]
        kpbl = jnp.full_like(zpbl, float(kz - 1))
        # loop k (0-based) from kz-1 down to kmxpbl0+1; last write wins
        for k in range(kz - 1, 0, -1):
            k2 = k - 1
            cond = ((ri[k] < ricr) & (ri[k2] >= ricr)
                    & (k >= kmxpbl + 1))
            zc = za[k] + (za[k2] - za[k]) \
                * ((ricr - ri[k]) / (ri[k2] - ri[k] + 1e-30))
            zpbl = jnp.where(cond, zc, zpbl)
            kpbl = jnp.where(cond, float(k), kpbl)
        # top-capped columns
        ri_top = jnp.take_along_axis(ri, kmxpbl[None], axis=0)[0]
        za_top = jnp.take_along_axis(
            jnp.broadcast_to(za, ri.shape), kmxpbl[None], axis=0)[0]
        cap = ri_top < ricr
        zpbl = jnp.where(cap, za_top, zpbl)
        kpbl = jnp.where(cap, kmxpbl.astype(zpbl.dtype), kpbl)
        return zpbl, kpbl

    zpbl, kpbl = find_zpbl(ri)
    # convective correction with thermal excess
    unstable = hfxv > 0.0
    xfmt0 = jnp.abs(1.0 - BINM * zpbl / obklen) ** ONET
    wsc0 = ustr * xfmt0
    therm = jnp.where(unstable,
                      (xhfx + c.ep1 * tpatm[kz - 1] * xqfx) * FAK
                      / jnp.maximum(wsc0, 1e-6), 0.0)
    sh = qv / (qv + 1.0)
    tkv = tpatm * (1.0 + c.ep1 * sh)
    tlv = th10 + therm
    ri2_k = c.egrav * (tkv - tlv[None]) * za \
        / (th10[None] * jnp.maximum(vv, 1e-10))
    ri2_sfc = -c.egrav * therm * za[kz - 1] \
        / (th10 * jnp.maximum(vv[kz - 1], 1e-10))
    ri2 = jnp.where(valid, ri2_k, 0.0)
    ri2 = ri2.at[kz - 1].set(ri2_sfc)
    zpbl2, kpbl2 = find_zpbl(ri2)
    zpbl = jnp.where(unstable, zpbl2, zpbl)
    kpbl = jnp.where(unstable, kpbl2, kpbl)
    # mechanical mixing depth floor
    phpblm = jnp.maximum(0.07 * ustr / pfcor, za[kz - 1])
    zpbl = jnp.maximum(zpbl, phpblm)

    # -- K profiles + counter-gradient inside PBL (blhnew :1258-1355) ----
    kvm = kzm
    kvh = kzm
    kvq = kzm
    cgh = jnp.zeros_like(kzm)
    zm = za                                   # (kz,…)
    zp = jnp.concatenate([za[:1], za[:-1]], axis=0)   # za[k-1]
    zp = jnp.minimum(zp, zpbl[None])
    z = 0.5 * (zm + zp)
    zh = z / zpbl[None]
    zl = z / obklen[None]
    inpbl = (zm < zpbl[None]) & (ki >= 1)
    zzh = jnp.where(zh <= 1.0, (1.0 - zh) ** PINK, 0.0)
    zzhnew = jnp.where(zh <= 1.0, (1.0 - zh) * zhnew_fac, 0.0)
    fak1 = (ustr * zpbl * c.vonkar)[None]
    # stable/neutral
    pblk_s = jnp.where(zl <= 1.0,
                       fak1 * zh * zzh / (1.0 + BETAS * zl),
                       fak1 * zh * zzh / (BETAS + zl))
    pblk1_s = jnp.where(zl <= 1.0,
                        fak1 * zh * zzhnew / (1.0 + BETAS * zl),
                        fak1 * zh * zzhnew / (BETAS + zl))
    kvm_s = jnp.maximum(pblk_s, KZO)
    kvh_s = kvm_s
    kvq_s = jnp.maximum(pblk1_s, KZO)
    verystable = zl <= 0.1
    kvm_s = jnp.where(verystable, 0.0, kvm_s)
    kvh_s = jnp.where(verystable, 0.0, kvh_s)
    kvq_s = jnp.where(verystable, 0.0, kvq_s)
    cgh_s = jnp.zeros_like(kvm_s)
    # unstable, outer layer (zh >= sffrac)
    xfmt = jnp.abs(1.0 - BINM * zpbl / obklen) ** ONET
    fht = jnp.sqrt(jnp.abs(1.0 - BINH * zpbl / obklen))
    wsc = ustr * xfmt
    pr_o = (xfmt / jnp.maximum(fht, 1e-6)) + CCON
    fak2 = (wsc * zpbl * c.vonkar)[None]
    pblk_o = fak2 * zh * zzh
    pblk1_o = fak2 * zh * zzhnew
    therm2 = (FAK / jnp.maximum(zpbl * wsc, 1e-6))
    cgh_o = (hfxv * therm2)[None] * jnp.ones_like(zh)
    # unstable, surface layer (zh < sffrac)
    fml = jnp.abs(1.0 - BETAM * zl) ** ONET
    pblk_i = fak1 * zh * zzh * fml
    pblk1_i = fak1 * zh * zzhnew * fml
    pr_i = fml / jnp.sqrt(jnp.abs(1.0 - BETAH * zl))
    outer = zh >= SFFRAC
    pblk_u = jnp.where(outer, pblk_o, pblk_i)
    pblk1_u = jnp.where(outer, pblk1_o, pblk1_i)
    pr_u = jnp.where(outer, pr_o[None] * jnp.ones_like(zh), pr_i)
    cgh_u = jnp.where(outer, cgh_o, 0.0)
    kvm_u = jnp.maximum(pblk_u, KZO)
    kvh_u = jnp.maximum(pblk_u / pr_u, KZO)
    kvq_u = jnp.maximum(pblk1_u, KZO)
    uns3 = unstable[None] & inpbl
    stb3 = (~unstable[None]) & inpbl
    kvm = jnp.where(uns3, kvm_u, jnp.where(stb3, kvm_s, kvm))
    kvh = jnp.where(uns3, kvh_u, jnp.where(stb3, kvh_s, kvh))
    kvq = jnp.where(uns3, kvq_u, jnp.where(stb3, kvq_s, kvq))
    cgh = jnp.where(uns3, cgh_u, jnp.where(stb3, cgh_s, cgh))

    # -- implicit diffusion ---------------------------------------------
    # akzz1[k] = rhohf[k-1]·kvm[k]/dza[k-1] at interfaces (k≥1)
    def iface_coef(kv):
        b = jnp.concatenate(
            [jnp.zeros_like(kv[:1]), rhohf * kv[1:] / dza], axis=0)
        return b

    akzz1 = iface_coef(kvm)
    akzz2 = hydf
    # dot-point averages (4-pt of cross neighbours y-1,x-1)
    def c2d(a):
        if cross2dot_fn is not None:
            return cross2dot_fn(a)
        return a
    betak_d = c2d(akzz1)
    alphak_d = c2d(akzz2)
    drgdot = c2d(uvdrag[None])[0]
    uflxsf = drgdot * udd[kz - 1]
    vflxsf = drgdot * vdd[kz - 1]
    # all five systems in ONE sweep pair (same column structure;
    # only the coefficients/rhs differ)
    betak_t = iface_coef(kvh)
    betak_q = iface_coef(kvq)
    up, vp, tp, qp, qcp = _tridiag_implicit_many(
        [udd, vdd, tpatm, qv, qc],
        [alphak_d, alphak_d, akzz2, akzz2, akzz2],
        [betak_d, betak_d, betak_t, betak_q, betak_q], dt,
        [-dt * alphak_d[kz - 1] * uflxsf,
         -dt * alphak_d[kz - 1] * vflxsf,
         dt * akzz2[kz - 1] * hfx * c.rcpd,
         dt * akzz2[kz - 1] * qfx, 0.0], mesh=mesh)
    uten = (up - udd) * rdt * psdotb[None]
    vten = (vp - vdd) * rdt * psdotb[None]
    if m_di is not None:
        uten = uten * m_di
        vten = vten * m_di

    # temperature (on tpatm, scaled back by sf = tatm·psb/tpatm)
    sf = (tatm * psb[None]) / tpatm
    tten = (tp - tpatm) * rdt * sf
    qvten = (qp - qv) * rdt * psb[None]
    qcten = (qcp - qc) * rdt * psb[None]

    # counter-gradient heat term (holtbl :926-975)
    sfk = tatm / tpatm
    ttnp = jnp.concatenate(
        [jnp.zeros_like(kvh[:1]),
         sfk[1:] * c.cpd * rhohf * kvh[1:] * cgh[1:]], axis=0)
    ttnp_p1 = jnp.concatenate([ttnp[1:], jnp.zeros_like(ttnp[:1])], axis=0)
    dtt = jnp.where(ki == kz - 1,
                    -psb[None] * hydf * ttnp * c.rcpd,
                    psb[None] * hydf * (ttnp_p1 - ttnp) * c.rcpd)
    tten = tten + dtt
    if m_ci is not None:
        tten = tten * m_ci
        qvten = qvten * m_ci
        qcten = qcten * m_ci
    return HoltslagOut(uten=uten, vten=vten, tten=tten, qvten=qvten,
                       qcten=qcten, zpbl=zpbl, kpbl=kpbl,
                       alphak=akzz2, betak_q=betak_q)
