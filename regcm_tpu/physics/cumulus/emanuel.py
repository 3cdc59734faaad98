"""Emanuel (1991) convection scheme V4.3C (icup=4).

Faithful jax port of ``Main/cumlib/mod_cu_em.F90`` (``cupemandrv`` :107,
``cupeman`` :406, ``tlift`` :1185): buoyancy-sorting episodic mixing with
quasi-equilibrium cloud-base mass-flux closure, unsaturated
precipitating downdraft, and convective momentum transport.

TPU-native design: the reference's per-column ``pointloop`` with
data-dependent cloud base/top becomes dense masked algebra over
(ncol, NL) arrays — the (nd+1)² mixing matrices (sij/ment/qent/elij) are
materialized per column ((kz+1)² ≈ 400 elements) and the sequential
downdraft recursion is a ``lax.scan`` from cloud top to surface,
batched over all columns. Level index 0 = LOWEST level (Emanuel
orientation); the driver flips model arrays.

Parameters follow ``emanparam`` defaults (Main/mod_params.F90:405-422).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c
from ...utils.tpu_math import cumsum_mm
from ...utils.thermo import pfwsat

# emanparam defaults (Main/mod_params.F90:405-422)
MINSIG = 0.950
ELCRIT_LND = 1.1e-3
ELCRIT_OCN = 1.1e-4
TLCRIT = -55.0
ENTP = 0.06
SIGD = 0.05
SIGS = 0.15
OMTRAIN = 50.0
OMTSNOW = 5.5
COEFFR = 1.0
COEFFS = 0.8
CU = 0.7
BETAE = 10.0
DTMAX = 0.65
ALPHAE = 0.02
DAMP = 0.01
EPMAX = 0.999
CL = 2500.0
CPVMCL = CL - c.cpv
MINCBMF = 1.0e-30
# cloud fraction factors (Main/mod_params.F90:339-341)
K2_CONST = 500.0
KFAC_SHAL = 0.07
KFAC_DEEP = 0.14


class EmanuelOut(NamedTuple):
    ft: jax.Array       # T tendency (K/s), Emanuel orientation
    fq: jax.Array       # specific-humidity tendency (kg/kg/s)
    fu: jax.Array
    fv: jax.Array
    precip: jax.Array   # surface precip (kg/m2/s == mm/s)
    cbmf: jax.Array     # updated cloud-base mass flux
    cldfra: jax.Array
    kbase: jax.Array    # cloud base level (int, Emanuel orientation)
    ktop: jax.Array
    active: jax.Array   # bool: convection occurred
    ftra: jax.Array | None = None   # tracer tendencies (ncol, NL, ntra)


def _tlift(t, q, qs, gz, p, nk, NL):
    """Lifted parcel Tv, T and adiabatic water (tlift,
    mod_cu_em.F90:1185-1240). All (ncol, NL); nk (ncol,) parcel level."""
    take = lambda a, idx: jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]
    qnk = take(q, nk)
    tnk = take(t, nk)
    gznk = take(gz, nk)
    ah0 = (c.cpd * (1.0 - qnk) + CL * qnk) * tnk \
        + qnk * (c.wlhv - CPVMCL * (tnk - c.tzero)) + gznk
    cpp = c.cpd * (1.0 - qnk) + qnk * c.cpv
    # below cloud base: dry adiabat from nk
    tpk_dry = tnk[:, None] - (gz - gznk[:, None]) / cpp[:, None]
    tvp_dry = tpk_dry * (1.0 + qnk[:, None] * c.rgowi)
    # saturated ascent (2 Newton iterations, :1222-1233)
    tg = t
    qg = qs
    alv = c.wlhv - CPVMCL * (t - c.tzero)
    for _ in range(2):
        s = 1.0 / (c.cpd + alv * alv * qg / (c.rwat * t * t))
        ahg = c.cpd * tg + (CL - c.cpd) * qnk[:, None] * t + alv * qg + gz
        tg = jnp.maximum(tg + s * (ah0[:, None] - ahg), 35.0)
        qg = pfwsat(tg, p * 100.0)
    tpk_wet = (ah0[:, None] - (CL - c.cpd) * qnk[:, None] * t - gz
               - alv * qg) * c.rcpd
    clw = jnp.maximum(qnk[:, None] - qg, 0.0)
    rg = qg / (1.0 - qnk[:, None])
    tvp_wet = tpk_wet * (1.0 + rg * c.rgowi)
    return tpk_dry, tvp_dry, tpk_wet, tvp_wet, clw


class _LayCF:
    """Columns-first layout: 2D arrays (ncol, L), 3D (ncol, i, j).

    Used by the XLA path of ``_mixing_body``; op-for-op identical to the
    columns-last layout the Pallas kernel uses (``_LayCL``), so the two
    paths differ only in memory layout, not arithmetic."""
    A = staticmethod(lambda x: x[:, :, None])    # i-indexed (draught)
    B = staticmethod(lambda x: x[:, None, :])    # j-indexed (level)
    S = staticmethod(lambda x: x[:, None, None])  # per-column scalar

    def __init__(self, L):
        self.L = L

    def iota_i(self):
        return jax.lax.broadcasted_iota(jnp.int32, (1, self.L, self.L), 1)

    def iota_j(self):
        return jax.lax.broadcasted_iota(jnp.int32, (1, self.L, self.L), 2)

    sum_i = staticmethod(lambda x: jnp.sum(x, axis=1))
    sum_j = staticmethod(lambda x: jnp.sum(x, axis=2))
    cumsum_i = staticmethod(lambda x: cumsum_mm(x, axis=1))
    cumsum_j = staticmethod(lambda x: cumsum_mm(x, axis=2))
    rev_i = staticmethod(lambda x: jnp.flip(x, axis=1))
    rev_j = staticmethod(lambda x: jnp.flip(x, axis=2))
    swap_ij = staticmethod(lambda x: jnp.swapaxes(x, 1, 2))

    def sufsum_i(self, x):                       # Σ_{i'>=i}
        return self.rev_i(self.cumsum_i(self.rev_i(x)))

    def sufsum_j(self, x):                       # Σ_{j'>=j}
        return self.rev_j(self.cumsum_j(self.rev_j(x)))

    def amp1_ad(self, ment):
        # amp1_e(i)=SUM_{k<=i,j>i} ment(k,j); ad(i)=SUM_{k<i,j>=i}
        L = self.L
        ment_jcum = self.sufsum_j(ment)          # SUM_{j'>=j} ment[k,j']
        Ski = self.jcat([self.jslice(ment_jcum, 1, L),
                         jnp.zeros_like(self.jslice(ment_jcum, 0, 1))])
        amp1_e = self.diag(self.cumsum_i(Ski))   # SUM_{k<=i} at diag
        mT = self.swap_ij(ment)                  # mT[j, k] = ment[k, j]
        mT_kcum = self.cumsum_j(mT)              # SUM_{k'<=k} ment[k',j]
        Dji = self.jcat([jnp.zeros_like(self.jslice(mT_kcum, 0, 1)),
                         self.jslice(mT_kcum, 0, L - 1)])
        ad = self.diag(self.sufsum_i(Dji))
        return amp1_e, ad
    jslice = staticmethod(
        lambda x, lo, hi: jax.lax.slice_in_dim(x, lo, hi, axis=2))
    jcat = staticmethod(lambda parts: jnp.concatenate(parts, axis=2))

    def diag(self, x):
        e = self.iota_i() == self.iota_j()
        return self.sum_j(jnp.where(e, x, jnp.zeros_like(x)))

    def cummin_j_ex(self, x, fill):
        """EXCLUSIVE prefix-min along j seeded with `fill` — the
        running `smin` of the reference's normalization loop
        (mod_cu_em.F90:798-821). Log-depth doubling on jslice/jcat so
        the same code lowers in both layouts (Mosaic has no cummin)."""
        L = self.L
        y = self.jcat([jnp.full_like(self.jslice(x, 0, 1), fill),
                       self.jslice(x, 0, L - 1)])
        s = 1
        while s < L:
            pad = jnp.full_like(self.jslice(y, 0, s), fill)
            y = jnp.minimum(
                y, self.jcat([pad, self.jslice(y, 0, L - s)]))
            s *= 2
        return y


class _LayCL(_LayCF):
    """Columns-last layout: 2D arrays (L, cb), 3D (i, j, cb) — the cb
    column block rides the 128-wide lane dimension inside Pallas."""
    A = staticmethod(lambda x: x[:, None, :])
    B = staticmethod(lambda x: x[None, :, :])
    S = staticmethod(lambda x: x[None, None, :])

    def iota_i(self):
        return jax.lax.broadcasted_iota(jnp.int32, (self.L, self.L, 1), 0)

    def iota_j(self):
        return jax.lax.broadcasted_iota(jnp.int32, (self.L, self.L, 1), 1)

    sum_i = staticmethod(lambda x: jnp.sum(x, axis=0))
    sum_j = staticmethod(lambda x: jnp.sum(x, axis=1))
    cumsum_i = staticmethod(lambda x: cumsum_mm(x, axis=0))
    cumsum_j = staticmethod(lambda x: cumsum_mm(x, axis=1))
    def amp1_ad(self, ment):
        # Mosaic lowers neither `cumsum` nor `rev`: express the two
        # triangular double-sums as 2D mask matmuls over the flattened
        # (L*L, cb) matrix instead -- MXU work, and only a
        # reassociation-level fp deviation from the CF path.
        L = self.L
        cb = ment.shape[-1]
        mflat = ment.reshape(L * L, cb)
        i_ = jax.lax.broadcasted_iota(jnp.int32, (L, L * L), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (L, L * L), 1)
        k_ = kj // L
        j_ = kj - k_ * L
        f1 = ((k_ <= i_) & (j_ > i_)).astype(ment.dtype)
        f2 = ((k_ < i_) & (j_ >= i_)).astype(ment.dtype)
        amp1_e = jnp.dot(f1, mflat, preferred_element_type=ment.dtype)
        ad = jnp.dot(f2, mflat, preferred_element_type=ment.dtype)
        return amp1_e, ad
    jslice = staticmethod(
        lambda x, lo, hi: jax.lax.slice_in_dim(x, lo, hi, axis=1))
    jcat = staticmethod(lambda parts: jnp.concatenate(parts, axis=1))


def _mixing_body(h, hp, q, qs, t, lv, qti, clw, ep, m, u, v, dph,
                 unk, vnk, icb_b, ict_b, cloud, lay, tra=None,
                 trank=None):
    """The (i, j) mixing-matrix algebra (cupeman :723-840) REDUCED to
    its per-level contractions — shared by the XLA path (``_LayCF``,
    full batch) and the Pallas kernel (``_LayCL``, one VMEM-resident
    column block at a time; see pallas_kernels.emanuel_mixing).

    Level arrays are 2D in ``lay``'s layout; per-column scalars
    (unk/vnk/icb_b/ict_b) 1D.  Returns the dict of 2D terms the
    tendency stage consumes:
      wdtrain_mix  Σ_{k<i} max(elij−(1−ep)clw,0)·ment · g
      amp1_e       Σ_{k<=i, j>i} ment(k,j)
      ad           Σ_{k<i, j>=i} ment(k,j)
      mentii/qentii  diagonals (after the no-entrainment fallback)
      sum_q/u/v    Σ_k ment(k,i)·(Xent(k,i)[−awat]−X_i)
    """
    A, B, S = lay.A, lay.B, lay.S
    xp = jnp
    one = h.dtype.type(1.0)
    bf2 = 1.0 + B(lv) * B(lv) * B(qs) / (c.rwat * B(t) * B(t) * c.cpd)
    anum = B(h) - A(hp) + (c.cpv - c.cpd) * B(t) * (A(qti) - B(q))
    denom = A(h) - A(hp) + (c.cpd - c.cpv) * (A(q) - A(qti)) * B(t)
    dei = xp.where(xp.abs(denom) < 0.01, 0.01, denom)
    sij = anum / dei
    eye3 = lay.iota_i() == lay.iota_j()
    sij = xp.where(eye3, one, sij)
    altem = (sij * A(q) + (1.0 - sij) * A(qti) - B(qs)) / bf2
    cwat = B(clw * (1.0 - ep))
    jgti = lay.iota_i() < lay.iota_j()           # j > i
    redo = ((sij < 0.0) | (sij > 1.0) | (altem > cwat)) & jgti
    anum2 = anum - B(lv) * (A(qti) - B(qs) - cwat * bf2)
    denom2 = denom + B(lv) * (A(q) - A(qti))
    denom2 = xp.where(xp.abs(denom2) < 0.01, 0.01, denom2)
    sij2 = anum2 / denom2
    altem2 = sij2 * A(q) + (1.0 - sij2) * A(qti) - B(qs) \
        - (bf2 - 1.0) * cwat
    sij = xp.where(redo, sij2, sij)
    altem = xp.where(redo, altem2, altem)
    valid = (sij > 0.0) & (sij < 0.9)
    jrange = (lay.iota_j() >= S(icb_b)) & (lay.iota_j() <= S(ict_b))
    valid = valid & A(cloud) & jrange
    qent = xp.where(valid, sij * A(q) + (1.0 - sij) * A(qti), B(q))
    uent = xp.where(valid, sij * A(u) + (1.0 - sij) * S(unk), B(u))
    vent = xp.where(valid, sij * A(v) + (1.0 - sij) * S(vnk), B(v))
    elij = xp.where(valid, xp.maximum(altem, 0.0), 0.0)
    ment = xp.where(valid,
                    A(m) / (1.0 - xp.clip(sij, 0.0, 0.899)), 0.0)
    nent = lay.sum_j(valid.astype(h.dtype))      # per-i count (exact)
    sij_pre = sij       # traent/qent use the pre-clip mixing fraction
    sij = xp.clip(sij, 0.0, 1.0)

    # no-entrainment detrainment fallback (:770-786)
    noent = (nent < 0.5) & cloud
    diag_set = A(noent) & eye3
    ment = xp.where(diag_set, A(m) * xp.ones_like(ment), ment)
    qent = xp.where(diag_set, A(qti) * xp.ones_like(qent), qent)
    uent = xp.where(diag_set, S(unk) * xp.ones_like(uent), uent)
    vent = xp.where(diag_set, S(vnk) * xp.ones_like(vent), vent)
    elij = xp.where(diag_set, A(clw) * xp.ones_like(elij), elij)

    # equal-probability normalization of ment (:790-840)
    qp1v = qti
    anum_s = h - hp - lv * (qp1v - qs)
    denom_s = h - hp + lv * (q - qp1v)
    denom_s = xp.where(xp.abs(denom_s) < 0.01, 0.01, denom_s)
    scrit = anum_s / denom_s
    alt = qp1v - qs + scrit * (q - qp1v)
    scrit = xp.where(alt < 0.0, 1.0, scrit)
    scrit = xp.maximum(scrit, 0.0)               # per-i 2D
    L = lay.L
    # the reference's sij matrix is written only for i in the cloud
    # rows and j in [icb, ict]; everything else stays 0, and the
    # j±1 neighbors read those zeros at the range edges (:800-816)
    sij_f = xp.where(A(cloud) & jrange, sij, xp.zeros_like(sij))
    zpad = xp.zeros_like(lay.jslice(sij_f, 0, 1))
    sijp1 = lay.jcat([lay.jslice(sij_f, 1, L), zpad])
    sijm1 = lay.jcat([zpad, lay.jslice(sij_f, 0, L - 1)])
    scritA = A(scrit)
    smid_gt = xp.minimum(sij, scritA)
    sjmax_gt = smid_gt
    sjmin_gt = smid_gt
    # the reference tracks a running smin over accepted j>i pairs
    # (smin=1 start; branch iff smid < smin AND sij(i,j+1) < smid,
    # then smin=smid, :805-810). Because every branch-taken smid is a
    # new record minimum, `smid < running smin` is equivalent to
    # `smid < exclusive-prefix-min over earlier candidate smids`,
    # which vectorizes exactly.
    c_cond = valid & jgti & (sijp1 < smid_gt)
    prefmin = lay.cummin_j_ex(
        xp.where(c_cond, smid_gt, xp.ones_like(smid_gt)), 1.0)
    use_min = c_cond & (smid_gt < prefmin)
    sjmax_gt = xp.where(use_min,
                        xp.minimum(xp.minimum(sijp1, sij), scritA),
                        sjmax_gt)
    sjmin_gt = xp.where(use_min,
                        xp.minimum(xp.maximum(sijm1, sij), scritA),
                        sjmin_gt)
    sjmax_le = xp.maximum(sijp1, scritA)
    smid_le = xp.maximum(sij, scritA)
    sjmin_le = xp.maximum(
        xp.where(lay.iota_j() > 0, sijm1, xp.zeros_like(sijm1)), scritA)
    smid = xp.where(jgti, smid_gt, smid_le)
    sjmax = xp.where(jgti, sjmax_gt, sjmax_le)
    sjmin = xp.where(jgti, sjmin_gt, sjmin_le)
    delp = xp.abs(sjmax - smid)
    delm = xp.abs(sjmin - smid)
    wgt = (delp + delm) * B(dph)
    has_ent = A(nent > 0.5)
    ment_n = xp.where(valid & has_ent, ment * wgt, ment)
    asij = xp.maximum(
        lay.sum_j(xp.where(valid, wgt, xp.zeros_like(wgt))), 1.0e-21)
    ment = xp.where(has_ent, ment_n / A(asij), ment_n)

    # post-normalization fallback (:830-847): a row whose normalized
    # fluxes all vanished detrains like the no-entrainment case
    bsum = lay.sum_j(ment)
    fb = (nent > 0.5) & (bsum < 1.0e-18) & cloud
    fbd = A(fb) & eye3
    ment = xp.where(fbd, A(m) * xp.ones_like(ment), ment)
    qent = xp.where(fbd, A(qti) * xp.ones_like(qent), qent)
    uent = xp.where(fbd, S(unk) * xp.ones_like(uent), uent)
    vent = xp.where(fbd, S(vnk) * xp.ones_like(vent), vent)
    elij = xp.where(fbd, A(clw) * xp.ones_like(elij), elij)
    diag_set = diag_set | fbd

    # ---- reductions -------------------------------------------------
    awat = xp.maximum(elij - (1.0 - B(ep)) * B(clw), 0.0)
    wdtrain_mix = c.egrav * lay.sum_i(
        xp.where(jgti, awat * ment, xp.zeros_like(ment)))
    # amp1_e(i) = Σ_{k<=i, j>i} ment(k,j); ad(i) = Σ_{k<i, j>=i}
    # (draughts below i detraining at-or-above i) -- layout-specific
    amp1_e, ad = lay.amp1_ad(ment)
    mentii = lay.diag(ment)
    qentii = lay.diag(qent)
    awat_k = xp.where(jgti, awat, xp.zeros_like(awat))
    sum_q = lay.sum_i(ment * (qent - awat_k - B(q)))
    sum_u = lay.sum_i(ment * (uent - B(u)))
    sum_v = lay.sum_i(ment * (vent - B(v)))
    out = dict(wdtrain_mix=wdtrain_mix, amp1_e=amp1_e, ad=ad,
               mentii=mentii, qentii=qentii, sum_q=sum_q,
               sum_u=sum_u, sum_v=sum_v)
    if tra is not None:
        # tracer mixing contraction (:751-753, :839-843, :1061-1077):
        # traent(k,i) = sij·tra_k + (1-sij)·tra_nk on valid pairs,
        # tra_nk on the no-entrainment diagonal -> per-level weights
        # let Σ_k ment·(traent - tra_i) factor into one matvec per
        # tracer plus two tracer-independent columns (CF layout only;
        # the opt-in Pallas kernel path never receives tra)
        zm = xp.zeros_like(ment)
        w1 = xp.where(valid, ment * sij_pre, zm)
        w2c = lay.sum_i(xp.where(valid, ment * (1.0 - sij_pre), zm)
                        + xp.where(diag_set, ment, zm))
        mentc = lay.sum_i(ment)
        ntra = tra.shape[-1]
        sums = [lay.sum_i(w1 * A(tra[:, :, jt])) for jt in range(ntra)]
        out["sum_tra"] = (xp.stack(sums, axis=-1)
                          + w2c[:, :, None] * trank[:, None, :]
                          - mentc[:, :, None] * tra)
    return out


# Opt-in: the Pallas kernel (pallas_kernels.emanuel_mixing) pins the
# mixing matrices in VMEM per column block.  Measured on TPU v5e it
# matches the XLA path (~0.2 ms at 192²×41 — XLA fuses the reduced
# body to the HBM roofline on its own), so the simpler, bit-stable
# XLA path is the default; the kernel remains tested as insurance
# against XLA fusion regressions at other shapes.
USE_PALLAS_MIXING = False


def _mixing_terms(h, hp, q, qs, t, lv, qti, clw, ep, m, u, v, dph,
                  unk, vnk, icb, ict, cloud, tra=None, trank=None):
    """Dispatch: reduced mixing terms via XLA (default) or Pallas."""
    from ...dynamics.pallas_kernels import tpu_available
    if tra is None and USE_PALLAS_MIXING and tpu_available():
        from ...dynamics.pallas_kernels import emanuel_mixing
        return emanuel_mixing(_mixing_body, _LayCL, h, hp, q, qs, t,
                              lv, qti, clw, ep, m, u, v, dph, unk, vnk,
                              icb, ict, cloud)
    lay = _LayCF(h.shape[1])
    return _mixing_body(h, hp, q, qs, t, lv, qti, clw, ep, m, u, v,
                        dph, unk, vnk, icb.astype(jnp.int32),
                        ict.astype(jnp.int32), cloud, lay,
                        tra=tra, trank=trank)


def cupeman(t, q, qs, u, v, p, ph, cbmf_in, dt, elcrit, epmax,
            minorig: int, tra=None) -> EmanuelOut:
    """One Emanuel call. Inputs (ncol, NL) bottom-up: t (K), q/qs specific
    humidity (kg/kg), u/v (m/s), p (hPa), ph (ncol, NL+1) interface hPa
    (ph[:,0] below p[:,0]); cbmf_in: cloud-base mass-flux memory;
    dt: leapfrog step; elcrit/epmax (ncol,)."""
    ncol, NL2 = t.shape
    NL = NL2 - 1                       # Fortran nl = nd-1
    rdt = 1.0 / dt
    ii = jnp.arange(NL2)[None, :]      # level index (0-based)

    take = lambda a, idx: jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]

    # thermodynamic profiles (cupeman :460-500)
    lv = c.wlhv - CPVMCL * (t - c.tzero)
    cpn = c.cpd * (1.0 - q) + c.cpv * q
    tv = t * (1.0 + q * c.rgowi - q)
    gz = jnp.concatenate([
        jnp.zeros((ncol, 1), t.dtype),
        cumsum_mm(0.5 * c.rgas * (tv[:, 1:] + tv[:, :-1])
                  * (p[:, :-1] - p[:, 1:]) / ph[:, 1:NL2], axis=1)],
        axis=1)
    h = t * cpn + gz
    hm = (c.cpd * (1.0 - q) + CL * q) * (t - t[:, 0:1]) + lv * q + gz
    hm = hm.at[:, 0].set(lv[:, 0] * q[:, 0])

    # level of minimum hm above minorig (with the reference's descent
    # requirement hm(i) < hm(i-1)), capped at NL-2 (0-based)
    hms = jnp.where((ii >= minorig) & (ii >= 1)
                    & (hm < jnp.roll(hm, 1, axis=1)), hm, 1.0e12)
    ihmin = jnp.argmin(hms, axis=1)
    ihmin = jnp.where(jnp.min(hms, axis=1) >= 1.0e12, NL - 1, ihmin)
    ihmin = jnp.minimum(ihmin, NL - 2)
    # parcel origin: max hm in [minorig, ihmin]
    hmx = jnp.where((ii >= minorig) & (ii <= ihmin[:, None]), hm, -1.0e12)
    nk = jnp.argmax(hmx, axis=1)
    nk = jnp.maximum(nk, minorig)

    tnk = take(t, nk)
    qnk = take(q, nk)
    qsnk = take(qs, nk)
    pnk = take(p, nk)
    ok0 = (tnk >= 250.0) & (qnk > 0.0) & (ihmin != NL - 2)

    # LCL (Bolton 1980; :523-531)
    rh = qnk / qsnk
    chi = tnk / (1669.0 - 122.0 * rh - tnk)
    plcl = pnk * jnp.maximum(rh, 1e-10) ** chi
    ok1 = (plcl >= 200.0) & (plcl < 2000.0)
    # first level above LCL
    above = (p < plcl[:, None]) & (ii > nk[:, None])
    icb = jnp.where(jnp.any(above, axis=1),
                    jnp.argmax(above, axis=1), NL - 2)
    icb = jnp.minimum(icb, NL - 2)
    ok2 = icb < NL - 2

    # lifted parcel (tlift)
    tpk_dry, tvp_dry, tpk_wet, tvp_wet, clw_w = _tlift(
        t, q, qs, gz, p, nk, NL)
    below = ii <= icb[:, None]
    tp = jnp.where(below, tpk_dry, tpk_wet)
    tvp = jnp.where(below, tvp_dry, tvp_wet)
    clw = jnp.where(below, 0.0, clw_w)
    # tvp water loading (:556-558 & :604-607): subtract tp·qnk everywhere
    tvp = tvp - tp * qnk[:, None]
    tvp = tvp.at[:, NL].set(tvp[:, NL - 1]
                            - (gz[:, NL] - gz[:, NL - 1]) * c.rcpd)

    tvicb = take(tv, icb)
    tvpicb = take(tvp, icb)
    stable_noconv = (jnp.abs(cbmf_in) < MINCBMF) \
        & (tvpicb <= tvicb - DTMAX)
    trigger_ok = ok0 & ok1 & ok2
    active0 = trigger_ok & (~stable_noconv)

    # precipitation efficiencies (:576-596)
    tca = tp - c.tzero
    elacrit = jnp.where(tca >= 0.0, elcrit[:, None],
                        elcrit[:, None] * (1.0 - tca / TLCRIT))
    elacrit = jnp.maximum(elacrit, 0.0)
    ep = epmax[:, None] * (1.0 - elacrit / jnp.maximum(clw, 1.0e-8))
    ep = jnp.clip(ep, 0.0, epmax[:, None])
    ep = jnp.where(ii <= nk[:, None], 0.0, ep)

    lvcp = lv / cpn

    # CAPE levels (:652-676)
    dph = ph[:, :-1] - ph[:, 1:]                 # (ncol, NL2) layer dp
    by = (tvp - tv) * dph / p
    in_range = (ii >= icb[:, None] + 1) & (ii <= NL - 2)
    by_m = jnp.where(in_range, by, 0.0)
    cape_cum = cumsum_mm(by_m, axis=1)
    # ict1: one above the highest level with by>=0
    pos = jnp.where(in_range & (by_m >= 0.0), ii, -1)
    ict1 = jnp.max(pos, axis=1) + 1
    ict1 = jnp.where(jnp.max(pos, axis=1) < 0, icb + 1, ict1)
    # ict: one above the highest level with cumulative cape>0
    posc = jnp.where(in_range & (cape_cum > 0.0), ii, -1)
    ict = jnp.max(posc, axis=1) + 1
    ict = jnp.where(jnp.max(posc, axis=1) < 0, icb + 1, ict)
    capem = jnp.where(jnp.max(posc, axis=1) < 0, 0.0,
                      take(cape_cum, jnp.maximum(jnp.max(posc, axis=1), 0)))
    byp = take(by_m, jnp.minimum(ict, NL2 - 1))
    ict = jnp.maximum(ict, ict1)
    ict = jnp.minimum(ict, NL - 1)
    cape = capem + byp
    defrac = jnp.maximum(capem - cape, 0.001)
    frac = jnp.clip(-cape / defrac, 0.0, 1.0)

    # liquid water static energy of lifted parcel (:680-683)
    hnk = take(h, nk)
    hp = jnp.where((ii >= icb[:, None]) & (ii <= ict[:, None]),
                   hnk[:, None] + (lv + (c.cpd - c.cpv) * t) * ep * clw,
                   h)

    # cloud-base mass-flux closure (:690-735)
    icbm1 = jnp.maximum(icb - 1, 0)
    tvp_icbm1 = take(tvp, icbm1)
    p_icbm1 = take(p, icbm1)
    cpn_icbm1 = take(cpn, icbm1)
    tvpplcl = tvp_icbm1 - c.rgas * tvp_icbm1 * (p_icbm1 - plcl) \
        / (cpn_icbm1 * p_icbm1)
    p_icb = take(p, icb)
    p_icbp1 = take(p, jnp.minimum(icb + 1, NL2 - 1))
    tvaplcl = tvicb + (tvpicb - take(tvp, jnp.minimum(icb + 1, NL2 - 1))) \
        * (plcl - p_icb) / jnp.maximum(p_icb - p_icbp1, 0.1)
    inpbl = (ii >= nk[:, None]) & (ii <= icb[:, None] - 1)
    dtpbl = jnp.sum(jnp.where(inpbl, (tvp - tv) * dph, 0.0), axis=1) \
        / jnp.maximum(take(ph, nk) - take(ph, icb), 0.1)
    dtma = tvpplcl - tvaplcl + DTMAX + dtpbl
    damps = DAMP * dt / 300.0
    cbmf = (1.0 - damps) * cbmf_in + 0.1 * ALPHAE * dtma
    cbmf = jnp.maximum(cbmf, 0.0)
    cbmf = jnp.where(active0, cbmf, 0.0)
    active = active0 & ((cbmf >= MINCBMF) | (jnp.abs(cbmf_in) >= MINCBMF))

    # mixing rates m(i) (:707-718).  x[min(i, ict1)] == x[i] below ict1
    # and the (scalar-gathered) x[ict1] above — a select, not the full
    # (ncol, L)-indexed gather XLA:TPU lowers catastrophically (~17 ms
    # per gather at 192²×41 vs <0.1 ms for this form).
    below_ict1 = ii <= ict1[:, None]
    km_sel = lambda x: jnp.where(below_ict1, x, take(x, ict1)[:, None])
    tvk = km_sel(tv)
    tvpk = km_sel(tvp)
    dphk = km_sel(dph)
    cloud = (ii >= icb[:, None] + 1) & (ii <= ict[:, None])
    dbo = jnp.where(cloud,
                    jnp.abs(tvk - tvpk) + ENTP * 0.02 * dphk, 0.0)
    dbosum = jnp.sum(dbo, axis=1)
    m = cbmf[:, None] * dbo / jnp.maximum(dbosum[:, None], 1e-30)

    # ---- mixing matrices, reduced (sij/ment/qent/elij/uent/vent,
    #      :723-840 + the :975-1100 ment contractions) -----------------
    unk = take(u, nk)
    vnk = take(v, nk)
    qti = qnk[:, None] - ep * clw                # (ncol, NL2) per i
    trank = None
    if tra is not None:
        trank = jnp.take_along_axis(
            tra, nk[:, None, None], axis=1)[:, 0]   # (ncol, ntra)
    mix = _mixing_terms(h, hp, q, qs, t, lv, qti, clw, ep, m, u, v,
                        dph, unk, vnk, icb, ict, cloud,
                        tra=tra, trank=trank)
    wdtrain_mix = mix["wdtrain_mix"]

    # ---- precipitating downdraft (:845-960), scan top→bottom -----------
    wdtrain_det = c.egrav * ep * m * clw         # detrained precip per i
    # mixed-draught contribution comes reduced from _mixing_terms:
    # sum over j<i of max(elij[j,i]-(1-ep_i)·clw_i, 0)·ment[j,i]
    wdtrain = wdtrain_det + wdtrain_mix

    coeff = jnp.where(t > c.tzero, COEFFR, COEFFS)
    wt = jnp.where(t > c.tzero, OMTRAIN, OMTSNOW)
    in_dd = ii <= ict[:, None]

    def dd_body(carry, k):
        # k runs NL2-1 .. 0 (top → surface)
        (water_kp1, wt_kp1, mp_kp1, qp_kp1, up_kp1, vp_kp1,
         jtt_set, mp_jtt, p_jtt, evap_acc, trap_kp1) = carry
        act = in_dd[:, k]
        tk = t[:, k]
        qk = q[:, k]
        qsk = qs[:, k]
        phk = ph[:, k]
        phkp1 = ph[:, jnp.minimum(k + 1, NL2 - 1)]
        pk = p[:, k]
        qsm = 0.5 * (qk + qp_kp1)
        afac = jnp.maximum(coeff[:, k] * phk * (qsk - qsm)
                           / (1.0e4 + 2.0e3 * phk * qsk), 0.0)
        b6 = 100.0 * (phk - phkp1) * SIGS * afac / wt[:, k]
        c6 = (water_kp1 * wt_kp1 + wdtrain[:, k] / SIGD) / wt[:, k]
        revap = 0.5 * (-b6 + jnp.sqrt(b6 * b6 + 4.0 * c6))
        evap_k = SIGS * afac * revap
        water_k = revap * revap
        # downdraft mass flux
        hk = h[:, k]
        hkm1 = h[:, jnp.maximum(k - 1, 0)]
        pkm1 = p[:, jnp.maximum(k - 1, 0)]
        dhdp = jnp.maximum((hk - hkm1) / jnp.maximum(pkm1 - pk, 0.1),
                           10.0)
        mp_k = jnp.maximum(100.0 * c.regrav * lv[:, k] * SIGD * evap_k
                           / dhdp, 0.0)
        fac = 20.0 / jnp.maximum(ph[:, jnp.maximum(k - 1, 0)] - phk, 0.1)
        mp_k = (fac * mp_kp1 + mp_k) / (1.0 + fac)
        # linear decrease below 0.949 p1
        nearsfc = pk > 0.949 * p[:, 0]
        jtt_new = jnp.where(nearsfc & (~jtt_set), True, jtt_set)
        mp_jtt_new = jnp.where(nearsfc & (~jtt_set), mp_k, mp_jtt)
        p_jtt_new = jnp.where(nearsfc & (~jtt_set), pk, p_jtt)
        mp_k = jnp.where(nearsfc & jtt_set,
                         mp_jtt * (p[:, 0] - pk)
                         / jnp.maximum(p[:, 0] - p_jtt, 0.1), mp_k)
        mp_k = jnp.where(k == 0, 0.0, mp_k)   # mp(1)=0 (loop `if i/=1`)
        # downdraft properties
        qstm = qs[:, jnp.maximum(k - 1, 0)]
        grow = mp_k > mp_kp1
        rat = mp_kp1 / jnp.maximum(mp_k, 1e-30)
        qp_k_grow = qp_kp1 * rat + qk * (1.0 - rat) \
            + 100.0 * c.regrav * SIGD * (phk - phkp1) \
            * (evap_k / jnp.maximum(mp_k, 1e-30))
        up_k_grow = up_kp1 * rat + u[:, k] * (1.0 - rat)
        vp_k_grow = vp_kp1 * rat + v[:, k] * (1.0 - rat)
        if tra is not None:
            # trap carries the SHIFTED profile (trap(i)=tra(i-1),
            # :624-633); the growth branch mixes against it (:940-944)
            tra_init_k = tra[:, jnp.maximum(k - 1, 0), :]
            trap_k_grow = trap_kp1 * rat[:, None] \
                + tra_init_k * (1.0 - rat[:, None])
        tkp1 = t[:, jnp.minimum(k + 1, NL2 - 1)]
        lvkp1 = lv[:, jnp.minimum(k + 1, NL2 - 1)]
        gzk = gz[:, k]
        gzkp1 = gz[:, jnp.minimum(k + 1, NL2 - 1)]
        qp_k_desc = (gzkp1 - gzk + qp_kp1 * (lvkp1 + tkp1 * (CL - c.cpd))
                     + c.cpd * (tkp1 - tk)) / (lv[:, k] + tk * (CL - c.cpd))
        qp_k = jnp.where(grow, qp_k_grow,
                         jnp.where(mp_kp1 > 0.0, qp_k_desc, qp_kp1))
        if tra is not None:
            trap_k = jnp.where(grow[:, None], trap_k_grow,
                               jnp.where((mp_kp1 > 0.0)[:, None],
                                         trap_kp1, trap_kp1))
            trap_k = jnp.where(act[:, None], trap_k, tra[:, k, :])
        else:
            trap_k = trap_kp1
        up_k = jnp.where(grow, up_k_grow,
                         jnp.where(mp_kp1 > 0.0, up_kp1, up_kp1))
        vp_k = jnp.where(grow, vp_k_grow,
                         jnp.where(mp_kp1 > 0.0, vp_kp1, vp_kp1))
        qp_k = jnp.clip(qp_k, 0.0, qstm)
        # inactive levels keep zero state
        water_k = jnp.where(act, water_k, 0.0)
        evap_k = jnp.where(act, evap_k, 0.0)
        mp_k = jnp.where(act, mp_k, 0.0)
        qp_k = jnp.where(act, qp_k, qk)
        carry = (water_k, wt[:, k], mp_k, qp_k, up_k, vp_k,
                 jtt_new, mp_jtt_new, p_jtt_new, evap_acc, trap_k)
        return carry, (water_k, evap_k, mp_k, qp_k, up_k, vp_k,
                       trap_k)

    zc = jnp.zeros((ncol,), t.dtype)
    trap0 = (tra[:, -1, :] if tra is not None
             else jnp.zeros((ncol, 1), t.dtype))
    init = (zc, zc + OMTSNOW, zc, q[:, -1] * 0.0, zc, zc,
            jnp.zeros((ncol,), bool), zc, zc + 1.0, zc, trap0)
    ks = jnp.arange(NL2 - 1, -1, -1)
    carry, outs = jax.lax.scan(dd_body, init, ks)
    water_r, evap_r, mp_r, qp_r, up_r, vp_r, trap_r = outs
    flip = lambda a: jnp.flip(a.T, axis=1)       # (ncol, NL2) bottom-up
    water = flip(water_r)
    evap = flip(evap_r)
    mp = flip(mp_r)
    qp = flip(qp_r)
    up = flip(up_r)
    vp = flip(vp_r)
    trap = (jnp.flip(jnp.moveaxis(trap_r, 0, 1), axis=1)
            if tra is not None else None)
    # downdraft only when ep(ict) >= 1e-4 (:845)
    has_dd = take(ep, ict) >= 1.0e-4
    water = water * has_dd[:, None]
    evap = evap * has_dd[:, None]
    mp = mp * has_dd[:, None]
    wtf = jnp.where(t > c.tzero, OMTRAIN, OMTSNOW)
    precip = wtf[:, 0] * SIGD * water[:, 0] * c.regrav * has_dd

    # ---- tendencies (:975-1100) ----------------------------------------
    shift_p1 = lambda a: jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    shift_m1 = lambda a: jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
    dpinv = 0.01 / jnp.maximum(dph, 0.01)         # per layer (ncol, NL2)
    cpinv = 1.0 / cpn

    # amp1(i) = Σ_{k>i} m(k) [only for i>=nk] + Σ_{k<=i, j>i} ment(k,j)
    m_rcum = cumsum_mm(m, axis=1, reverse=True)
    amp1_m = shift_p1(m_rcum)                     # Σ_{k>=i+1} m(k)
    amp1_m = jnp.where(ii >= nk[:, None], amp1_m, 0.0)
    amp1 = amp1_m + mix["amp1_e"]
    ad = mix["ad"]

    tp1 = shift_p1(t)
    tm1 = shift_m1(t)
    qp1_ = shift_p1(q)
    qm1 = shift_m1(q)
    up1 = shift_p1(u)
    um1 = shift_m1(u)
    vp1 = shift_p1(v)
    vm1 = shift_m1(v)
    gzp1 = shift_p1(gz)
    gzm1 = shift_m1(gz)
    mp_p1 = shift_p1(mp)
    qp_p1 = shift_p1(qp)
    up_p1 = shift_p1(up)
    vp_p1 = shift_p1(vp)
    wat_p1 = shift_p1(water)
    wt_p1 = shift_p1(wtf)

    mentii = mix["mentii"]
    qentii = mix["qentii"]
    ft = c.egrav * dpinv * (amp1 * (tp1 - t + (gzp1 - gz) * cpinv)
                            - ad * (t - tm1 + (gz - gzm1) * cpinv)) \
        - SIGD * lvcp * evap
    ft = ft + c.egrav * dpinv * mentii \
        * (hp - h + t * (c.cpv - c.cpd) * (q - qentii)) * cpinv
    ft = ft + SIGD * wt_p1 * (CL - c.cpd) * wat_p1 * (tp1 - t) \
        * dpinv * cpinv
    fq = c.egrav * dpinv * (amp1 * (qp1_ - q) - ad * (q - qm1))
    fu = c.egrav * dpinv * (amp1 * (up1 - u) - ad * (u - um1))
    fv = c.egrav * dpinv * (amp1 * (vp1 - v) - ad * (v - vm1))
    # mixed-draught detrainment terms: Σ_k ment(k,i)·(qent(k,i)[−awat]−q_i)
    fq = fq + c.egrav * dpinv * mix["sum_q"]
    fu = fu + c.egrav * dpinv * mix["sum_u"]
    fv = fv + c.egrav * dpinv * mix["sum_v"]
    # downdraft terms
    fq = fq + SIGD * evap + c.egrav * dpinv \
        * (mp_p1 * (qp_p1 - q) - mp * (qp - qm1))
    fu = fu + c.egrav * dpinv * (mp_p1 * (up_p1 - u) - mp * (up - um1))
    fv = fv + c.egrav * dpinv * (mp_p1 * (vp_p1 - v) - mp * (vp - vm1))
    ftra = None
    if tra is not None:
        # tracer tendencies mirror fu term-for-term (:994-1095)
        sh3_p1 = lambda a: jnp.concatenate([a[:, 1:], a[:, -1:]],
                                           axis=1)
        sh3_m1 = lambda a: jnp.concatenate([a[:, :1], a[:, :-1]],
                                           axis=1)
        d3 = dpinv[:, :, None]
        ftra = c.egrav * d3 * (
            amp1[:, :, None] * (sh3_p1(tra) - tra)
            - ad[:, :, None] * (tra - sh3_m1(tra)))
        ftra = ftra + c.egrav * d3 * mix["sum_tra"]
        ftra = ftra + c.egrav * d3 * (
            mp_p1[:, :, None] * (sh3_p1(trap) - tra)
            - mp[:, :, None] * (trap - sh3_m1(tra)))
    # zero outside convective layer
    conv_lay = ii <= ict[:, None]
    ft = jnp.where(conv_lay, ft, 0.0)
    fq = jnp.where(conv_lay, fq, 0.0)
    fu = jnp.where(conv_lay, fu, 0.0)
    fv = jnp.where(conv_lay, fv, 0.0)

    # enthalpy/momentum conservation adjustment (:1127-1150)
    dphm = jnp.where(conv_lay, dph, 0.0)
    norm = jnp.maximum(jnp.sum(dphm, axis=1), 0.1)
    ents = jnp.sum((cpn * ft + lv * fq) * dphm, axis=1) / norm
    uav = jnp.sum(fu * dphm, axis=1) / norm
    vav = jnp.sum(fv * dphm, axis=1) / norm
    ft = jnp.where(conv_lay, ft - ents[:, None] / cpn, ft)
    fu = jnp.where(conv_lay, (1.0 - CU) * (fu - uav[:, None]), fu)
    fv = jnp.where(conv_lay, (1.0 - CU) * (fv - vav[:, None]), fv)
    if tra is not None:
        # exact tracer-mass conservation (:1142-1150)
        c3 = conv_lay[:, :, None]
        ftra = jnp.where(c3, ftra, 0.0)
        traav = jnp.sum(ftra * dphm[:, :, None], axis=1) \
            / norm[:, None]
        ftra = jnp.where(c3, ftra - traav[:, None, :], ftra)

    # CFL guard (iflag=4 keeps tendencies; just clamp magnitude)
    cfl = 2.0 * c.egrav * dpinv * amp1
    scale = jnp.minimum(1.0, (0.9 * rdt) / jnp.maximum(cfl, 1e-30))
    scale = jnp.min(jnp.where(conv_lay, scale, 1.0), axis=1)[:, None]
    ft = ft * scale
    fq = fq * scale
    fu = fu * scale
    fv = fv * scale
    if tra is not None:
        ftra = ftra * scale[:, :, None]

    # cloud fraction (Xu & Krueger; :1160-1178)
    mmid = 0.5 * (m + shift_p1(m))
    zrel = gz * c.regrav
    depth = take(zrel, ict) - take(zrel, icb)
    deep = depth >= 2000.0
    cf_deep = jnp.clip(KFAC_DEEP * jnp.log1p(K2_CONST * mmid), 0.01, 0.6)
    cf_shal = jnp.clip(KFAC_SHAL * jnp.log1p(K2_CONST * mmid), 0.01, 0.2)
    incloud = (ii >= icb[:, None]) & (ii <= ict[:, None])
    cldfra = jnp.where(incloud,
                       jnp.where(deep[:, None], cf_deep, cf_shal), 0.0)

    act = active[:, None]
    return EmanuelOut(
        ft=jnp.where(act, ft, 0.0), fq=jnp.where(act, fq, 0.0),
        fu=jnp.where(act, fu, 0.0), fv=jnp.where(act, fv, 0.0),
        precip=jnp.where(active, jnp.maximum(precip, 0.0), 0.0),
        cbmf=jnp.where(active, cbmf, 0.0),
        cldfra=jnp.where(act, cldfra, 0.0),
        kbase=icb, ktop=ict, active=active,
        ftra=(jnp.where(act[:, :, None], ftra, 0.0)
              if tra is not None else None))
