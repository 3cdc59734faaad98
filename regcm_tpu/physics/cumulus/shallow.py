"""Shallow convection scheme (enabled by negative icup).

Faithful jax port of ``Main/cumlib/mod_cu_shallow.F90`` (``shallcu`` :42,
``shallow`` :98-894): a Grell/Arakawa-Schubert-type non-precipitating
shallow cumulus. Two static controls are evaluated — on the current
state and on the large-scale-forced state — plus a cloud-modified
state built from the unit-mass-flux response (kernel); the mass flux is
``xmb = −f/xk`` with forcing ``f = (AA_forced − AA_current)/dt`` and
kernel ``xk = (AA_modified − AA_current)/mbdt``. With ``c0 = 0`` (:36)
the scheme produces no precipitation — only T/qv redistribution.

TPU-native form: per-column searches (``minim``/``maxim``/``findbase``)
become masked argmin/argmax and first-true reductions over dense
(ncol, kz) bottom-up arrays; the in-cloud MSE/moisture cascades
(``entrs``/``precip``) are ``lax.scan`` recurrences; the ``kbloop``
cloud-base retry is an exhaustive candidate scan over k22. All
reference quirks are reproduced: the ``entrs`` layer "thickness"
``dz = ½(z[k-1]+z[k+1])`` (a *sum*, :605), the ``toshall = 50 K``
ice-branch threshold that never triggers (:175), and the zeroed
``della(kbeg)`` (:653).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c

RADS = 50.0          # :34  — entrainment radius → rate xx = 0.2/rads
PCUT = 400.0         # :35  — hPa, full rainout threshold (moot, c0=0)
C0 = 0.0             # :36  — autoconversion (zero: no shallow precip)
DEPTH_MAX = 3000.0   # :610 — shallow cloud depth cap (m)

import math

_HT1 = c.wlhv / c.cpd
_BE = c.ep2 * _HT1 / c.c287
_AE = _BE / c.tzero + math.log(c.c1es)


class ShallowOut(NamedTuple):
    outts: jax.Array     # (ncol, kz) bottom-up T tendency (K/s)
    outqs: jax.Array     # qv tendency (kg/kg/s)
    xmb: jax.Array       # cloud-base mass flux (kg/m2/s)


def _qes(t, p):
    """Local saturation mixing ratio (:245-250); p in hPa."""
    e = jnp.exp(_AE - _BE / t)
    q = c.ep2 * e / (100.0 * p - (1.0 - c.ep2) * e)
    return jnp.maximum(q, c.minqq)


def _heipre(p, tv, z1, psurf):
    """Hydrostatic heights from log-p integration (heipre, :704-717)."""
    ncol, kz = p.shape
    z0 = z1 - (jnp.log(p[:, 0]) - jnp.log(psurf)) * c.rgas \
        * tv[:, 0] * c.regrav

    def step(zprev, k):
        tvbar = 0.5 * (tv[:, k] + tv[:, k - 1])
        zk = zprev - (jnp.log(p[:, k]) - jnp.log(p[:, k - 1])) \
            * c.rgas * tvbar * c.regrav
        return zk, zk

    _, zs = jax.lax.scan(step, z0, jnp.arange(1, kz))
    return jnp.concatenate([z0[:, None], zs.T], axis=1)


def _mid(a):
    """½(f_k + f_{k+1}) with the top level unchanged."""
    return 0.5 * (a + jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1))


def _entrs(kbcon, he, hes, z, hkb, xx):
    """In-cloud MSE + cloud top (entrs, :583-615). Returns (hc, ktop,
    active); ktop<2 → inactive (reference returns)."""
    ncol, kz = he.shape
    ii = jnp.arange(kz)[None, :]
    hesmid = _mid(hes)
    hc_init = jnp.where(ii <= kbcon[:, None], hkb[:, None], hesmid)
    zkbc1 = jnp.take_along_axis(z, jnp.minimum(kbcon + 1,
                                               kz - 1)[:, None], 1)[:, 0]

    def body(carry, k):
        hc_prev, ktop, stopped = carry
        # reference quirk: dz is the SUM ½(z[k-1]+z[k+1]) (:605)
        dz = 0.5 * (z[:, k - 1] + z[:, k + 1])
        hc_k = (hc_prev * (1.0 - 0.5 * dz * xx) + xx * dz * he[:, k]) \
            / (1.0 + 0.5 * xx * dz)
        inloop = (k > kbcon) & ~stopped
        hc_k = jnp.where(inloop, hc_k, hc_init[:, k])
        dby = hc_k - hesmid[:, k]
        depth = z[:, k] - zkbc1
        trig = inloop & ((dby < 0.0) | (depth > DEPTH_MAX))
        ktop = jnp.where(trig, (k - 1).astype(ktop.dtype), ktop)
        stopped = stopped | trig
        hc_prev = jnp.where(inloop, hc_k, hc_prev)
        return (hc_prev, ktop, stopped), hc_k

    # carry starts at the cloud base value hkb
    init = (hkb, jnp.ones((ncol,), jnp.int32), jnp.zeros((ncol,), bool))
    (_, ktop, stopped), hcs = jax.lax.scan(body, init,
                                           jnp.arange(1, kz - 1))
    hc = jnp.concatenate([hc_init[:, :1], hcs.T, hc_init[:, -1:]], axis=1)
    return hc, ktop, (ktop >= 2) & stopped


def _zunc(kbeg, kb, ktop, kz):
    """Normalized updraft mass flux (zunc, :765-799) with entnet=0:
    zu=1 for kbeg ≤ k ≤ ktop, 0 below kbeg."""
    ii = jnp.arange(kz)[None, :]
    return jnp.where((ii >= kbeg[:, None]) & (ii <= ktop[:, None]),
                     1.0, 0.0)


def _precip_qrc(kb, kbcon, ktop, xx, hc, hes, t, qe, qes, z, p, qkb, zu):
    """In-cloud moisture cascade (precip, :811-892) with c0=0: the
    updraft water+vapor qrc equals the plume qc; pw ≡ 0."""
    ncol, kz = t.shape
    ii = jnp.arange(kz)[None, :]
    hesmid = _mid(hes)
    qemid = _mid(qe)
    qrc_init = jnp.where(ii <= kb[:, None], qemid, qes)
    qrc_init = jnp.where((ii >= kb[:, None]) & (ii <= kbcon[:, None]),
                         qkb[:, None], qrc_init)

    def body(qc_prev, k):
        attop = (k == ktop)
        dh = jnp.where(attop, hc[:, k] - hes[:, k],
                       hc[:, k] - hesmid[:, k])
        dz = jnp.where(attop, 0.5 * (z[:, k] - z[:, k - 1]),
                       0.5 * (z[:, jnp.minimum(k + 1, kz - 1)]
                              - z[:, k - 1]))
        agamma = _HT1 * (c.wlhv / (c.rwat * t[:, k] ** 2)) * qe[:, k]
        qc_k = (qc_prev * (1.0 - xx * dz * 0.5) + xx * dz * qe[:, k]) \
            / (1.0 + 0.5 * dz * xx)
        qrch = qes[:, k] + (1.0 / c.wlhv) * (agamma / (1.0 + agamma)) * dh
        qrc_k = (qc_k - qrch) / (1.0 + C0 * dz) + qrch
        qrc_k = jnp.where(attop,
                          (qc_k - qes[:, k]) / (1.0 + C0 * dz)
                          + qes[:, k], qrc_k)
        qrc_k = jnp.where(attop & (p[:, k] < PCUT), qes[:, k], qrc_k)
        inloop = (k > kbcon) & (k <= ktop)
        qrc_k = jnp.where(inloop, qrc_k, qrc_init[:, k])
        qc_prev = jnp.where(inloop, qrc_k, qc_prev)   # qc(k)=qrc(k) (:890)
        return qc_prev, qrc_k

    _, qrcs = jax.lax.scan(body, qkb, jnp.arange(1, kz))
    return jnp.concatenate([qrc_init[:, :1], qrcs.T], axis=1)


def _cloudws(hc, qes, hes, zu, z, t, kbcon, ktop):
    """Cloud work function (cloudws, :553-578)."""
    ncol, kz = t.shape
    ii = jnp.arange(kz)[None, :]
    g1 = _HT1 * (c.wlhv / (c.rwat * t ** 2)) * qes
    nxt = lambda a: jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    dt2 = 0.5 * (t + nxt(t))
    dg = 0.5 * (g1 + nxt(g1))
    dh = 0.5 * (hes + nxt(hes))
    dz = nxt(z) - z
    aa = dz * (c.egrav / (c.cpd * dt2)) * zu * ((hc - dh) / (1.0 + dg))
    lay = (ii >= kbcon[:, None]) & (ii <= ktop[:, None])
    return jnp.sum(jnp.where(lay, aa, 0.0), axis=1)


def _static_control(t, qe_in, p, psurf, z1, kbmax, xx):
    """One full static control: environment → cloud base/top → in-cloud
    profiles → cloud work function (:243-351). Returns a dict."""
    ncol, kz = t.shape
    ii = jnp.arange(kz)[None, :]
    qes = _qes(t, p)
    qe = jnp.minimum(qe_in, qes)
    tv = t + c.ep1 * qe * t
    z = _heipre(p, tv, z1, psurf)
    he = c.egrav * z + c.cpd * t + c.wlhv * qe
    hes = c.egrav * z + c.cpd * t + c.wlhv * qes
    he = jnp.minimum(he, hes)
    het = _mid(he)

    # kbhe = argmin hes (minim from 1, :273-275); k22 = LAST argmax of
    # het in [0, kbhe] (maxim uses >=, :746-761)
    kbhe = jnp.argmin(hes, axis=1)
    hmask = jnp.where(ii <= kbhe[:, None], het, -1e30)
    k22_0 = kz - 1 - jnp.argmax(hmask[:, ::-1], axis=1)

    # kbloop (:280-303): smallest k22 ≥ k22_0 whose hkb reaches free
    # convection below kz-1; inactive if none ≤ kbmax
    hemid = _mid(he)
    hesmid = _mid(hes)
    # cand[n, j, k]: hkb(j) ≥ hesmid(k) for k ≥ j (j = candidate k22)
    cand = (hemid[:, :, None] >= hesmid[:, None, :]) \
        & (ii[:, None, :] >= ii[:, :, None]) \
        & (ii[:, None, :] <= kz - 3)
    has_base = jnp.any(cand, axis=2)                       # (ncol, kz)
    okj = has_base & (ii >= k22_0[:, None]) & (ii <= kbmax)
    k22 = _first_true(okj, ii, kz - 1)
    act = jnp.any(okj, axis=1)
    cand_sel = jnp.take_along_axis(cand, k22[:, None, None],
                                   axis=1)[:, 0, :]       # (ncol, kz)
    kidx = jnp.where(cand_sel, ii, 10 ** 6)
    kbcon = jnp.minimum(jnp.min(kidx, axis=1), kz - 2)

    hkb = jnp.take_along_axis(hemid, k22[:, None], 1)[:, 0]
    qemid = _mid(qe)
    qkb = jnp.take_along_axis(qemid, k22[:, None], 1)[:, 0]

    hc, ktop, topok = _entrs(kbcon, he, hes, z, hkb, xx)
    act = act & topok
    ktop = jnp.clip(ktop, 2, kz - 3)
    zu = _zunc(k22, kbcon, ktop, kz)
    qrc = _precip_qrc(k22, kbcon, ktop, xx, hc, hes, t, qe, qes,
                      z, p, qkb, zu)
    ax = _cloudws(hc, qes, hes, zu, z, t, kbcon, ktop)
    aa = jnp.maximum(ax, 0.0)
    act = act & (ax > 0.0)
    return dict(qes=qes, qe=qe, z=z, he=he, hes=hes, hc=hc, qrc=qrc,
                zu=zu, k22=k22, kbcon=kbcon, ktop=ktop, hkb=hkb,
                qkb=qkb, aa=aa, act=act)


def _first_true(mask, ii, default):
    idx = jnp.where(mask, ii, 10 ** 6)
    out = jnp.min(idx, axis=1)
    return jnp.where(out >= 10 ** 6, default, out)


def _kerhels(var, xx, zu, vkb, vc, p, z, kb, kbeg, ktop, mbdt, cd,
             clamp):
    """Unit-mass-flux response della and modified field xvar
    (kerhels, :621-702). kb=kbcon (detrainment floor), kbeg=k22."""
    ncol, kz = var.shape
    ii = jnp.arange(kz)[None, :]
    nxt = lambda a: jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    prv = lambda a: jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
    dv1 = 0.5 * (var + nxt(var))
    dv2 = var
    dv3 = 0.5 * (var + prv(var))
    zu1 = zu
    zu2 = prv(zu)
    dz = 0.5 * (nxt(z) - prv(z))
    detup = (0.5 * (prv(vc) + vc) - dv2) * xx * cd * dz * zu2
    detup = jnp.where(ii <= kb[:, None], 0.0, detup)
    dp = 50.0 * (prv(p) - nxt(p))
    della = (zu1 * (dv1 - dv2) + zu2 * (dv2 - dv3) + detup) \
        * c.egrav / dp
    interior = (ii >= kbeg[:, None] + 1) & (ii <= ktop[:, None] - 1)
    della = jnp.where(interior, della, 0.0)
    # cloud top (:679-684)
    tidx = ktop[:, None]
    tk = lambda a: jnp.take_along_axis(a, tidx, 1)[:, 0]
    tkm = lambda a: jnp.take_along_axis(a, tidx - 1, 1)[:, 0]
    dptop = 100.0 * (tkm(p) - tk(p))
    dtop = tkm(zu) * (tk(vc) - 0.5 * (tk(var) + tkm(var))) \
        * c.egrav / dptop
    della = jnp.where(ii == tidx, dtop[:, None], della)
    xvar = della * mbdt + var
    if clamp:
        bad = (xvar <= 0.0) & (ii <= tidx)
        xvar = jnp.where(bad, c.minqq, xvar)
        della = jnp.where(bad, 0.0, della)
    xvkb = jnp.take_along_axis(della, jnp.maximum(kbeg, 0)[:, None],
                               1)[:, 0] * mbdt + vkb
    return della, xvar, xvkb


def shallcu(t, q, tten, qvten, p, psur, ter, dtime, dtcum=None
            ) -> ShallowOut:
    """Shallow convection on (ncol, kz) BOTTOM-UP columns.

    t/q: current decoupled T (K) and qv (kg/kg); tten/qvten: decoupled
    accumulated tendencies (K/s, kg/kg/s) defining the forced state
    (tns/qns, :65-69); p (hPa), psur (hPa), ter terrain (m);
    dtime: leapfrog dt (s); dtcum: cumulus call interval (defaults dt).
    """
    ncol, kz = t.shape
    if dtcum is None:
        dtcum = dtime
    xx = 0.2 / RADS
    mbdt = dtcum * 5.0e-3
    kbmax = (kz * 3) // 4 - 3 - 1          # 0-based (:52)
    z1 = jnp.maximum(ter, 1.0e-5)
    cd = jnp.full_like(t, xx)       # cdd(k)=1·xx (:222); detup gets r·cd

    tns = t + tten * dtime
    qns = q + qvten * dtime

    # ---- pass 1: current state ----------------------------------------
    s1 = _static_control(t, q, p, psur, z1, kbmax, xx)
    act = s1["act"]
    aa1 = s1["aa"]

    # kernel state (lloop==1 block, :368-477)
    hh, xhe, xhkb = _kerhels(s1["he"], xx, s1["zu"], s1["hkb"],
                             s1["hc"], p, s1["z"], s1["kbcon"],
                             s1["k22"], s1["ktop"], mbdt, cd, False)
    dq, xqe, xqkb = _kerhels(s1["qe"], xx, s1["zu"], s1["qkb"],
                             s1["qrc"], p, s1["z"], s1["kbcon"],
                             s1["k22"], s1["ktop"], mbdt, cd, True)
    xt = (mbdt / c.cpd) * (hh - c.wlhv * dq) + t
    dellt = (1.0 / c.cpd) * (hh - c.wlhv * dq)
    dellq = dq

    # modified-state env (:406-426)
    xqe = jnp.maximum(xqe, c.minqq)
    xqes = _qes(xt, p)
    xqe = jnp.minimum(xqe, xqes)
    xtv = xt + c.ep1 * xqe * xt
    xz = _heipre(p, xtv, z1, psur)
    xhes = c.egrav * xz + c.cpd * xt + c.wlhv * xqes
    xhe = jnp.minimum(xhe, xhes)
    xhc, ktopx, xok = _entrs(s1["kbcon"], xhe, xhes, xz, xhkb, xx)
    ktopx = jnp.clip(ktopx, 2, kz - 3)
    xzu = _zunc(s1["k22"], s1["kbcon"], ktopx, kz)
    xax = _cloudws(xhc, xqes, xhes, xzu, xz, xt, s1["kbcon"], ktopx)
    xa = jnp.where(xok, jnp.maximum(xax, 0.0), 0.0)
    act = act & ~((xa < c.dlowval) & (aa1 < c.dlowval))
    xk = (xa - aa1) / mbdt
    xk = jnp.where(xk > 0.0, -1.0, xk)

    # ---- pass 2: large-scale-forced state (:181-205,479-490) ----------
    s2 = _static_control(tns, qns, p, psur, z1, kbmax, xx)
    aold = aa1
    aa2 = jnp.where(s2["act"], s2["aa"], 0.0)
    f = jnp.where((aold < c.dlowval) | (aa2 < c.dlowval), 0.0,
                  (aa2 - aold) / dtcum)
    xmb = jnp.where(jnp.abs(xk) > c.dlowval, -f / xk, 0.0)
    xmb = jnp.maximum(xmb, 0.0)
    act = act & (s1["k22"] <= kbmax)
    xmb = jnp.where(act, xmb, 0.0)

    # ---- feedback (araouts, :508-551) ----------------------------------
    outtes = dellt * xmb[:, None] * 86400.0
    bad = jnp.any((outtes > 500.0) | (outtes < -200.0), axis=1)
    xmb = jnp.where(bad, 0.0, xmb)
    outts = dellt * xmb[:, None]
    outqs = dellq * xmb[:, None]
    return ShallowOut(outts=outts, outqs=outqs, xmb=xmb)
