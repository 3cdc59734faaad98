"""Kuo cumulus scheme (icup=1), Anthes-Keyser/Kuo (1983).

Faithful jax port of ``Main/cumlib/mod_cu_kuo.F90`` (``cupara`` :75-290)
with the heating/moisture-flux weight tables of
``Main/mod_params.F90:2217-2276`` (twght/vqflx parabolic-in-log-sigma
profiles).

Trigger: column moisture convergence (the accumulated horizontal qv
advection tendency) above qdcrit with a conditionally unstable sounding
(max θe parcel below 700 hPa, LCL, cloud-top where saturation θe exceeds
parcel θe). The per-column (kbase, ktop)-indexed weight tables become a
gather from precomputed (kz, kz, kz) arrays.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import constants as c

QDCRIT = 3.0e-7
PERT = 1.0
PERQ = 1.0e-3
DLT = 3.0
CDSCLD = 0.3
BFAC = 0.5
SVPT0 = c.tzero
SVP1, SVP2, SVP3 = 0.6112, 17.67, 29.65
VQRANG = 5.0e-4


def build_kuo_tables(sigma: np.ndarray, hsigma: np.ndarray,
                     dsigma: np.ndarray, ptop_cb: float
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """twght/vqflx tables (Main/mod_params.F90:2226-2276), numpy host."""
    kz = len(hsigma)
    twght = np.zeros((kz, kz + 1, kz + 1))     # [k, kbase, ktop] 1-based
    vqflx = np.zeros((kz, kz + 1, kz + 1))
    for kbase in range(5, kz + 1):
        for ktop in range(1, kbase - 2):
            bb = np.log(hsigma[ktop - 1]) + np.log(hsigma[kbase - 1])
            cc = np.log(hsigma[ktop - 1]) * np.log(hsigma[kbase - 1])
            ssum = 0.0
            for k in range(ktop, kbase + 1):
                xx = np.log(hsigma[k - 1])
                twght[k - 1, kbase, ktop] = xx * xx - bb * xx + cc
                ssum += twght[k - 1, kbase, ktop] * dsigma[k - 1]
            if abs(ssum) > 1e-30:    # ssum<0: signs cancel (ref :2244)
                twght[:, kbase, ktop] /= ssum
            twght[:ktop - 1, kbase, ktop] = 0.0
            twght[kbase:, kbase, ktop] = 0.0
            xtop = np.log((100.0 - ptop_cb) * sigma[ktop - 1] + ptop_cb)
            xbot = np.log((100.0 - ptop_cb) * sigma[kbase] + ptop_cb)
            bb = xtop + xbot
            cc = xtop * xbot
            wk = xtop * xtop - bb * xtop + cc
            qk = -(xbot * xbot - bb * xbot + cc)
            vqmax = 0.0
            for k in range(ktop, kbase + 1):
                xx = np.log((100.0 - ptop_cb) * sigma[k] + ptop_cb)
                yy = np.log((100.0 - ptop_cb)
                            * (sigma[ktop - 1] + sigma[kbase]
                               - sigma[k]) + ptop_cb)
                wkp1 = xx * xx - bb * xx + cc
                qkp1 = -(yy * yy - bb * yy + cc)
                vqflx[k - 1, kbase, ktop] = -(wkp1 * qkp1 - wk * qk) \
                    / dsigma[k - 1]
                vqmax = max(vqmax, abs(vqflx[k - 1, kbase, ktop]))
                wk, qk = wkp1, qkp1
            if vqmax > 0:
                vqflx[:, kbase, ktop] *= VQRANG / vqmax
    return twght, vqflx


class KuoOut(NamedTuple):
    tten: jax.Array      # decoupled K/s, (kz, ncol-shape)
    qvten: jax.Array
    prate: jax.Array
    kbase: jax.Array
    ktop: jax.Array
    active: jax.Array


def kuo(t, qv, p_cb, psx_cb, qadv, sigma, hsigma, dsigma, twght, vqflx,
        ptop_cb, k700: int) -> KuoOut:
    """Kuo convection. t/qv/p (kz, …) top-down model order (index 0 =
    top); p in cb; qadv: COUPLED horizontal qv advection tendency
    (cb·kg/kg/s, the reference qxten at the only-hadv stage,
    mod_cu_kuo.F90:96-106); psx_cb: full surface pressure in cb;
    twght/vqflx: jnp tables [k, kbase, ktop] 1-based. Output tten/qvten
    are /psx (ref :248-250) — the caller recouples with p*."""
    kz = t.shape[0]
    grid_shape = t.shape[1:]
    kidx = jnp.arange(1, kz + 1)[:, None, None]   # 1-based level index
    ds3 = dsigma[:, None, None]
    hs3 = hsigma[:, None, None]

    sca = jnp.sum(qadv * ds3, axis=0)
    trig = sca >= QDCRIT

    # parcel: max θe between k700 and surface with perturbations
    ttp = t + PERT
    q = qv + PERQ
    t1 = ttp * (100.0 / p_cb) ** c.rovcp
    ee = p_cb * q / (0.622 + q)
    tdpt = jnp.minimum(1.0 / (1.0 / SVPT0 - c.rwat / c.wlhv
                              * jnp.log(jnp.maximum(ee, 1e-10) / 0.611)),
                       ttp)
    tlcl0 = tdpt - (0.212 + 1.571e-3 * (tdpt - SVPT0)
                    - 4.36e-4 * (ttp - SVPT0)) * (ttp - tdpt)
    eqt = t1 * jnp.exp(c.wlhvocp * q / jnp.maximum(tlcl0, 150.0))
    lowlev = kidx >= k700
    eqt_m = jnp.where(lowlev, eqt, -1.0)
    kmax = jnp.argmax(eqt_m, axis=0)
    take = lambda a: jnp.take_along_axis(a, kmax[None], axis=0)[0]
    eqtm = take(eqt_m)
    tmax = take(ttp)
    qmax = take(q)
    pmax = take(p_cb)

    # LCL (dew point / lapse construction, :125-140)
    emax = qmax * pmax / (c.ep2 + qmax)
    tdmax = (SVP3 * jnp.log(jnp.maximum(emax, 1e-10) / SVP1)
             - SVP2 * SVPT0) / (jnp.log(jnp.maximum(emax, 1e-10) / SVP1)
                                - SVP2)
    dalr = c.egrav * c.rcpd
    dplr = (c.egrav * tdmax ** 2) / (c.ep2 * c.wlhv * tmax)
    zlcl = jnp.maximum((tmax - tdmax) / (dalr - dplr), 0.0)
    tlcl = tmax - dalr * zlcl
    tmean = 0.5 * (tmax + tlcl)
    plcl = pmax * jnp.exp(-(c.egrav * zlcl) / (c.rgas * tmean))
    siglcl = (plcl - ptop_cb) / psx_cb

    # kbase: layer where LCL sits (largest 1-based k with hsigma<=siglcl)
    below = hs3 <= siglcl[None]
    kbase = jnp.max(jnp.where(below, kidx, 1), axis=0)
    kbase = jnp.clip(kbase, 5, kz)

    # saturation θe above LCL
    ees = SVP1 * jnp.exp(SVP2 * (t - SVPT0) / (t - SVP3))
    qs = c.ep2 * ees / jnp.maximum(p_cb - ees, 1e-3)
    seqt = t1 / (1.0 + 0.0) * 0.0 + (t * (100.0 / p_cb) ** c.rovcp) \
        * jnp.exp(c.wlhvocp * qs / t)
    # ktop: scanning down from kbase, first level (from base upward)
    # where seqt − eqtm > dlt → stop (cloud top one below)
    over = (seqt - eqtm[None] > DLT) & (kidx <= kbase[None])
    # topmost contiguous... reference: loop kk=kbase..1 upward; exit at
    # first deqt>dlt → ktop = that kk (bounded below kbase-3)
    cand = jnp.where(over, kidx, 0)
    ktop = jnp.max(cand, axis=0)                 # deepest violating level
    ktop = jnp.where(ktop == 0, 1, ktop)
    ktop = jnp.minimum(ktop, jnp.maximum(kbase - 3, 1))

    dsc = siglcl - jnp.take_along_axis(
        hs3 * jnp.ones_like(t), (ktop - 1)[None], axis=0)[0]
    deep = dsc >= CDSCLD

    incloud = (kidx >= ktop[None]) & (kidx <= kbase[None])
    ttsum = jnp.sum(jnp.where(incloud, (eqtm[None] - seqt) * ds3, 0.0),
                    axis=0)
    unstable = ttsum >= 0.0
    active = trig & deep & unstable

    # Kuo partitioning (b factor) over [ktop, kz]
    lowcloud = kidx >= ktop[None]
    rh = jnp.clip(qv / qs, 0.0, 1.0)
    xsav = (1.0 - rh) * qs
    suma = jnp.sum(jnp.where(lowcloud, xsav * ds3, 0.0), axis=0)
    sumb = jnp.sum(jnp.where(lowcloud, qs * ds3, 0.0), axis=0)
    arh = jnp.sum(jnp.where(lowcloud, rh * qs * ds3, 0.0), axis=0) \
        / jnp.maximum(sumb, 1e-10)
    c301 = jnp.clip(BFAC * (1.0 - arh), 0.0, 1.0)
    c301 = jnp.where(suma <= 0.0, 0.0, c301)
    suma = jnp.where(suma <= 0.0, 1.0, suma)
    qwght = jnp.where(lowcloud, xsav / suma[None], 0.0)

    # gather twght/vqflx for (kbase, ktop) per column
    def gather_tab(tab):
        flat = tab[:, kbase.ravel(), ktop.ravel()]
        return flat.reshape((kz,) + grid_shape)

    tw = gather_tab(twght)
    vq = gather_tab(vqflx)
    sca_p = jnp.maximum(sca, 0.0)
    ttconv = c.wlhvocp * (1.0 - c301[None]) * tw * sca_p[None]
    apcnt = (1.0 - c301[None]) * sca_p[None] / 4.3e-3
    eddyf = apcnt * vq
    qvten = jnp.where(incloud, c301[None] * qwght * sca_p[None] + eddyf,
                      0.0) / psx_cb[None]
    tten = jnp.where(incloud, ttconv, 0.0) / psx_cb[None]
    prate = jnp.maximum((1.0 - c301) * sca_p * 100.0 * c.regrav, 0.0)

    am = active[None]
    return KuoOut(tten=jnp.where(am, tten, 0.0),
                  qvten=jnp.where(am, qvten, 0.0),
                  prate=jnp.where(active, prate, 0.0),
                  kbase=kbase, ktop=ktop, active=active)
