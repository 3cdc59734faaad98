"""SUBEX resolved-scale precipitation + cloud fraction (ipptls=1).

Faithful jax port of the reference SUBEX scheme
(``Main/microlib/mod_micro_subex.F90:99-439``, Pal et al. 2000) and the
Sundqvist cloud fraction (``subex_cldfrac``,
``Main/cloudlib/mod_cloud_subex.F90:46-107``) plus the cloud
liquid-water/fraction combination of ``cldfrac``
(``Main/mod_micro_interface.F90:211-362``).

All arrays are (kz, iy, jx); the top-to-surface precipitation cascade is
a ``lax.scan`` over k (sequential in the vertical, batched over (y, x) —
columns stay on-chip, the TPU-native layout for the reference's
column-sequential loop).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c
from ...utils.thermo import pfwsat, wlh

REMFRC = 0.0
ACTCLD = 0.0
ACCRFRC = 0.5
PPTMIN = 0.0


def subex_cldfrac(t, p, qv, qc, rh, rh0, tc0=238.0, rhmin=0.01, rhmax=1.01):
    """Sundqvist (1989) large-scale cloud fraction
    (Main/cloudlib/mod_cloud_subex.F90:46-107)."""
    rhrng = jnp.clip(rh, rhmin, rhmax)
    rh0adj = jnp.where(t > tc0, rh0,
                       0.99999 - (1.0 - rh0) / (1.0 + 0.15 * (tc0 - t)))
    fcc = 1.0 - jnp.sqrt(jnp.clip((1.0 - rhrng)
                                  / jnp.maximum(1.0 - rh0adj, 1e-10),
                                  0.0, None))
    fcc = jnp.where(rhrng <= rh0adj, 0.0,
                    jnp.where(rhrng > 0.99999, 1.0, fcc))
    fcc = jnp.where(qc > 1.0e-7, fcc, 0.0)
    return jnp.clip(fcc, 0.0, 1.0)


def combine_clouds(fcc, qcn, rho, t, cldfra_cum, cldlwc_cum,
                   iconvlwp=0):
    """Combine large-scale + convective cloud for radiation (cldfrac,
    Main/mod_micro_interface.F90:296-362). Returns (cldlwc g/m3 in-cloud,
    cldfra)."""
    lowcld, hicld = 1.0e-4, 0.9999
    fcc = jnp.clip(fcc, 0.0, hicld)
    totc = jnp.where(qcn <= 1.0e-10, 0.0, qcn)
    # in-cloud LWC g/m3 with Liang (2005) CF scaling
    exlwc = jnp.where(fcc > lowcld,
                      totc * 1000.0 * rho / jnp.maximum(fcc, lowcld), 0.0)
    chi_s = 0.97 * jnp.exp(-((fcc - 0.098) ** 2) / 0.0365) + 0.255
    exlwc = jnp.where(fcc > lowcld, exlwc * chi_s, 0.0)
    has_cum = cldfra_cum > lowcld
    cldlwc = jnp.where(
        has_cum,
        (exlwc * fcc + cldlwc_cum * cldfra_cum)
        / jnp.maximum(cldfra_cum + fcc, lowcld),
        exlwc)
    cldfra = jnp.where(has_cum, jnp.maximum(cldfra_cum, fcc), fcc)
    cldfra = jnp.where(cldlwc > 0.0, jnp.clip(cldfra, 0.0, hicld), 0.0)
    return cldlwc, cldfra


class SubexOut(NamedTuple):
    tten: jax.Array      # coupled K/s·cb
    qvten: jax.Array
    qcten: jax.Array
    precip: jax.Array    # surface precipitation rate (kg/m2/s)
    # chemistry wet-removal diagnostics (ichem=1): in-cloud removal
    # rate remrat = pptnew/qcw (1/s, mod_micro_subex.F90:234,339) and
    # the Levin & Schwartz below-cloud rate rembc (mm/hr, :359-372)
    remrat: jax.Array
    rembc: jax.Array


def subex(t, phs, pfs, qvn, qcn, rh, rho, fcc, psb, dt,
          qck1, cgul, cevap, caccr, rhmax=1.01, rhmin=0.01) -> SubexOut:
    """SUBEX precipitation cascade (Main/microlib/mod_micro_subex.F90:99).

    Inputs decoupled (t K, q kg/kg, p Pa, rho kg/m3, fcc 0-1); psb (cb)
    couples the output tendencies like the reference (mc2mo%qxten ×psb).
    dt is the leapfrog dt.
    """
    kz = t.shape[0]
    # autoconversion threshold excess dqc (Gultepe & Isaac 1997)
    afc = fcc
    qcincl = qcn / jnp.maximum(afc, 1e-10)
    tcel = t - c.tzero
    qcth = cgul[None] * (10.0 ** (-0.48911 + 0.01344 * tcel)) * 1.0e-3
    dqc = jnp.where((qcn > c.minqc) & (afc > ACTCLD),
                    jnp.maximum(qcincl - qcth, 0.0), 0.0)

    dpovg = (pfs[1:] - pfs[:-1]) * c.regrav       # (kz, iy, jx) kg/m2
    qs = pfwsat(t, phs)
    wl = wlh(t)

    def layer(pptsum, k):
        # k is a traced index over 0..kz-1 (top → surface)
        afck = afc[k]
        qcw = qcn[k]
        dpg = dpovg[k]
        pptkm1 = jnp.where(pptsum > 0.0, pptsum / dpg, 0.0)
        # raindrop evaporation in clear fraction (layers below the top)
        dqv = (qs[k] - qvn[k]) / dt
        rhcs = (rh[k] - afck * rhmax) / jnp.maximum(1.0 - afck, 1e-10)
        rhcs = jnp.clip(rhcs, rhmin, rhmax)
        rdevap = cevap * (rhmax - rhcs) \
            * jnp.sqrt(jnp.maximum(pptsum, 0.0)) * (1.0 - afck)
        rdevap = jnp.minimum(jnp.minimum(rdevap, dqv), pptkm1)
        rdevap = jnp.where((k > 0) & (pptkm1 > PPTMIN) & (dqv > 0.0)
                           & (rdevap > c.dlowval), rdevap, 0.0)
        pptsum = jnp.maximum(pptsum - rdevap * dpg, 0.0)
        pptkm1 = pptkm1 - rdevap
        qvten_k = rdevap * psb
        tten_k = -wl[k] * c.rcpd * rdevap * psb
        # autoconversion + accretion
        pptmax = (1.0 - REMFRC) * qcw / dt
        pptnew = jnp.minimum(pptmax, qck1 * dqc[k] * afck)
        qcleft = jnp.maximum(qcw - pptnew * dt, 0.0)
        pptk = (pptkm1 + ACCRFRC * pptnew / jnp.maximum(afck, 1e-10)) \
            * rho[k] * dt
        pptacc = caccr * qcleft * pptk
        pptnew = jnp.minimum(pptmax, pptacc + pptnew)
        active = (qcw > c.minqc) & (afck > ACTCLD) & (pptnew > PPTMIN)
        pptnew = jnp.where(active, pptnew, 0.0)
        pptsum = pptsum + pptnew * dpg
        qcten_k = -pptnew * psb
        remrat_k = jnp.where(active, pptnew / jnp.maximum(qcw, 1e-30),
                             0.0)
        return pptsum, (tten_k, qvten_k, qcten_k, remrat_k)

    pptsum0 = jnp.zeros_like(psb)
    pptsum, (ttens, qvtens, qctens, remrat) = jax.lax.scan(
        layer, pptsum0, jnp.arange(kz))
    # below-cloud washout rate (mm/hr): rembc(k) = Σ_{kk<k} remrat(kk)
    # · qcw(k) · Δp(k)/g (mod_micro_subex.F90:359-372, ported verbatim
    # including the k-level qcw/Δp factors)
    crem = jnp.cumsum(remrat, axis=0) - remrat
    rembc = jnp.where(remrat > 0.0, crem * qcn * dpovg, 0.0)
    return SubexOut(tten=ttens, qvten=qvtens, qcten=qctens,
                    precip=pptsum, remrat=remrat, rembc=rembc)
