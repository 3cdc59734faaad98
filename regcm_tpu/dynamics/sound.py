"""MM5-type non-hydrostatic extensions (idynamic=2).

NHBaseState: the constant reference atmosphere ``atm0``
(``Share/mod_nhinterp.F90`` base state; referenceatm namelist
``base_state_pressure``/``logp_lrate``, Share/mod_dynparam.F90:476).

``sound``: the semi-implicit acoustic solver of ``Main/mod_sound.F90``
(``sound`` :163-718): ``istep = max(int(dt/dtsmax), 2)`` substeps of the
forward u/v update + Ikawa vertically-implicit (β=0.4 off-centered)
tridiagonal solve for w and pp, with the dp'/dt pressure-heating
correction to T and the built-in Asselin filtering of u/v/pp/w.

The per-column tridiagonal sweeps are lax.scans batched over (y, x);
acoustic substeps are a Python-unrolled static loop.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import constants as c
from .stencil import shift, shifte, cross2dot

XGAMMA = 1.0 / (1.0 - c.rovcp)       # cp/cv


class NHBaseState(NamedTuple):
    """atm0: time-constant NH reference atmosphere (all SI; ps0 in cb
    like the prognostic coupling)."""
    ps0: jax.Array      # reference p* = ps0_surface − ptop (cb), (iy,jx)
    psfull: jax.Array   # reference surface pressure (Pa)
    pr0: jax.Array      # reference pressure at half levels (Pa)
    pf0: jax.Array      # at interfaces (Pa), (kz+1,…)
    t0: jax.Array       # reference temperature (K)
    rho0: jax.Array     # reference density
    rhof0: jax.Array    # at interfaces
    dprddx: jax.Array   # 4-pt base-pressure x-difference at dot (Pa)
    dprddy: jax.Array
    dpsdxm: jax.Array   # (∂ps0/∂x)/(ps0·8dx·msfx) (1/m), (iy,jx)
    dpsdym: jax.Array


def make_base_state(grid, ptop_cb: float, base_ps_pa: float = 101325.0,
                    logp_lrate: float = 47.70, dtype=jnp.float64
                    ) -> NHBaseState:
    """Reference atmosphere on sigma levels (mod_nhinterp base state):
    T0(p) = stdt + logp_lrate·log(p/p00) capped at tiso; surface pressure
    from terrain via hydrostatic integration of that profile."""
    f = lambda x: jnp.asarray(x, dtype)
    ht = np.asarray(grid.ht)                      # geopotential
    z = ht / c.egrav
    # surface pressure of the reference profile at elevation z:
    # iterate p = p00·exp(−g z/(R·T̄)) with T̄ from the logp profile
    p = np.full(z.shape, base_ps_pa)
    for _ in range(8):
        t_here = np.maximum(c.stdt + logp_lrate * np.log(p / base_ps_pa),
                            c.tiso)
        tbar = 0.5 * (c.stdt + t_here)
        p = base_ps_pa * np.exp(-c.egrav * z / (c.rgas * tbar))
    psfull = p
    ps0 = (p - ptop_cb * 1000.0) / 1000.0        # p* in cb
    sig = grid.hsigma[:, None, None]
    sigf = grid.sigma[:, None, None]
    pr0 = sig * (psfull - ptop_cb * 1000.0)[None] + ptop_cb * 1000.0
    pf0 = sigf * (psfull - ptop_cb * 1000.0)[None] + ptop_cb * 1000.0
    t0 = np.maximum(c.stdt + logp_lrate * np.log(pr0 / base_ps_pa), c.tiso)
    t0f = np.maximum(c.stdt + logp_lrate * np.log(
        np.maximum(pf0, 100.0) / base_ps_pa), c.tiso)
    rho0 = pr0 / (c.rgas * t0)
    rhof0 = pf0 / (c.rgas * t0f)
    # dot-point 4-pt differences of pr0 (used vs the same pp stencil)
    a = pr0
    dprddx = (a + np.roll(a, 1, axis=1) - np.roll(a, 1, axis=2)
              - np.roll(np.roll(a, 1, axis=1), 1, axis=2))
    # fix wrap edges
    dprddx[:, :, 0] = 0.0
    dprddx[:, 0, :] = 0.0
    dprddy = (a + np.roll(a, 1, axis=2) - np.roll(a, 1, axis=1)
              - np.roll(np.roll(a, 1, axis=1), 1, axis=2))
    dprddy[:, :, 0] = 0.0
    dprddy[:, 0, :] = 0.0
    # dpsdxm/dpsdym (mod_params.F90:2640-2673): centered ps0 gradient
    # / (ps0·8dx·msfx)
    msfx = np.asarray(grid.msfx)
    dx8 = 8.0 * grid.ds
    ps_pa = psfull
    dpsdxm = (np.roll(ps_pa, -1, axis=1) - np.roll(ps_pa, 1, axis=1)) \
        / (ps_pa * dx8 * msfx)
    dpsdym = (np.roll(ps_pa, -1, axis=0) - np.roll(ps_pa, 1, axis=0)) \
        / (ps_pa * dx8 * msfx)
    dpsdxm[:, 0] = dpsdxm[:, -1] = 0.0
    dpsdym[0, :] = dpsdym[-1, :] = 0.0
    return NHBaseState(ps0=f(ps0), psfull=f(psfull), pr0=f(pr0),
                       pf0=f(pf0), t0=f(t0), rho0=f(rho0), rhof0=f(rhof0),
                       dprddx=f(dprddx), dprddy=f(dprddy),
                       dpsdxm=f(dpsdxm), dpsdym=f(dpsdym))


def sound(core, base: NHBaseState, s, uten, vten, ppten, wten,
          tdec_b, qv_b_dec, dt):
    """Acoustic substep integration (Main/mod_sound.F90:163-718).

    core: HydroCore (masks/metrics); s: HydroState (b-level inputs,
    a-level T modified in place via return); *ten: total long-step
    tendencies (coupled). Returns (u_c, v_c, pp_c, w_c, t_a_new, t_b_new)
    with the c-level fields COUPLED (×psdotb / ×psb) ready for the
    caller's Asselin filter.
    """
    kz = core.kz
    bet = core.cfg.nonhydro.nhbet
    xkd = core.cfg.nonhydro.nhxkd
    ifupr = int(core.cfg.nonhydro.ifupr)
    if ifupr == 1:
        # Klemp-Durran upper radiative BC geometry (init_sound,
        # Main/mod_sound.F90:103-140): trace-time constant tables;
        # the state-dependent tmask response is built per substep
        # (the reference refreshes it daily — computing it every call
        # is cheap here and strictly fresher).
        fi = np.ones(13)
        fi[0] = fi[12] = 0.5
        fk = np.full(7, 2.0)
        fk[0] = fk[6] = 1.0
        ii = np.arange(-6, 7)
        kkv = np.arange(7)
        geom = (fi[:, None, None, None] * fi[None, :, None, None]
                * fk[None, None, :, None] * fk[None, None, None, :]
                / 144.0
                * np.cos(2.0 * np.pi * kkv[None, None, :, None]
                         * ii[:, None, None, None] / 12.0)
                * np.cos(2.0 * np.pi * kkv[None, None, None, :]
                         * ii[None, :, None, None] / 12.0))
        xmsf = float(np.mean(np.asarray(core.grid.msfx)[1:-1, 1:-1]))
        dxmsfb = 2.0 / (core.dx * core.dx) / xmsf
        xkeff = dxmsfb * np.sin(np.pi * kkv[:, None] / 12.0) \
            * np.cos(np.pi * kkv[None, :] / 12.0)
        xleff = dxmsfb * np.sin(np.pi * kkv[None, :] / 12.0) \
            * np.cos(np.pi * kkv[:, None] / 12.0)
        xkleff = jnp.asarray(np.sqrt(xkeff ** 2 + xleff ** 2),
                             s.ps_b.dtype)
        uprgeom = jnp.asarray(geom, s.ps_b.dtype)
    bp = 0.5 * (1.0 + bet)
    bm = 0.5 * (1.0 - bet)
    bpxbp = bp * bp
    bpxbm = bp * bm
    cs = float(np.sqrt(XGAMMA * c.rgas * 300.0))
    dtsmax = core.dx / cs / (1.0 + xkd)
    istep = max(int(core.dtsec * 2.0 / dtsmax), 4)
    dts = dt / istep

    psb = s.ps_b
    rpsb = 1.0 / psb
    psdotb = cross2dot(psb)
    m_ci = core.m_ci
    m_di = core.m_di
    msfd = core.msfd
    msfx = core.msfx
    dsig = core.dsig3
    pr0 = base.pr0
    rho0 = base.rho0
    t0 = base.t0
    ps0pa = base.psfull - core.ptop * 1000.0     # reference p* in Pa

    # decoupled short-step prognostics
    u = s.u_b / psdotb[None]
    v = s.v_b / psdotb[None]
    pp = s.pp_b * rpsb[None]
    w = s.w_b * rpsb[None]
    qvd = s.qx_b[0] * rpsb[None]
    t_a = s.t_a
    t_b = s.t_b
    # actual pressure/density at time level 1 (atm1 via b here)
    pr1 = pr0 + pp * 1.0
    tv1 = jnp.maximum(tdec_b, 100.0) * (1.0 + c.ep1 * qv_b_dec)
    rho1 = pr1 / (c.rgas * tv1)

    uten_d = uten * dts
    vten_d = vten * dts
    ppten_d = ppten * rpsb[None] * dts
    wten_d = wten * rpsb[None] * dts

    pi_corr = jnp.zeros_like(pp)

    for it in range(istep):
        pp_eff = pp + (xkd * pi_corr if it > 0 else 0.0)
        # dpp/dp0 proxy (atmc%t in the reference, :263-269)
        pp_up = jnp.concatenate([pp_eff[:1], pp_eff[:-1]], axis=0)
        pp_dn = jnp.concatenate([pp_eff[1:], pp_eff[-1:]], axis=0)
        p0_up = jnp.concatenate([pr0[:1], pr0[:-1]], axis=0)
        p0_dn = jnp.concatenate([pr0[1:], pr0[-1:]], axis=0)
        dppdp0 = (pp_up - pp_dn) / (p0_up - p0_dn)

        # advance u, v (:276-311)
        rho_d = 0.25 * (rho1 + shift(rho1, 0, -1) + shift(rho1, -1, 0)
                        + shift(rho1, -1, -1))
        dppdp0_d = 0.25 * (dppdp0 + shift(dppdp0, 0, -1)
                           + shift(dppdp0, -1, 0) + shift(dppdp0, -1, -1))
        chh = 0.5 * dts / (jnp.maximum(rho_d, 1e-3) * core.dx) \
            / msfd[None]
        dppx = (pp_eff + shift(pp_eff, -1, 0) - shift(pp_eff, 0, -1)
                - shift(pp_eff, -1, -1))
        dppy = (pp_eff + shift(pp_eff, 0, -1) - shift(pp_eff, -1, 0)
                - shift(pp_eff, -1, -1))
        u = u + (-chh * (dppx - base.dprddx * dppdp0_d)
                 + uten_d / psdotb[None]) * m_di
        v = v + (-chh * (dppy - base.dprddy * dppdp0_d)
                 + vten_d / psdotb[None]) * m_di

        # divergence-driven pp tendency (:340-440)
        vmsf = v * msfd[None]
        umsf = u * msfd[None]
        divd = ((shift(vmsf, 1, 1) + shift(vmsf, 1, 0)
                 - shift(vmsf, 0, 1) - vmsf)
                + (shift(umsf, 1, 1) + shift(umsf, 0, 1)
                   - shift(umsf, 1, 0) - umsf)) / msfx[None]
        cc = XGAMMA * pr1 * dts / (core.dx * msfx[None])
        cdd = XGAMMA * pr1 * rho0 * c.egrav * dts / (ps0pa[None] * dsig)
        cj = 0.5 * rho0 * c.egrav * dts
        # slant-flow terms pxup/pyvp (:352-415): base-pressure slope ×
        # vertical wind shear — interior approximation
        u4 = u + shift(u, 0, 1) + shift(u, 1, 0) + shift(u, 1, 1)
        v4 = v + shift(v, 0, 1) + shift(v, 1, 0) + shift(v, 1, 1)
        dp0x = shift(pr0, 0, 1) - shift(pr0, 0, -1)
        dp0y = shift(pr0, 1, 0) - shift(pr0, -1, 0)
        u4_up = jnp.concatenate([u4[:1], u4[:-1]], axis=0)
        u4_dn = jnp.concatenate([u4[1:], u4[-1:]], axis=0)
        v4_up = jnp.concatenate([v4[:1], v4[:-1]], axis=0)
        v4_dn = jnp.concatenate([v4[1:], v4[-1:]], axis=0)
        pxup = 0.125 * dp0x * (u4_up - u4_dn) / (p0_up - p0_dn)
        pyvp = 0.125 * dp0y * (v4_up - v4_dn) / (p0_up - p0_dn)
        ptend = ppten_d - 0.5 * cc * (divd - 2.0 * (pxup + pyvp))

        # implicit w (Ikawa; :380-470): interfaces K=1..kz-1
        tk = (0.5 * ps0pa[None] * t0) / (XGAMMA * pr0
                                         * jnp.maximum(tdec_b, 100.0))
        rhof0 = base.rhof0
        dsig_up = jnp.concatenate([dsig[:1], dsig[:-1]], axis=0)
        rofac_i = (dsig[:-1] * rho0[1:] + dsig[1:] * rho0[:-1]) \
            / (dsig[:-1] * rho1[1:] + dsig[1:] * rho1[:-1])
        ca = c.egrav * dts / (pr0[1:] - pr0[:-1]) * rofac_i
        g1 = 1.0 - dsig[:-1] * tk[1:]
        g2 = 1.0 + dsig[1:] * tk[:-1]
        cdd_up = cdd[:-1]
        cdd_dn = cdd[1:]
        cj_up = cj[:-1]
        cj_dn = cj[1:]
        Cm = -ca * (cdd_up - cj_up) * g2 * bpxbp           # couples w[K-1]
        Bm = 1.0 + ca * (g1 * (cdd_dn - cj_dn)
                         + g2 * (cdd_up + cj_up)) * bpxbp
        Am = -ca * (cdd_dn + cj_dn) * g1 * bpxbp           # couples w[K+1]
        wo = w
        rhs = (w[1:kz] + wten_d[1:kz]
               + ca * (bpxbm * ((cdd_up - cj_up) * g2 * wo[:kz - 1]
                                - ((cdd_up + cj_up) * g2
                                   + (cdd_dn - cj_dn) * g1) * wo[1:kz]
                                + (cdd_dn + cj_dn) * g1 * wo[2:])
                       + (pp[1:] * g1 - pp[:-1] * g2)
                       + (g1 * ptend[1:] - g2 * ptend[:-1]) * bp))
        # explicit pp partial update (:457-466)
        pi_old = pp
        pp = pp + ptend + (cj * (wo[1:] + wo[:-1])
                           + cdd * (wo[1:] - wo[:-1])) * bm

        # surface w from terrain flow (:330-340)
        u4k = (u[kz - 1] + shift(u[kz - 1], 0, 1) + shift(u[kz - 1], 1, 0)
               + shift(u[kz - 1], 1, 1))
        v4k = (v[kz - 1] + shift(v[kz - 1], 0, 1) + shift(v[kz - 1], 1, 0)
               + shift(v[kz - 1], 1, 1))
        dhx = shift(core.ht, 0, 1) - shift(core.ht, 0, -1)
        dhy = shift(core.ht, 1, 0) - shift(core.ht, -1, 0)
        w_sfc = 0.5 * 0.25 * c.regrav * (v4k * dhy + u4k * dhx) \
            / (core.dx * msfx)

        # tridiagonal sweep: upward coefficients (:470-480) then downward
        def up_body(carry, K):
            e_k, f_k = carry
            i = K - 1
            denom = Am[i] * e_k + Bm[i]
            e_km1 = -Cm[i] / denom
            f_km1 = (rhs[i] - f_k * Am[i]) / denom
            return (e_km1, f_km1), (e_km1, f_km1)

        e_kz = jnp.zeros_like(w_sfc)
        f_kz = w_sfc
        (_, _), (e_r, f_r) = jax.lax.scan(
            up_body, (e_kz, f_kz), jnp.arange(kz - 1, 0, -1))
        # e_r/f_r correspond to K-1 = kz-2 .. 0 → e[k] for k=0..kz-2
        e = jnp.concatenate([jnp.flip(e_r, 0), e_kz[None]], axis=0)
        fe = jnp.concatenate([jnp.flip(f_r, 0), f_kz[None]], axis=0)

        # top boundary: w[0]=0 rigid lid (ifupr=0) or the Klemp-Durran
        # radiative condition (ifupr=1, mod_sound.F90:486-562): a
        # 13×13 spectral-response convolution of the top-level
        # estore field with global-mean response coefficients
        if ifupr == 1:
            denom1 = (cdd[0] + cj[0]) * bp
            estore = (pp[0] + fe[0] * denom1) * m_ci
            astore = denom1 * e[0] + (cj[0] - cdd[0]) * bp
            npts = jnp.maximum(jnp.sum(m_ci), 1.0)
            abar = jnp.sum(astore * m_ci) / npts
            ensq = c.egrav * c.egrav / c.cpd \
                / jnp.maximum(tdec_b[0], 100.0)
            rhon = jnp.sum(rho1[0] * jnp.sqrt(ensq) * m_ci) / npts
            resp = xkleff / (rhon - abar * xkleff)
            tmask = jnp.einsum("ijkl,kl->ij", uprgeom, resp)
            ep = jnp.pad(estore, 6, mode="edge")
            w_top = jax.lax.conv_general_dilated(
                ep[None, None], tmask[None, None],
                window_strides=(1, 1), padding="VALID")[0, 0] * m_ci
        else:
            w_top = jnp.zeros_like(w_sfc)

        def dn_body(w_k, k):
            w_kp1 = e[k] * w_k + fe[k]
            return w_kp1, w_kp1

        _, w_dn = jax.lax.scan(dn_body, w_top, jnp.arange(kz))
        w = jnp.concatenate([w_top[None], w_dn], axis=0)

        # new pressure (:640-668) + dp'/dt temperature correction
        ppold = pi_old
        dpp = (cj * (w[1:] + w[:-1]) + cdd * (w[1:] - w[:-1])) * bp
        pp = pp + dpp
        pi_corr = pp - ppold - ppten_d
        from .hydrostatic import cpmf
        cpm = cpmf(jnp.maximum(qvd, 0.0))
        dpterm = psb[None] * (pp - ppold) / (cpm * rho1)
        t_b = t_b + core.gnu1 * dpterm * m_ci
        t_a = t_a + dpterm * m_ci

    u_c = u * psdotb[None]
    v_c = v * psdotb[None]
    pp_c = pp * psb[None]
    w_c = jnp.where(jnp.abs(w) < c.dlowval, 0.0, w) * psb[None]
    return u_c, v_c, pp_c, w_c, t_a, t_b
