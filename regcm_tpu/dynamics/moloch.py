"""MOLOCH non-hydrostatic dynamical core (idynamic=3).

Faithful jax re-implementation of ``Main/mod_moloch.F90`` (``moloch``
:224, ``sound`` :708, ``advection``/``wafone`` :1042-1361) with the zita
terrain-following height coordinate of ``Share/mod_zita.F90`` (decay /
stretching maps ``gzita``/``bzita``, metric ``md_fmz``).

Grid: Arakawa-C — u at x-faces, v at y-faces, w/s at zita interfaces,
scalars (θv, π, T, qx) at centers. Prognostics are NOT mass-coupled
(unlike the hydrostatic core): u, v, w in m/s, pai = Exner function,
t = temperature, qx mixing ratios.

Time scheme: forward-backward with ``nsound`` implicit-vertical acoustic
substeps nested in ``nadv`` WAF advection substeps per model step
(mod_moloch.F90:313-317). The implicit w solve is an Euler-backward
tridiagonal per column — two lax.scans over interfaces batched on the
whole (y, x) plane, columns resident on-chip (the TPU-native layout).

This is the 3 km convection-permitting performance target of SURVEY §7;
stencils are pad/slice ops so GSPMD shards it over the (y, x) mesh.
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import ModelGrid
from ..config.params import RegCMConfig
from ..utils import constants as c
from ..utils.thermo import pfwsat
from .stencil import shift, shifte

T0_ZITA = 280.0
HZITA = c.rgas * T0_ZITA / c.egrav          # Share/mod_zita.F90:32


def gzita(z, a0=0.0):
    r = z / HZITA
    return 1.0 - a0 * r - (3.0 - 2.0 * a0) * r ** 2 + (2.0 - a0) * r ** 3


def gzitap(z, a0=0.0):
    r = z / HZITA
    return (-a0 - (6.0 - 4.0 * a0) * r + (6.0 - 3.0 * a0) * r ** 2) / HZITA


def bzita(z, b0=0.0):
    return b0 + (1.0 - b0) * (z / HZITA)


def bzitap(z, b0=0.0):
    return (1.0 - b0) / HZITA


def md_fmz_h(z, orog, a0=0.0, b0=0.0):
    """Vertical metric factor (Share/mod_zita.F90 md_fmz, Equation 9)."""
    zfz = 1.0 - z / HZITA
    return zfz / (bzita(z, b0) + orog * zfz * gzitap(z, a0)
                  - HZITA * zfz * np.log(np.maximum(zfz, 1e-12))
                  * bzitap(z, b0))


def md_zeta_h(z, orog, a0=0.0, b0=0.0):
    """Height above orography (Equation 7)."""
    zfz = np.maximum(1.0 - z / HZITA, 1e-12)
    return np.maximum(orog * gzita(z, a0) - HZITA * bzita(z, b0)
                      * np.log(zfz) - orog, 0.0)


class MolochState(NamedTuple):
    u: jax.Array       # (kz, iy, jx) at u-faces (west face of cross)
    v: jax.Array       # (kz, iy, jx) at v-faces (south face)
    w: jax.Array       # (kz+1, iy, jx) at interfaces (0=top, kz=surface)
    pai: jax.Array     # Exner function at centers
    t: jax.Array       # temperature at centers
    qx: jax.Array      # (nqx, kz, iy, jx) mixing ratios


class MolochCore:
    """MOLOCH integration engine (compile-time constants + pure step)."""

    def __init__(self, grid: ModelGrid, cfg: RegCMConfig,
                 dtype=jnp.float64):
        self.grid = grid
        self.cfg = cfg
        self.dtype = dtype
        f = lambda x: jnp.asarray(x, dtype)
        g = grid
        kz, iy, jx = g.kz, g.iy, g.jx
        self.kz, self.iy, self.jx = kz, iy, jx
        self.dx = float(g.ds)
        self.dtsec = cfg.dtsec
        self.nadv = cfg.moloch.mo_nadv
        self.nsound = cfg.moloch.mo_nsound
        self.a0 = cfg.moloch.mo_a0
        self.b0 = cfg.moloch.mo_b0
        self.dz = HZITA / kz                 # mo_dz (mod_params.F90:1169)

        # vertical coordinate (mod_params.F90:2802-2813): zita(k) bottom=0
        # index 0 = top interface (zita = kz·dz), index kz = surface (0)
        zitaf = np.array([(kz - k) * self.dz for k in range(kz + 1)])
        zitah = zitaf[1:] + 0.5 * self.dz    # centers (0=top layer)
        self.zitaf = zitaf
        self.zitah = zitah
        ht = np.asarray(g.ht)                # geopotential g·z
        orog = ht / c.egrav
        # metric factors (kz, iy, jx) at centers; (kz+1) at interfaces
        self.fmz = f(np.stack([md_fmz_h(zitah[k], orog, self.a0, self.b0)
                               for k in range(kz)]))
        fmzf = np.stack([md_fmz_h(zitaf[k], orog, self.a0, self.b0)
                         for k in range(kz + 1)])
        fmzf[0] = 0.0                        # mod_params: fmzf(:,:,1)=0
        self.fmzf = f(fmzf)
        # heights above orography at centers/interfaces
        self.zeta = f(np.stack([md_zeta_h(zitah[k], orog, self.a0, self.b0)
                                for k in range(kz)]))
        zetaf = np.stack([md_zeta_h(zitaf[k], orog, self.a0, self.b0)
                          for k in range(kz + 1)])
        zetaf[0] = 48446.4
        self.zetaf = f(zetaf)
        self.gzitak = f(gzita(zitaf, self.a0))       # (kz+1,)
        self.gzitakh = f(gzita(zitah, self.a0))      # (kz,)

        # acoustic vertical filter (mod_init.F90:999-1012), interface idx
        mo_nzfilt = int(cfg.moloch.extras.get("mo_nzfilt", 10))
        ffilt = np.zeros(kz + 1)
        if mo_nzfilt > 0:
            ntop = int(0.08 * kz)
            zfilt = (kz + 1 - ntop + mo_nzfilt) * self.dz
            for k in range(1, kz):           # 1-based k → interface k
                if k + 1 > ntop + mo_nzfilt - 1:
                    ffilt[k] = 0.0
                else:
                    zzi = (self.dz * (kz + 1 - (k + 1)) - zfilt) \
                        / (HZITA - zfilt)
                    ffilt[k] = 0.8 * math.sin(0.5 * math.pi * zzi) ** 2
        self.ffilt = f(ffilt)

        # horizontal metrics: msfu/msfv ≈ map factor at faces; terrain
        # slopes hx/hy (mod_params.F90:2762-2776)
        msfx = np.asarray(g.msfx)
        msfu = 0.5 * (msfx + np.roll(msfx, 1, axis=1))   # west face
        msfv = 0.5 * (msfx + np.roll(msfx, 1, axis=0))   # south face
        self.mx = f(msfx)
        self.mx2 = f(msfx * msfx)
        self.rmu = f(1.0 / msfu)
        self.rmv = f(1.0 / msfv)
        self.mu = f(msfu)
        self.mv = f(msfv)
        rdx = 1.0 / self.dx
        hx = (ht - np.roll(ht, 1, axis=1)) * msfu * rdx * c.regrav
        hy = (ht - np.roll(ht, 1, axis=0)) * msfv * rdx * c.regrav
        hx[:, 0] = hx[:, 1]
        hy[0, :] = hy[1, :]
        self.hx = f(hx)
        self.hy = f(hy)
        lat = np.asarray(g.xlat)
        self.coriou = f(2.0 * c.eomeg * np.sin(
            0.5 * (lat + np.roll(lat, 1, axis=1)) * c.degrad))
        self.coriov = f(2.0 * c.eomeg * np.sin(
            0.5 * (lat + np.roll(lat, 1, axis=0)) * c.degrad))
        self.ht = f(ht)

        # masks (cross grid interior semantics like the hydrostatic core)
        self.m_c = f(g.m_cross)
        self.m_ci = f(g.m_cross_int)
        # C-grid face-interior masks (sound momentum loops jdii/idii,
        # mod_moloch.F90:947-1035): u faces x∈[2,jx-3], y∈[1,iy-3];
        # v faces y∈[2,iy-3], x∈[1,jx-3] (0-based)
        mu_m = np.zeros((iy, jx)); mu_m[1:iy - 2, 2:jx - 2] = 1.0
        mv_m = np.zeros((iy, jx)); mv_m[2:iy - 2, 1:jx - 2] = 1.0
        self.m_u = f(mu_m)
        self.m_v = f(mv_m)
        # nudging maps (iboudy coefficients scaled ×nadv·nsound,
        # setup_bdycon Main/mod_bdycod.F90:215-219)
        scl = float(self.nadv * self.nsound)
        self.nfc = f(g.nudge_fc) * scl
        self.ngc = f(g.nudge_gc) * scl

        self.nupait = 1.0 / self.nadv
        self.nuwind = 1.0 / self.nsound

    # ------------------------------------------------------------------
    def initial_state(self, perturb=0.0, bubble=None, seed=0
                      ) -> MolochState:
        """Hydrostatically balanced standard atmosphere on zita levels.

        bubble: optional (amp_K, y0, x0, rad_m, zc_m) warm bubble for the
        classic NH rising-thermal test."""
        kz, iy, jx = self.kz, self.iy, self.jx
        zc = np.asarray(self.zeta) + np.asarray(self.ht)[None] * c.regrav
        t = np.maximum(c.stdt - c.lrate * zc, 216.65)
        # analytic hydrostatic Exner for the standard atmosphere:
        # T = T0 − Γz → π = π0·(1 − Γz/T0)^(g/(cp·Γ)); isothermal above
        # the tropopause → π = π_t·exp(−g(z−z_t)/(cp·T_iso))
        pex = c.egrav / (c.cpd * c.lrate)
        pai0 = (101325.0 / c.stdp) ** c.rovcp
        ztrop = (c.stdt - 216.65) / c.lrate
        pai_trop = pai0 * (216.65 / c.stdt) ** pex
        pai = np.where(zc <= ztrop,
                       pai0 * (1.0 - c.lrate * zc / c.stdt) ** pex,
                       pai_trop * np.exp(-c.egrav * (zc - ztrop)
                                         / (c.cpd * 216.65)))
        # enforce DISCRETE hydrostatic balance of the sound solver:
        # pai[K-1] = pai[K] − g·dz/(cp·fmzf[K]·½(θv[K-1]+θv[K]))
        # (rest state must have zero residual in the implicit w equation)
        tv = t  # dry init; qv added after balance (small imbalance ok? no:)
        fmzf = np.asarray(self.fmzf)
        for K in range(kz - 1, 0, -1):
            x = pai[K - 1].copy()
            for _ in range(8):
                thf = 0.5 * (tv[K - 1] / x + tv[K] / pai[K])
                x = pai[K] - c.egrav * self.dz / (c.cpd * fmzf[K] * thf)
            pai[K - 1] = x
        if bubble is not None:
            amp, y0, x0, rad, zcb = bubble
            yy = np.arange(iy)[None, :, None]
            xx = np.arange(jx)[None, None, :]
            dist = np.sqrt(((yy - y0) * self.dx) ** 2
                           + ((xx - x0) * self.dx) ** 2
                           + ((zc - zcb) * 6.0) ** 2)
            t = t + amp * np.maximum(1.0 - dist / rad, 0.0)
        if perturb > 0.0:
            rng = np.random.default_rng(seed)
            t = t + perturb * rng.standard_normal(t.shape) \
                * np.asarray(self.grid.m_cross_int)[None]
        qv = 0.4 * np.asarray(pfwsat(
            jnp.asarray(t), jnp.asarray(pai ** c.cpovr * c.stdp)))
        qv = np.minimum(qv, 0.012)
        f = lambda x: jnp.asarray(x, self.dtype)
        z3 = jnp.zeros((kz, iy, jx), self.dtype)
        qx = jnp.stack([f(qv), jnp.zeros_like(f(qv))])
        return MolochState(u=z3, v=z3,
                           w=jnp.zeros((kz + 1, iy, jx), self.dtype),
                           pai=f(pai), t=f(t), qx=qx)

    # ------------------------------------------------------------------
    def _sound(self, u, v, w, pai, tetav, qv, qsat, dts):
        """One acoustic substep sequence ×nsound (sound,
        mod_moloch.F90:708-1040)."""
        kz = self.kz
        dtrdx = dts / self.dx
        dtrdz = dts / self.dz
        zcs2 = dtrdz ** 2 * c.rdrcv

        for jsound in range(1, self.nsound + 1):
            # surface w from terrain-following flow (:744-755)
            zuh = u[kz - 1] * self.hx + shift(u[kz - 1], 0, 1) \
                * shift(self.hx, 0, 1)
            zvh = v[kz - 1] * self.hy + shift(v[kz - 1], 1, 0) \
                * shift(self.hy, 1, 0)
            w_sfc = 0.5 * (zuh + zvh)
            w = w.at[kz].set(w_sfc)
            # partial generalized vertical velocity s (Equation 10)
            zuh_i = ((u[1:] + u[:-1]) * self.hx[None]
                     + (shift(u[1:], 0, 1) + shift(u[:-1], 0, 1))
                     * shift(self.hx, 0, 1)[None])
            zvh_i = ((v[1:] + v[:-1]) * self.hy[None]
                     + (shift(v[1:], 1, 0) + shift(v[:-1], 1, 0))
                     * shift(self.hy, 1, 0)[None])
            s_int = -0.25 * (zuh_i + zvh_i) * self.gzitak[1:kz, None, None]
            s = jnp.concatenate(
                [jnp.zeros_like(w[:1]), s_int, -w_sfc[None]], axis=0)

            # horizontal divergence (Equation 16, :800-830)
            favg = lambda a, dy, dx_: 2.0 / (a + shifte(a, dy, dx_))
            zum = u * self.rmu[None] * favg(self.fmz, 0, -1)
            zup = shift(u, 0, 1) * shift(self.rmu, 0, 1)[None] \
                * 2.0 / (self.fmz + shifte(self.fmz, 0, 1))
            zvm = v * self.rmv[None] * favg(self.fmz, -1, 0)
            zvp = shift(v, 1, 0) * shift(self.rmv, 1, 0)[None] \
                * 2.0 / (self.fmz + shifte(self.fmz, 1, 0))
            zdiv2 = ((zup - zum) + (zvp - zvm)) * dtrdx
            # filt3d smoother (:515-530 filtpai analogue): 4-pt laplacian
            lap = 0.125 * (shift(zdiv2, 0, -1) + shift(zdiv2, 0, 1)
                           + shift(zdiv2, -1, 0) + shift(zdiv2, 1, 0)) \
                - 0.5 * zdiv2
            zdiv2 = zdiv2 + lap * self.m_ci[None] * 0.0  # filt3d adds to
            # div via p2d only in filtpai; keep exact: no smoothing here
            zdiv2 = self.fmz * (self.mx2[None] * zdiv2
                                + dtrdz * (s[:kz] - s[1:]))

            # implicit w (Equation 19, :838-905): tridiagonal per column
            th_abv = tetav[:-1]                 # θv at center above iface K
            th_blw = tetav[1:]
            fmzf_i = self.fmzf[1:kz]
            rom1w = 0.5 * c.cpd * fmzf_i * (th_abv + th_blw) \
                - c.cpd * w[1:kz] * fmzf_i ** 2 * float(jsound) * dtrdz \
                * (th_abv - th_blw)
            wexpl = w[1:kz] - rom1w * dtrdz * (pai[:-1] - pai[1:]) \
                - c.egrav * dts \
                + c.rdrcv * rom1w * dtrdz * (pai[:-1] * zdiv2[:-1]
                                             - pai[1:] * zdiv2[1:])
            zp = zcs2 * self.fmz[:-1] * rom1w * pai[:-1] \
                + self.ffilt[1:kz, None, None]
            zm = zcs2 * self.fmz[1:] * rom1w * pai[1:] \
                + self.ffilt[1:kz, None, None]

            w_old = w
            # upward sweep: K = kz-1 .. 1 (0-based interfaces)
            def up_body(carry, K):
                w_kp1, wwkw_kp1 = carry
                i = K - 1                       # index into (kz-1) arrays
                zrapp = 1.0 / (1.0 + zm[i] + zp[i] - zm[i] * wwkw_kp1)
                w_k = zrapp * (wexpl[i] + zm[i] * w_kp1)
                wwkw_k = zrapp * zp[i]
                return (w_k, wwkw_k), (w_k, wwkw_k)

            init = (w[kz], jnp.zeros_like(w[kz]))
            _, (w_prov_r, wwkw_r) = jax.lax.scan(
                up_body, init, jnp.arange(kz - 1, 0, -1))
            w_prov = jnp.flip(w_prov_r, axis=0)   # interfaces 1..kz-1
            wwkw = jnp.flip(wwkw_r, axis=0)

            # downward sweep: w[K] += wwkw[K]·w[K-1], w[0]=0
            def dn_body(w_km1, i):
                w_k = w_prov[i] + wwkw[i] * w_km1
                return w_k, w_k

            _, w_new_int = jax.lax.scan(
                dn_body, jnp.zeros_like(w[0]), jnp.arange(kz - 1))
            w = jnp.concatenate(
                [jnp.zeros_like(w[:1]), w_new_int, w[kz:]], axis=0)
            deltaw = w - w_old
            deltaw = deltaw.at[kz].set(0.0)

            # new Exner (Equation 19, :920-940)
            zdiv2 = zdiv2 + dtrdz * self.fmz * (w[:kz] - w[1:])
            pai = jnp.where(self.m_ci[None] > 0.5,
                            pai * (1.0 - c.rdrcv * zdiv2), pai)

            # horizontal momentum (Equations 17/18, :947-1035)
            dwc = deltaw[:kz] + deltaw[1:]       # (kz,…) center sum w,k+1
            zfz_u = 0.25 * (shift(dwc, 0, -1) + dwc) + c.egrav * dts
            rom1u = 0.5 * c.cpd * (shift(tetav, 0, -1) + tetav)
            vd4 = 0.25 * (v + shift(v, 0, -1) + shift(v, 1, 0)
                          + shift(v, 1, -1))
            du = (self.coriou[None] * vd4 * dts
                  - zfz_u * self.hx[None] * self.gzitakh[:, None, None]
                  - dtrdx * self.mu[None] * rom1u
                  * (pai - shift(pai, 0, -1)))
            u = u + du * self.m_u
            zfz_v = 0.25 * (shift(dwc, -1, 0) + dwc) + c.egrav * dts
            rom1v = 0.5 * c.cpd * (shift(tetav, -1, 0) + tetav)
            ud4 = 0.25 * (u + shift(u, 0, 1) + shift(u, -1, 0)
                          + shift(u, -1, 1))
            dv = (-self.coriov[None] * ud4 * dts
                  - zfz_v * self.hy[None] * self.gzitakh[:, None, None]
                  - dtrdx * self.mv[None] * rom1v
                  * (pai - shift(pai, -1, 0)))
            v = v + dv * self.m_v

        # complete generalized vertical velocity (:1040-1060)
        s_fin_int = (w[1:kz] + s[1:kz]) * self.fmzf[1:kz]
        s = jnp.concatenate([jnp.zeros_like(w[:1]), s_fin_int,
                             jnp.zeros_like(w[:1])], axis=0)
        return u, v, w, pai, s

    # ------------------------------------------------------------------
    def _waf_limiter(self, amu, f_up2, f_up1, f_c, f_d):
        """WAF/superbee flux weight (wafone limiter,
        mod_moloch.F90:1120-1135): returns zphi."""
        is_ = jnp.sign(amu)
        is_ = jnp.where(is_ == 0.0, 1.0, is_)
        den = f_c - f_d
        r = (f_up1 - f_up2) / jnp.where(
            jnp.abs(den) < 1e-15, jnp.sign(den) * 1e-15 + 1e-30, den)
        b = jnp.maximum(0.0, jnp.minimum(
            2.0, jnp.maximum(r, jnp.minimum(2.0 * r, 1.0))))
        return is_ + amu * b - is_ * b

    def _wafone(self, pp, u, v, s, dta):
        """One WAF advection pass (vertical→meridional→zonal),
        mod_moloch.F90:1098-1361."""
        kz = self.kz
        dtrdx = dta / self.dx
        dtrdz = dta / self.dz
        fmz = self.fmz

        # ---- vertical (interfaces K=1..kz-1, 0-based; between layer
        #      K-1 above and K below) — wafone :1115-1160 ----------------
        amu = s[1:kz] * dtrdz
        above = pp[:-1]                                        # pp0[K-1]
        below = pp[1:]                                         # pp0[K]
        below2 = jnp.concatenate([pp[2:], pp[-1:]], axis=0)    # pp0[K+1]
        above2 = jnp.concatenate([pp[:1], pp[:-2]], axis=0)    # pp0[K-2]
        pos = amu >= 0.0
        f1 = jnp.where(pos, below, above2)
        f2 = jnp.where(pos, below2, above)
        zphi = self._waf_limiter(amu, f2, f1, above, below)
        wfw = 0.5 * s[1:kz] * ((1.0 + zphi) * below + (1.0 - zphi) * above)
        zwf = jnp.concatenate(
            [jnp.zeros_like(wfw[:1]), wfw, jnp.zeros_like(wfw[:1])],
            axis=0)                          # (kz+1,…) interface fluxes
        # layer update: wz[L] = pp[L] − wfw0[L]·rp + wfw0[L+1]·rm + zdv
        # rm = dtrdz·fmz[L]/fmzf0[L+1], rp = dtrdz·fmz[L]/fmzf0[L]
        fmzf_abv = self.fmzf[:kz]            # fmzf0[L] (0 at L=0)
        fmzf_blw = self.fmzf[1:]             # fmzf0[L+1]
        rfm_m = dtrdz * fmz / fmzf_blw
        rfm_p = dtrdz * fmz / jnp.where(fmzf_abv == 0.0, 1.0, fmzf_abv)
        rfm_p = rfm_p.at[0].set(0.0)         # top layer: no upper flux
        zdv = (s[:kz] * rfm_p - s[1:] * rfm_m) * pp
        wz = pp - zwf[:kz] * rfm_p + zwf[1:] * rfm_m + zdv
        # edge rows copy interior (:1166-1180)
        wz = wz.at[:, 0, :].set(wz[:, 1, :])
        wz = wz.at[:, -2:, :].set(wz[:, -3:-2, :])

        # ---- meridional (:1278-1310) -----------------------------------
        vm = v * self.rmv[None]
        amu = vm * dtrdx
        wz_m1 = shift(wz, -1, 0, )          # wz(i-1)
        wz_m2 = shift(wz, -2, 0)
        wz_p1 = shift(wz, 1, 0)
        pos = amu > 0.0
        f1 = jnp.where(pos, wz_m1, wz_p1)
        f2 = jnp.where(pos, wz_m2, wz)
        zphi = self._waf_limiter(amu, f2, f1, wz, wz_m1)
        zpby = 0.5 * vm * ((1.0 + zphi) * wz_m1 + (1.0 - zphi) * wz)
        rfmn = dtrdx * 2.0 * fmz / (fmz + shifte(fmz, 1, 0))
        rfms = dtrdx * 2.0 * fmz / (fmz + shifte(fmz, -1, 0))
        vmn = shift(v, 1, 0) * shift(self.rmv, 1, 0)[None]
        zdv = (vmn * rfmn - vm * rfms) * pp
        p0 = wz + self.mx2[None] * (zpby * rfms - shift(zpby, 1, 0) * rfmn
                                    + zdv)
        p0 = p0.at[:, :, 0].set(p0[:, :, 1])
        p0 = p0.at[:, :, -2:].set(p0[:, :, -3:-2])

        # ---- zonal (:1330-1360) ----------------------------------------
        um = u * self.rmu[None]
        amu = um * dtrdx
        p0_m1 = shift(p0, 0, -1)
        p0_m2 = shift(p0, 0, -2)
        p0_p1 = shift(p0, 0, 1)
        pos = amu > 0.0
        f1 = jnp.where(pos, p0_m1, p0_p1)
        f2 = jnp.where(pos, p0_m2, p0)
        zphi = self._waf_limiter(amu, f2, f1, p0, p0_m1)
        zpbw = 0.5 * um * ((1.0 + zphi) * p0_m1 + (1.0 - zphi) * p0)
        rfme = dtrdx * 2.0 * fmz / (fmz + shifte(fmz, 0, 1))
        rfmw = dtrdx * 2.0 * fmz / (fmz + shifte(fmz, 0, -1))
        ume = shift(u, 0, 1) * shift(self.rmu, 0, 1)[None]
        zdv = (ume * rfme - um * rfmw) * pp
        out = p0 + self.mx2[None] * (zpbw * rfmw - shift(zpbw, 0, 1) * rfme
                                     + zdv)
        return jnp.where(self.m_ci[None] > 0.5, out, pp)

    # staggering helpers (uvstagtox/xtouvstag, mod_moloch public)
    def uvstag2x(self, u, v):
        ux = 0.5 * (u + shift(u, 0, 1))
        vx = 0.5 * (v + shift(v, 1, 0))
        return ux, vx

    def x2uvstag(self, ux, vx):
        u = 0.5 * (ux + shifte(ux, 0, -1))
        v = 0.5 * (vx + shifte(vx, -1, 0))
        return u, v

    def wstag2x(self, w):
        return 0.5 * (w[:-1] + w[1:])

    def x2wstag(self, wx, w_old):
        w_int = 0.5 * (wx[:-1] + wx[1:])
        return jnp.concatenate(
            [w_old[:1], w_int, w_old[-1:]], axis=0)

    # ------------------------------------------------------------------
    def step(self, st: MolochState, bdy=None, xt=0.0
             ) -> Tuple[MolochState, Dict[str, jax.Array]]:
        """One MOLOCH model step (moloch, mod_moloch.F90:224-480).

        Dynamics + boundary relaxation (physics plugs in separately)."""
        kz = self.kz
        dtstepa = self.dtsec / self.nadv
        dtsound = dtstepa / self.nsound

        u, v, w = st.u, st.v, st.w
        pai, t = st.pai, st.t
        qx = st.qx
        qv = qx[0]
        qc = qx[1]
        p = pai ** c.cpovr * c.stdp
        qsat = pfwsat(t, p)
        tvirt = t * (1.0 + c.ep1 * qv - qc)
        tetav = tvirt / pai

        for _ in range(self.nadv):
            u, v, w, pai, s = self._sound(u, v, w, pai, tetav, qv, qsat,
                                          dtsound)
            # advection of all fields (advection, :1042-1095)
            ux, vx = self.uvstag2x(u, v)
            wx = self.wstag2x(w)
            tetav = self._wafone(tetav, u, v, s, dtstepa)
            pai = self._wafone(pai, u, v, s, dtstepa)
            ux = self._wafone(ux, u, v, s, dtstepa)
            vx = self._wafone(vx, u, v, s, dtstepa)
            wx = self._wafone(wx, u, v, s, dtstepa)
            qv = self._wafone(qv, u, v, s, dtstepa)
            qc = self._wafone(qc, u, v, s, dtstepa)
            u, v = self.x2uvstag(ux, vx)
            w = self.x2wstag(wx, w)

        # de-couple: T from θv·π (:322-350)
        tvirt = tetav * pai
        t = tvirt / (1.0 + c.ep1 * qv - qc)

        # boundary relaxation (moloch boundary, :485-520)
        if bdy is not None:
            xtd = xt + self.dtsec
            pai = pai + self._nudge(bdy["pai0"] + xtd * bdy["pait"] - pai)
            t = t + self._nudge(bdy["t0"] + xtd * bdy["tt"] - t)
            qv = jnp.maximum(
                qv + self._nudge(bdy["qv0"] + xtd * bdy["qvt"] - qv),
                c.minqq)
            u = u + self._nudge(bdy["u0"] + xtd * bdy["ut"] - u)
            v = v + self._nudge(bdy["v0"] + xtd * bdy["vt"] - v)

        ns = MolochState(u=u, v=v, w=w, pai=pai, t=t,
                         qx=jnp.stack([qv, qc]))
        p = pai ** c.cpovr * c.stdp
        diags = dict(
            wmax=jnp.max(jnp.abs(w)),
            pmin=jnp.min(jnp.where(self.m_ci > 0.5, p[kz - 1], 1e9)),
            pmax=jnp.max(jnp.where(self.m_ci > 0.5, p[kz - 1], 0.0)),
        )
        return ns, diags

    def _nudge(self, diff):
        """Relaxation increment (nudge applied directly to fields in
        MOLOCH — coefficients pre-scaled ×nadv·nsound×dt/...)."""
        lap = (shift(diff, 0, -1) + shift(diff, 0, 1)
               + shift(diff, -1, 0) + shift(diff, 1, 0) - 4.0 * diff)
        return (self.nfc * diff - self.ngc * lap) * self.m_ci \
            * (self.dtsec / (self.nadv * self.nsound))
