"""Hydrostatic dynamical core (idynamic=1) as a pure jitted step.

TPU-first re-design of the reference's leapfrog split-explicit hydrostatic
core (``Main/mod_tendency.F90:212`` `tend` and its internal phases, plus
``Main/mod_advection.F90``, ``Main/mod_diffusion.F90``,
``Main/mod_timefilter.F90``, ``Main/mod_split.F90``,
``Main/mod_bdycod.F90`` nudging). One model step is a single pure function
``state' = step(state, bdy, xt, dt)`` traced once by XLA; stencils are
expressed as static pad/slice ops so GSPMD inserts halo exchanges when the
arrays are sharded over a device mesh.

Prognostics are p*-coupled exactly like the reference (Arakawa-B grid,
sigma-p coordinate, ps/ptop in cb). The MM5 discrete equations follow the
file:line-cited phases; physics plugs in through the ``physics`` callable.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import ModelGrid
from ..core.state import HydroState, BdyState, StepFlags, IQV, IQC
from ..config.params import RegCMConfig
from ..utils import constants as c
from ..utils.tpu_math import cumsum_mm
from ..utils.thermo import pfesat, pfwsat, wlh
from . import stencil
from .stencil import (shift, shifte, kshift, cross2dot, dot2cross,
                      with_topology)
from .vmodes import make_split_coeffs


def fix_cross_pad(a):
    """Re-replicate the dead padding row/col of a cross-grid array.
    Periodic axes (band/CRM topologies) have no dead padding — leave
    them untouched."""
    if not stencil.periodic_y():
        a = a.at[..., -1, :].set(a[..., -2, :])
    if not stencil.periodic_x():
        a = a.at[..., :, -1].set(a[..., :, -2])
    return a


def cpmf(qv):
    """Moist heat capacity (Share/cpmf.inc): cpd·(1+0.80 qv)."""
    return c.cpd * (1.0 + 0.80 * qv)


class HydroCore:
    """Holds compile-time constants; `step` is the pure model step."""

    def __init__(self, grid: ModelGrid, cfg: RegCMConfig,
                 dtype=jnp.float64,
                 physics: Optional[Callable] = None):
        self.grid = grid
        self.cfg = cfg
        self.dtype = dtype
        f = lambda x: jnp.asarray(x, dtype)
        g = grid
        kz = g.kz
        self.kz = kz
        # band / CRM periodic topologies (dim_period,
        # Main/mpplib/mod_mppparam.F90:1131): x wraps for the tropical
        # band, x and y for the doubly-periodic CRM mode
        self.periodic_x = bool(cfg.geo.i_band or cfg.geo.i_crm)
        self.periodic_y = bool(cfg.geo.i_crm)
        # nqx: 2 (qv,qc) for SUBEX; 5 (qv,qc,qr,qi,qs) for the 5-species
        # schemes (Main/mod_params.F90:1359-1363)
        self.nqx = 5 if cfg.physics.ipptls in (2, 3) else 2
        # chemistry tracer count (ntr of mod_che_indices; 0 = chem off)
        if cfg.physics.ichem:
            from ..chem.species import build_species
            self.ntr = build_species(cfg.chem.chemsimtype).ntr
        else:
            self.ntr = 0
        self.ptop = float(g.ptop)
        self.dx = float(g.ds)
        self.dtsec = cfg.dtsec
        self.ipgf = int(cfg.physics.ipgf)
        # upstream-weighted scalar advection + local-extrema guard:
        # the reference FORCES upstream_mode = stability_enhance =
        # .true. for idynamic<3 (mod_params.F90:645-661) — same
        # defaults here (dynparam/extras can override)
        ex = cfg.physics.extras
        self.upstream_mode = bool(ex.get("upstream_mode", True))
        self.stability_enhance = bool(ex.get("stability_enhance",
                                             True))
        self.t_extrema = float(ex.get("t_extrema", 5.0))
        self.q_rel_extrema = float(ex.get("q_rel_extrema", 0.20))
        uoffc = float(ex.get("uoffc", 0.25))
        self.ul_adv = uoffc * 0.5 * cfg.dtsec / self.dx
        self.idiffu = int(getattr(cfg.physics, "idiffu", 1))
        if self.idiffu not in (1, 2, 3):
            raise ValueError(
                "physicsparam idiffu=%d is not implemented in "
                "regcm_tpu (1 = split-order deformation scheme, 2 = "
                "9-point 4th-order, 3 = 6th-order monotonic)"
                % self.idiffu)
        # idiffu=3 constant coefficient (initialize_diffusion,
        # Main/mod_diffusion.F90:154: 0.12·0.015625/(2·dt))
        self.diff6 = 0.12 * 0.015625 / (2.0 * cfg.dtsec)

        # 2-D constants
        self.msfx = f(g.msfx)
        self.msfd = f(g.msfd)
        self.coriol = f(g.coriol)
        self.ht = f(g.ht)
        self.xmapf = 1.0 / (self.msfx ** 2 * 4.0 * self.dx)   # mod_params:1997
        self.dmapf = 1.0 / (self.msfd ** 2 * 16.0 * self.dx)  # mod_params:1996
        self.m_c = f(g.m_cross)
        self.m_ci = f(g.m_cross_int)
        self.m_ci2 = f(g.m_cross_int2)
        self.m_di = f(g.m_dot_int)
        self.m_di2 = f(g.m_dot_int2)
        # edge masks
        self.e_c = {k: f(v) for k, v in g.e_cross.items()}
        self.e_d = {k: f(v) for k, v in g.e_dot.items()}
        ec = sum(g.e_cross.values())
        self.e_call = f(np.minimum(ec, 1.0))
        ed = sum(g.e_dot.values())
        self.e_dall = f(np.minimum(ed, 1.0))
        # two outer dot rings (decouple boundary wind override,
        # mod_tendency decouple :906-1009)
        iy, jx = g.iy, g.jx
        d2 = np.zeros((iy, jx))
        if not self.periodic_y:
            d2[:2, :] = 1.0
            d2[-2:, :] = 1.0
        if not self.periodic_x:
            d2[:, :2] = 1.0
            d2[:, -2:] = 1.0
        self.e_d2 = f(d2)
        # boundary-ring cross mask without dead padding
        self.m_cross_ring = f(np.minimum(ec, 1.0))

        # vertical
        self.sigma = f(g.sigma)          # (kz+1,)
        self.hsigma = f(g.hsigma)        # (kz,)
        self.dsigma = f(g.dsigma)
        self.twt1 = f(g.twt[:, 0])[:, None, None]
        self.twt2 = f(g.twt[:, 1])[:, None, None]
        self.qcon = f(g.qcon)[:, None, None]
        self.hsig3 = self.hsigma[:, None, None]
        self.dsig3 = self.dsigma[:, None, None]
        self.sig3 = self.sigma[:, None, None]

        # nudging coefficient maps
        self.nfc = f(g.nudge_fc)
        self.ngc = f(g.nudge_gc)
        self.nfd = f(g.nudge_fd)
        self.ngd = f(g.nudge_gd)
        self.hgfact = f(g.hgfact)
        self.xkhmax = float(g.extras["xkhmax"])
        self.dydc = float(g.extras["dydc"])

        # split-explicit coefficients
        nsplit = cfg.hydro.nsplit
        self.nsplit = nsplit
        sc = make_split_coeffs(g.sigma, self.ptop, nsplit, cfg.dtsec)
        self.sc = sc
        self.sp_aam = [int(a) for a in sc.aam]
        self.sp_dtau = [float(d) for d in sc.dtau]
        self.sp_hbar = f(sc.hbar)
        self.sp_an = f(sc.an)
        self.sp_am = f(sc.am)                  # (kz, nsplit)
        self.sp_zmatx = f(sc.zmatx)            # (kz, nsplit) ×fac
        self.sp_zmatxr = f(sc.zmatxr)          # (nsplit, kz)
        self.sp_tau = f(sc.tau_n)              # (nsplit, kz)
        # precompute delh constants: const(l) + slope(l)·(ps-pd)
        sigmah = sc.sigmah                     # (kz+1,) with last=1
        pdlog = np.log(sigmah * sc.pd + self.ptop)
        ceps = sigmah / (sigmah * sc.pd + self.ptop)
        self.sp_hconst = f(sc.varpa1_n @ pdlog)          # (nsplit,)
        self.sp_hslope = f(sc.varpa1_n @ ceps)           # (nsplit,)
        self.sp_pd = float(sc.pd)

        # physics hook: physics(core, slice_dict, state, flags) ->
        #   (tphy, qxphy, uphy_d, vphy_d, surface_updates_dict)
        self.physics = physics
        self.grid_lndocn = f(g.lndocn)
        # prescribed SST (ocean surface temperature); default: standard
        # atmosphere surface T (overwritten when real SST data is read)
        self.sst = jnp.full((g.iy, g.jx), 288.0, dtype)

        # SUBEX parameters (subexparam, Main/mod_params.F90)
        sx = cfg.subex
        lnd = f(g.lndocn)
        self.qck1 = jnp.where(lnd > 0.5, sx.qck1land, sx.qck1oce)
        self.cgul = jnp.where(lnd > 0.5, sx.gulland, sx.guloce)
        self.cevap = jnp.where(lnd > 0.5, sx.cevaplnd, sx.cevapoce)
        self.caccr = jnp.where(lnd > 0.5, sx.caccrlnd, sx.caccroce)
        self.rh0 = jnp.where(lnd > 0.5, sx.rh0land, sx.rh0oce)
        self.rhmax = sx.rhmax
        self.rhmin = 0.01
        self.tc0 = 238.0
        self.conf = sx.conf
        self.gnu1 = cfg.dyn.gnu1
        self.gnu2 = cfg.dyn.gnu2
        # UW TCM prognostic TKE dynamics (ibltyp=2 only,
        # mod_tendency.F90:518-544,1414-1424,1544-1547)
        self.ibltyp = cfg.physics.ibltyp
        self.nuk = float(cfg.physics.extras.get("nuk", 5.0))
        self.tkemin = 1.0e-3         # uwtkemin (mod_pbl_uwtcm.F90:86)
        # semi-Lagrangian tracer advection (isladvec=1,
        # Main/mod_sladvection.F90; replaces the flux-form horizontal
        # advection of qv and the hydrometeors)
        self.isladvec = int(cfg.physics.isladvec)
        self.iqmsl = int(cfg.physics.iqmsl)
        self.iboudy = cfg.physics.iboudy
        if self.iboudy == 4:      # sponge weights (mod_bdycod.F90:237)
            self.spwc = f(g.extras["sponge_wc"])
            self.spwd = f(g.extras["sponge_wd"])
        # temperature advection form (mod_tendency ithadv; 0 = plain T
        # flux advection + omega heating, 1 = theta advection)
        self.ithadv = int(cfg.dyn.extras.get("ithadv", 0))
        self.idynamic = cfg.core.idynamic
        if self.idynamic == 2:
            from .sound import make_base_state
            self.base = make_base_state(
                grid, self.ptop,
                logp_lrate=cfg.nonhydro.logp_lrate, dtype=dtype)
            # upper-level Rayleigh damping to BCs (README.namelist
            # ifrayd/rayndamp/rayalpha0/rayhd; Main/mod_bdycod.F90:5115)
            dx = cfg.dyn.extras
            self.ifrayd = int(dx.get("ifrayd", 1))
            self.rayndamp = int(dx.get("rayndamp", 5))
            self.rayalpha0 = float(dx.get("rayalpha0", 3.0e-4))
            self.rayhd = float(dx.get("rayhd", 1.0e4))

    # ------------------------------------------------------------------
    # phase implementations (all pure; arrays (kz, iy, jx) or (iy, jx))
    # ------------------------------------------------------------------

    def couple_uvten(self, utenx, vtenx, cpl):
        """Couple uncoupled cross-grid wind tendencies to the B-grid dot
        points ×p*_dot (uvcross2dot path of cu_interface :375-381)."""
        psd = cross2dot(cpl)
        return (cross2dot(utenx) * psd[None] * self.m_di,
                cross2dot(vtenx) * psd[None] * self.m_di)

    def _advection_uv(self, ua, va, ud, vd, uc, vc, svv):
        """hadvuv + vadvuv (Main/mod_advection.F90:124-305).

        ua/va: coupled·msfd (umc); ud/vd decoupled; uc/vc coupled;
        svv: qdot on full levels (kz+1, iy, jx). Returns (uten, vten)."""
        # 9-point monotone weights
        ucmona = shift(ua, 1, 0) + 2.0 * ua + shift(ua, -1, 0)
        ucmonb = shift(ua, 1, 1) + 2.0 * shift(ua, 0, 1) + shift(ua, -1, 1)
        ucmonc = shift(ua, 1, -1) + 2.0 * shift(ua, 0, -1) + shift(ua, -1, -1)
        vcmona = shift(va, 0, 1) + 2.0 * va + shift(va, 0, -1)
        vcmonb = shift(va, 1, 1) + 2.0 * shift(va, 1, 0) + shift(va, 1, -1)
        vcmonc = shift(va, -1, 1) + 2.0 * shift(va, -1, 0) + shift(va, -1, -1)
        ucb = ucmona + ucmonb
        ucc_ = ucmonc + ucmona
        vcb = vcmona + vcmonb
        vcc_ = vcmonc + vcmona
        uten = -self.dmapf * (
            (shift(ud, 0, 1) + ud) * ucb - (ud + shift(ud, 0, -1)) * ucc_
            + (shift(ud, 1, 0) + ud) * vcb - (ud + shift(ud, -1, 0)) * vcc_)
        vten = -self.dmapf * (
            (shift(vd, 0, 1) + vd) * ucb - (vd + shift(vd, 0, -1)) * ucc_
            + (shift(vd, 1, 0) + vd) * vcb - (vd + shift(vd, -1, 0)) * vcc_)
        # vertical advection (vadvuv): svv averaged to dot
        qq = 0.25 * (svv + shifte(svv, 0, -1) + shifte(svv, -1, 0)
                     + shifte(svv, -1, -1))       # (kz+1, iy, jx) at dot
        # flux at interior full levels k=1..kz-1 (0-based)
        uf = qq[1:self.kz] * (self.twt1[1:] * uc[1:]
                              + self.twt2[1:] * uc[:-1])
        vf = qq[1:self.kz] * (self.twt1[1:] * vc[1:]
                              + self.twt2[1:] * vc[:-1])
        zt = jnp.zeros_like(uc[:1])
        ufp = jnp.concatenate([zt, uf, zt], axis=0)   # (kz+1,…) interface flux
        vfp = jnp.concatenate([zt, vf, zt], axis=0)
        # level l tendency = (F_l − F_{l+1})/Δσ_l (vadvuv,
        # Main/mod_advection.F90:297-303)
        uten = uten + (ufp[:-1] - ufp[1:]) / self.dsig3
        vten = vten + (vfp[:-1] - vfp[1:]) / self.dsig3
        return uten * self.m_di, vten * self.m_di

    def _hadv_scalar(self, fdec, uavg1, uavg2, vavg1, vavg2, ps=None):
        """Flux-form horizontal advection of a decoupled cross scalar
        (hadvt/hadv3d ind=0, Main/mod_advection.F90:311-480).

        upstream_mode (the reference's default for the sigma-p cores,
        Main/mod_params.F90:646): Courant-weighted upwind-biased
        interface values fx = (1±f1)·f with f1 = ½·ul·(uavg1+uavg2)/ps,
        ul = uoffc·½·dt/dx (:106). Needs `ps` (cross p*)."""
        fm = shift(fdec, 0, -1)
        fp = shift(fdec, 0, 1)
        gm = shift(fdec, -1, 0)
        gp = shift(fdec, 1, 0)
        if self.upstream_mode and ps is not None:
            f1 = 0.5 * self.ul_adv * (uavg2 + uavg1) / ps[None]
            f2 = 0.5 * self.ul_adv * (vavg2 + vavg1) / ps[None]
            fx1 = (1.0 + f1) * fm + (1.0 - f1) * fdec
            fx2 = (1.0 + f1) * fdec + (1.0 - f1) * fp
            fy1 = (1.0 + f2) * gm + (1.0 - f2) * fdec
            fy2 = (1.0 + f2) * fdec + (1.0 - f2) * gp
        else:
            fx1 = fm + fdec
            fx2 = fdec + fp
            fy1 = gm + fdec
            fy2 = fdec + gp
        return -self.xmapf * (uavg2 * fx2 - uavg1 * fx1
                              + vavg2 * fy2 - vavg1 * fy1) * self.m_ci

    def _stability_guard(self, fg, fcoup, ps, mode):
        """Instability correction (stability_enhance,
        Main/mod_advection.F90:354-387 for T with the absolute
        t_extrema/ps test, :565-597 for qx with the relative
        q_rel_extrema test): local extrema whose second difference
        exceeds the threshold must not grow further — clamp the hadv
        tendency sign at local maxima/minima, per direction."""
        if not self.stability_enhance:
            return fg
        interior = self.m_ci > 0.5
        for dy, dx in ((0, 1), (1, 0)):
            fp = shift(fcoup, dy, dx)
            fm = shift(fcoup, -dy, -dx)
            sec = jnp.abs(fp + fm - 2.0 * fcoup)
            if mode == "abs":
                exceed = sec / ps[None] > self.t_extrema
            else:
                exceed = sec / jnp.maximum(fcoup, 1e-30) \
                    > self.q_rel_extrema
            # interior cross points only (the reference's jci/ici loop
            # bounds; shift() boundary fill must not fake an extremum)
            exceed = exceed & interior
            locmax = (fcoup > fp) & (fcoup > fm)
            locmin = (fcoup < fp) & (fcoup < fm)
            fg = jnp.where(exceed & locmax, jnp.minimum(fg, 0.0), fg)
            fg = jnp.where(exceed & locmin, jnp.maximum(fg, 0.0), fg)
        return fg

    def _tke_dyn(self, s, qdot, uavg1, uavg2, vavg1, vavg2, psa, xkc):
        """UW TKE dynamics tendency (coupled, on kz+1 interfaces):
        hadv ind=1 of decoupled tke (mod_tendency.F90:1416) + vadv ind=0
        of tke·p* (:1421-1424) + horizontal diffusion with the nuk
        coefficient (:1544-1547)."""
        kz = self.kz
        tk = s.tke_a                       # uncoupled, (kz+1, iy, jx)
        tked = jnp.zeros_like(tk)
        # hadv ind=1: winds interpolated to interior full levels
        ua1_i = self.twt1[1:] * uavg1[1:] + self.twt2[1:] * uavg1[:-1]
        ua2_i = self.twt1[1:] * uavg2[1:] + self.twt2[1:] * uavg2[:-1]
        va1_i = self.twt1[1:] * vavg1[1:] + self.twt2[1:] * vavg1[:-1]
        va2_i = self.twt1[1:] * vavg2[1:] + self.twt2[1:] * vavg2[:-1]
        tk_i = tk[1:kz]
        fx1 = shift(tk_i, 0, -1) + tk_i
        fx2 = tk_i + shift(tk_i, 0, 1)
        fy1 = shift(tk_i, -1, 0) + tk_i
        fy2 = tk_i + shift(tk_i, 1, 0)
        th_ = -self.xmapf[None] * (ua2_i * fx2 - ua1_i * fx1
                                   + va2_i * fy2 - va1_i * fy1) \
            * self.m_ci
        tked = tked.at[1:kz].add(th_)
        # vadv ind=0 nk=kzp1 on coupled tke·p* (half-level fluxes)
        tkps = tk * psa[None]
        fx0 = 0.5 * (qdot[:kz] + qdot[1:]) * (tkps[:kz] + tkps[1:])
        dds_i = 1.0 / (self.dsig3[1:] + self.dsig3[:-1])
        tked = tked.at[1:kz].add((fx0[:-1] - fx0[1:]) * dds_i)
        # horizontal diffusion ×nuk on the decoupled b-level tke
        xkcf = jnp.concatenate([xkc[:1], xkc], axis=0)
        tked = tked + self.nuk * self._diffu_cross(s.tke_b, xkcf)
        return tked

    def _tke_forecast(self, s, tkedyn, tkephy, rpsa, dt):
        """Forecast + RAW filter of the UW TKE
        (mod_tendency.F90:528-543)."""
        tketen = tkedyn * rpsa[None] + tkephy
        tkec = jnp.maximum(self.tkemin, s.tke_b + dt * tketen)
        beta = 0.53
        dtk = self.gnu2 * (tkec + s.tke_b - 2.0 * s.tke_a)
        mci = self.m_ci[None] > 0.5
        tke_b_n = jnp.where(
            mci, jnp.maximum(s.tke_a + beta * dtk, self.tkemin),
            s.tke_b)
        tke_a_n = jnp.where(
            mci, jnp.maximum(tkec + (beta - 1.0) * dtk, self.tkemin),
            s.tke_a)
        return tke_a_n, tke_b_n

    def _vadv_flux(self, fint, svv):
        """Generic vertical flux divergence: fint (kz-1,…) interface flux
        values at interior full levels (already × svv);
        ften[k-1] -= f/ds[k-1]; ften[k] += f/ds[k].

        Operates on axis -3 so a stacked hydrometeor array
        (nhyd, kz-1, iy, jx) broadcasts through unchanged."""
        zt = jnp.zeros_like(fint[..., :1, :, :])
        fp = jnp.concatenate([zt, fint, zt], axis=-3)
        return (fp[..., :-1, :, :] - fp[..., 1:, :, :]) / self.dsig3

    @with_topology
    def step(self, s: HydroState, bdy: BdyState, xt, dt,
             flags: StepFlags = StepFlags(), coszrs=None, solar=None
             ) -> Tuple[HydroState, Dict[str, jax.Array]]:
        """One leapfrog step (tend, Main/mod_tendency.F90:212-560).

        xt: seconds since boundary b0 time; dt: leapfrog step (dtsec on
        the very first step, 2·dtsec after: mod_tendency.F90:610-616).
        """
        g = self.grid
        kz, iy, jx = self.kz, g.iy, g.jx
        ptop = self.ptop

        # -- surface_pressures (mod_tendency.F90:815-850) ----------------
        psa = s.ps_a
        psb = s.ps_b
        rpsa = 1.0 / psa
        rpsb = 1.0 / psb
        psdota = cross2dot(psa)
        psdotb = cross2dot(psb)
        rpsda = 1.0 / psdota

        # -- decouple (mod_tendency.F90:852-1110) ------------------------
        uc = s.u_a                       # coupled p*·u (dot)
        vc = s.v_a
        umc = uc * self.msfd
        vmc = vc * self.msfd
        ud = uc * rpsda
        vd = vc * rpsda
        # boundary override of decoupled winds on two outer dot rings
        ub_bdy = (bdy.u0 + xt * bdy.ut) * rpsda
        vb_bdy = (bdy.v0 + xt * bdy.vt) * rpsda
        ud = jnp.where(self.e_d2 > 0.5, ub_bdy, ud)
        vd = jnp.where(self.e_d2 > 0.5, vb_bdy, vd)
        umd = ud * self.msfd
        vmd = vd * self.msfd
        tdec = s.t_a * rpsa
        qvdec = jnp.maximum(s.qx_a[IQV] * rpsa, c.minqq)
        # hydrometeors stacked on a leading species axis (nhyd, kz, iy, jx)
        qhdec = jnp.maximum(s.qx_a[1:] * rpsa, 0.0)
        qcdec = qhdec[0]
        tv = tdec * (1.0 + c.ep1 * qvdec)

        # -- compute_omega (mod_tendency.F90:1118-1225) ------------------
        rmsfx2 = 1.0 / (2.0 * self.dx * self.msfx ** 2)
        div = ((shift(umc, 1, 1) + shift(umc, 0, 1)
                - shift(umc, 1, 0) - umc)
               + (shift(vmc, 1, 1) + shift(vmc, 1, 0)
                  - shift(vmc, 0, 1) - vmc)) * rmsfx2      # (kz, iy, jx)
        div = div * self.m_c
        pten = -jnp.sum(div * self.dsig3, axis=0)          # (iy, jx)
        # qdot at interfaces (kz+1): qdot[k] = qdot[k-1] - (pten+div[k-1])
        #                                       ·dsigma[k-1]·rpsa
        inc = -(pten[None] + div) * self.dsig3 * rpsa[None]
        qdot = jnp.concatenate(
            [jnp.zeros((1, iy, jx), self.dtype),
             cumsum_mm(inc, axis=0)], axis=0)
        # top & bottom interfaces are zero by construction/convention
        qdot = qdot.at[kz].set(0.0)
        # omega (cb/s) at half levels, interior cross
        udsum = ud + shift(ud, 0, 1) + shift(ud, 1, 1) + shift(ud, 1, 0)
        vdsum = vd + shift(vd, 0, 1) + shift(vd, 1, 1) + shift(vd, 1, 0)
        dpsx = shift(psa, 0, 1) - shift(psa, 0, -1)
        dpsy = shift(psa, 1, 0) - shift(psa, -1, 0)
        omega = (0.5 * (qdot[1:] + qdot[:-1]) * psa[None]
                 + self.hsig3 * (pten[None]
                                 + (udsum * dpsx[None] + vdsum * dpsy[None])
                                 / (8.0 * self.dx * self.msfx)[None]))
        omega = omega * self.m_ci

        # -- mkslice (Main/mod_slice.F90:102-340) ------------------------
        ubd3 = s.u_b / psdotb            # decoupled b-level winds (dot)
        vbd3 = s.v_b / psdotb
        ubx3 = dot2cross(ubd3)
        vbx3 = dot2cross(vbd3)
        tb3 = s.t_b * rpsb
        qvb3 = jnp.maximum(s.qx_b[IQV] * rpsb, c.minqq)
        qhb3 = jnp.maximum(s.qx_b[1:] * rpsb, 0.0)
        qcb3 = qhb3[0]
        tvb3 = tb3 * (1.0 + c.ep1 * qvb3 - qcb3)
        pb3 = (self.hsig3 * psb[None] + ptop) * 1000.0      # Pa half levels
        pf3 = (self.sig3 * psb[None] + ptop) * 1000.0       # Pa interfaces
        ps2d = (psb + ptop) * 1000.0
        rhob3 = pb3 / (c.rgas * tb3)
        qsb3 = pfwsat(tb3, pb3)
        rhb3 = jnp.clip(qvb3 / qsb3, self.rhmin, self.rhmax)
        # heights (za at half levels), zq interfaces
        cell = ptop * rpsb[None]
        dzq_fac = c.rovg * tvb3 * jnp.log((self.sig3[1:] + cell)
                                          / (self.sig3[:-1] + cell))
        # zq[k] = sum of dzq from below: zq[kz]=0
        zq = jnp.concatenate(
            [cumsum_mm(dzq_fac, axis=0, reverse=True),
             jnp.zeros((1, iy, jx), self.dtype)], axis=0)
        za = 0.5 * (zq[:-1] + zq[1:])
        dzq = zq[:-1] - zq[1:]

        if coszrs is None:
            coszrs = jnp.zeros_like(psb)
        atms = dict(ubd3=ubd3, vbd3=vbd3, ubx3=ubx3, vbx3=vbx3, tb3=tb3,
                    qvb3=qvb3, qcb3=qcb3, qhb3=qhb3, tvb3=tvb3, pb3=pb3,
                    pf3=pf3, ps2d=ps2d, rhob3=rhob3, qsb3=qsb3, rhb3=rhb3,
                    za=za, zq=zq, dzq=dzq, psb=psb, psa=psa,
                    omega_pa=omega * 1000.0, qdot=qdot, rpsb=rpsb,
                    coszrs=coszrs)
        if solar is not None:
            # per-day solar forcing from the driver (solar1 outputs):
            # eccentricity factor + TSI
            atms["eccf"], atms["solcon"] = solar[0], solar[1]
            if solar.shape[0] > 2:
                atms["mpos"] = solar[2]

        # -- new_pressure (mod_tendency.F90:1428-1460) -------------------
        if self.iboudy == 4:
            # sponge2d: blend toward bdy tendency (mod_bdycod.F90:2726)
            pten_n = self.spwc * pten + (1.0 - self.spwc) * bdy.pst
        else:
            ps_bdy_diff = (bdy.ps0 + (xt + dt) * bdy.pst) - psb
            pten_n = pten + self._nudge2d(ps_bdy_diff)
        psc = psb + pten_n * dt
        psc = fix_cross_pad(psc)
        rpsc = 1.0 / psc

        # -- calc_coeff (Main/mod_diffusion.F90:148-255) -----------------
        dudx = (shift(ubd3, 1, 1) + shift(ubd3, 0, 1) - shift(ubd3, 1, 0)
                - ubd3)
        dvdx = (shift(vbd3, 1, 1) + shift(vbd3, 0, 1) - shift(vbd3, 1, 0)
                - vbd3)
        dudy = (shift(ubd3, 1, 0) + shift(ubd3, 1, 1) - ubd3
                - shift(ubd3, 0, 1))
        dvdy = (shift(vbd3, 1, 0) + shift(vbd3, 1, 1) - vbd3
                - shift(vbd3, 0, 1))
        duv = jnp.sqrt((dudx - dvdy) ** 2 + (dvdx + dudy) ** 2)
        xkc_raw = jnp.minimum(self.hgfact[None] + self.dydc * duv,
                              self.xkhmax) * self.m_c
        xkc_raw = fix_cross_pad(xkc_raw)
        xkd = 0.25 * (xkc_raw + shifte(xkc_raw, -1, -1)
                      + shifte(xkc_raw, 0, -1) + shifte(xkc_raw, -1, 0))
        rdxsq = 1.0 / (self.dx * self.dx)
        if self.idiffu == 3:
            # constant 6th-order coefficient (calc_coeff,
            # mod_diffusion.F90:174-183: diff_6th_coef·p*, no
            # deformation dependence, no 1/dx²)
            xkc = self.diff6 * psb[None] * jnp.ones_like(xkc_raw)
            xkd = self.diff6 * psdotb[None] * jnp.ones_like(xkc_raw)
        else:
            xkc = xkc_raw * rdxsq * psb[None]
            xkd = xkd * rdxsq * psdotb[None]

        # -- advection (mod_tendency.F90:1270-1426) ----------------------
        # precompute (start_advect)
        uavg1 = shift(umc, 1, 0) + umc
        uavg2 = shift(umc, 1, 1) + shift(umc, 0, 1)
        vavg1 = shift(vmc, 0, 1) + vmc
        vavg2 = shift(vmc, 1, 1) + shift(vmc, 1, 0)

        udyn, vdyn = self._advection_uv(umc, vmc, ud, vd, uc, vc, qdot)

        # temperature advection — two reference forms:
        if self.ithadv == 1:
            # theta-advection (ithadv=1, mod_tendency.F90:1352-1366
            # + adiabatic :1597-1604)
            pr_a = (self.hsig3 * psa[None] + ptop) * 1000.0
            th = tdec * (c.stdp / pr_a) ** c.rovcp
            tha = th * psa[None]
            thten = self._hadv_scalar(th, uavg1, uavg2, vavg1, vavg2,
                                      ps=psa)
            thten = self._stability_guard(thten, tha, psa, "abs")
            # vadv3d ind=0 nk=kz on tha: interface flux at k=1..kz-1
            fth = qdot[1:kz] * (self.twt1[1:] * tha[1:]
                                + self.twt2[1:] * tha[:-1])
            thten = thten + self._vadv_flux(fth, qdot)
        else:
            # plain T flux advection (ithadv=0): hadv(atmx%t) +
            # vadv3d ind=1 with exner-weighted interface interpolation
            # (mod_advection.F90:730-790)
            tdyn0 = self._hadv_scalar(tdec, uavg1, uavg2, vavg1, vavg2,
                                      ps=psa)
            tdyn0 = self._stability_guard(tdyn0, tdec * psa[None],
                                          psa, "abs")
            pfs = (self.sig3 * psa[None] + ptop) * 1000.0   # (kz+1)
            phs = (self.hsig3 * psa[None] + ptop) * 1000.0
            ta = s.t_a
            fT = qdot[1:kz] * (
                self.twt1[1:] * ta[1:]
                * (pfs[1:kz] / phs[1:]) ** c.c287
                + self.twt2[1:] * ta[:-1]
                * (pfs[1:kz] / phs[:-1]) ** c.c287)
            tdyn0 = tdyn0 + self._vadv_flux(fT, qdot)
        # qv: hadvqv on decoupled + vadvqv on coupled.  With Kuo
        # (icup=1) the dycore defers qv vadv to cupara
        # (mod_tendency.F90:1371-1373): active columns get the Kuo
        # tendencies instead, others the vadv term (mod_cu_kuo.F90:270+)
        if self.isladvec == 1:
            # semi-Lagrangian horizontal advection of moisture
            # (trajcalc_x + slhadv_x on the coupled b-level fields,
            # mod_tendency.F90:1283,1361-1380); vertical advection
            # stays in flux form
            from .sladvection import sl_weights, slhadv
            slw = sl_weights(ud, vd, self.msfx, self.dx, dt, iy, jx)
            qvhadv = slhadv(s.qx_b[IQV], slw, dt,
                            qmsl=(self.iqmsl == 1)) * self.m_ci
        else:
            qvhadv = self._hadv_scalar(qvdec, uavg1, uavg2, vavg1,
                                       vavg2, ps=psa)
            qvhadv = self._stability_guard(qvhadv, qvdec, psa, "rel")
        qva = s.qx_a[IQV]
        ok = ((qva[1:] > c.minqq * psa[None])
              & (qva[:-1] > c.minqq * psa[None]))
        fgq = jnp.where(ok, qva[1:] * (qva[:-1]
                                       / jnp.maximum(qva[1:], 1e-30))
                        ** self.qcon[1:], 0.0)
        qv_vadv = self._vadv_flux(qdot[1:kz] * fgq, qdot)
        kuo_defer = (self.physics is not None
                     and getattr(self.physics, "kuo_defer", False))
        qvten = qvhadv if kuo_defer else qvhadv + qv_vadv
        # hydrometeors (qc..qs): hadv + vadv4d ind=1 with the upstream
        # sign guard, batched over the species axis
        if self.isladvec == 1:
            qhten = slhadv(s.qx_b[1:], slw, dt,
                           qmsl=(self.iqmsl == 1)) * self.m_ci
        else:
            qhten = self._hadv_scalar(qhdec, uavg1, uavg2, vavg1,
                                      vavg2, ps=psa)
            qhten = self._stability_guard(qhten, qhdec, psa, "rel")
        qha = s.qx_a[1:]
        fi = (self.twt1[1:] * qha[:, 1:]
              + self.twt2[1:] * qha[:, :-1])
        thr = c.minqq * c.minqq * psa[None]
        okup = qha[:, :-1] > thr      # svv>0 uses k-1
        okdn = qha[:, 1:] > thr
        fqh = jnp.where(qdot[1:kz] > 0.0,
                        jnp.where(okup, qdot[1:kz] * fi, 0.0),
                        jnp.where(okdn, qdot[1:kz] * fi, 0.0))
        qhten = qhten + self._vadv_flux(fqh, qdot)

        # -- chemistry tracers: advection like the hydrometeors
        #    (hadv/vadv4d on chib, mod_tendency.F90:1390-1420) ----------
        if self.ntr:
            chidec = jnp.maximum(s.chi_a * rpsa[None], 0.0)
            chiten_d = self._hadv_scalar(chidec, uavg1, uavg2, vavg1,
                                         vavg2, ps=psa)
            chia = s.chi_a
            fi_x = (self.twt1[1:] * chia[:, 1:]
                    + self.twt2[1:] * chia[:, :-1])
            thrx = 1.0e-30
            fchi = jnp.where(qdot[1:kz] > 0.0,
                             jnp.where(chia[:, :-1] > thrx,
                                       qdot[1:kz] * fi_x, 0.0),
                             jnp.where(chia[:, 1:] > thrx,
                                       qdot[1:kz] * fi_x, 0.0))
            chiten_d = chiten_d + self._vadv_flux(fchi, qdot)

        # -- curvature: Coriolis (mod_tendency.F90:1822-1848) ------------
        udyn = udyn + self.coriol[None] * vc * self.m_di
        vdyn = vdyn - self.coriol[None] * uc * self.m_di

        # -- adiabatic (mod_tendency.F90:1555-1580 + theta term) ---------
        if self.ithadv == 1:
            thten = thten + th * div
            tdyn = s.t_a * thten / jnp.where(tha == 0.0, 1.0, tha) \
                * self.m_ci
        else:
            # omega heating: tdyn += ω·(R/cpm)·Tv/(ptop/p*+σ)
            # (mod_tendency.F90:1568-1576)
            rovcpm = c.rgas / cpmf(qvdec)
            tdyn = tdyn0 + (omega * rovcpm * tv
                            / (ptop * rpsa[None] + self.hsig3)) * self.m_ci

        # -- boundary nudging (mod_tendency.F90:1462-1513, nudge3d
        #    Main/mod_bdycod.F90:4218) ------------------------------------
        xtd = xt + dt
        tdyn = tdyn + self._nudge3(
            (bdy.t0 + xtd * bdy.tt) - s.t_b, self.nfc, self.ngc)
        qvten = qvten + self._nudge3(
            (bdy.qv0 + xtd * bdy.qvt) - s.qx_b[IQV], self.nfc, self.ngc)
        udyn = udyn + self._nudge3(
            (bdy.u0 + xtd * bdy.ut) - s.u_b, self.nfd, self.ngd, dot=True)
        vdyn = vdyn + self._nudge3(
            (bdy.v0 + xtd * bdy.vt) - s.v_b, self.nfd, self.ngd, dot=True)
        if self.ntr:
            # chem lateral boundary (nudge toward CHBC pairs when
            # present, else clean inflow air — mod_che_bdyco.F90
            # nudge_chi; ichebdy)
            chb = (bdy.chi0 + xtd * bdy.chit) \
                if bdy.chi0 is not None else 0.0
            chiten_d = chiten_d + self._nudge3(chb - s.chi_b,
                                               self.nfc, self.ngc)

        # -- physics (mod_tendency.F90:1682-1820) ------------------------
        tphy = jnp.zeros_like(tdyn)
        qvphy = jnp.zeros_like(qvten)
        qhphy = jnp.zeros_like(qhten)
        uphy = jnp.zeros_like(udyn)
        vphy = jnp.zeros_like(vdyn)
        sfupd: Dict[str, jax.Array] = {}
        cldfra = jnp.zeros_like(tdyn)
        heatrt = s.heatrt
        if self.physics is not None:
            (tphy, qvphy, qhphy, uphy, vphy, cldfra,
             heatrt, sfupd) = self.physics(
                 self, atms, s, bdy, flags, dt,
                 dyn=dict(tdyn=tdyn, qvdyn=qvten, qvhadv=qvhadv,
                          qv_vadv=qv_vadv))
        # radiation heating: tphy += psb·heatrt (mod_tendency.F90:1776)
        tphy = tphy + psb[None] * heatrt * self.m_ci
        chiphy = sfupd.pop("_chiten", None)

        # -- diffusion (mod_tendency.F90:1515-1553) ----------------------
        udyn = udyn + self._diffu_dot(ubd3, xkd)
        vdyn = vdyn + self._diffu_dot(vbd3, xkd)
        tdyn = tdyn + self._diffu_cross(tb3, xkc)
        qvten = qvten + self._diffu_cross(qvb3, xkc)
        qhten = qhten + self._diffu_cross(qhb3, xkc)
        if self.ntr:
            chib3 = jnp.maximum(s.chi_b * rpsb[None], 0.0)
            chiten_d = chiten_d + self._diffu_cross(chib3, xkc)

        # -- total tendencies + SUBEX condtq -----------------------------
        tten = tdyn + tphy
        qvten_t = qvten + qvphy
        qhten_t = qhten + qhphy
        if self.cfg.physics.ipptls == 1:
            dtc, dqv, dqc = self._condtq(s, tten, qvten_t, qhten_t[0],
                                         psc, rpsc, cldfra, dt)
            tten = tten + dtc
            qvten_t = qvten_t + dqv
            qhten_t = qhten_t.at[0].add(dqc)
        if self.ntr:
            chiten_t = chiten_d + (chiphy if chiphy is not None
                                   else 0.0)
        if self.iboudy == 4:
            # sponge on TOTAL tendencies (mod_tendency.F90:1481-1483,
            # pc_total): ften ← w·ften + (1−w)·bt; hydrometeor boundary
            # tendencies are zero
            wc3 = self.spwc[None]
            tten = wc3 * tten + (1.0 - wc3) * bdy.tt
            qvten_t = wc3 * qvten_t + (1.0 - wc3) * bdy.qvt
            qhten_t = wc3 * qhten_t
            if self.ntr:
                chiten_t = wc3 * chiten_t

        # -- forecast t, qx at tau+1 (mod_tendency.F90:380-420) ----------
        tc = s.t_b + dt * tten * self.m_ci
        qvc = s.qx_b[IQV] + dt * qvten_t * self.m_ci
        qhc = s.qx_b[1:] + dt * qhten_t * self.m_ci
        # negative-water fix: qx<0 → 1% of |3×3 neighborhood| mean
        qvc = self._negfix(qvc)
        qhc = self._negfix(qhc)
        if self.ntr:
            chic = self._negfix(s.chi_b + dt * chiten_t * self.m_ci)

        # -- PGF (mod_tendency.F90:1886-2120; ipgf 0 = full-field,
        #    ipgf 1 = perturbation form: a reference profile
        #    t00pg·((σp*+ptop)/p00pg)^pgfaa1 is removed from the
        #    virtual temperature in BOTH parts of the force, reducing
        #    the steep-terrain PGF truncation error) ------------------
        td = s.t_a * (1.0 + c.ep1 * qvdec)       # coupled p*Tv (beta_hyd=1)
        tvfac = 1.0 / (1.0 + qcdec / (1.0 + qvdec))
        ptrps = ptop * rpsa[None]
        if self.ipgf == 1:
            T00PG, P00PG = 287.0, 101.325
            PGFAA1 = 6.5e-3 * c.rgas * c.regrav
            tref3 = T00PG * ((self.hsig3 * psa[None] + ptop)
                             / P00PG) ** PGFAA1
            td_pg = td - psa[None] * tref3        # ttld (:1901)
        else:
            td_pg = td
        # geopotential integration bottom-up
        logfac = jnp.log((self.hsig3 + ptrps)
                         / jnp.concatenate(
                             [self.hsig3[1:] + ptrps,
                              1.0 + ptrps[:1] * jnp.ones((1, iy, jx),
                                                         self.dtype)],
                             axis=0))
        # lowest layer term uses td[kz-1]·rpsa·tvfac; above: weighted avg
        tvavg_up = ((td_pg[:-1] * self.dsig3[:-1]
                     + td_pg[1:] * self.dsig3[1:])
                    / (psa[None] * (self.dsig3[:-1] + self.dsig3[1:]))
                    * tvfac[:-1])
        phi_kz = self.ht - c.rgas * (td_pg[kz - 1] * rpsa
                                     * tvfac[kz - 1]) * logfac[kz - 1]
        if self.ipgf == 1:
            # reference-profile geopotential (:2046-2047)
            phi_kz = phi_kz + c.rgas * T00PG / PGFAA1 \
                * ((psa + ptop) / P00PG) ** PGFAA1
        incs = -c.rgas * tvavg_up * logfac[:-1]          # (kz-1, iy, jx)
        # phi[k] = phi[k+1] + incs[k] (k from kz-2 down)
        phi = jnp.concatenate(
            [cumsum_mm(incs, axis=0, reverse=True)
             + phi_kz[None], phi_kz[None]], axis=0)
        # ps-gradient part
        hpsx2 = 0.5 * (psa + shift(psa, -1, 0))      # avg over y-1,y at x
        hpsx2m = 0.5 * (shift(psa, 0, -1) + shift(psa, -1, -1))
        hpsy2 = 0.5 * (psa + shift(psa, 0, -1))
        hpsy2m = 0.5 * (shift(psa, -1, 0) + shift(psa, -1, -1))
        tvdot4 = 0.25 * (shift(tv, -1, -1) + shift(tv, 0, -1)
                         + shift(tv, -1, 0) + tv)
        if self.ipgf == 1:
            tvdot4 = tvdot4 - T00PG * (
                (self.hsig3 * psdota[None] + ptop) / P00PG) ** PGFAA1
        rtbar = c.rgas * psdota[None] * tvdot4
        dmsf = 1.0 / (self.dx * self.msfd)
        udyn = udyn - rtbar * (
            jnp.log(hpsx2[None] * self.hsig3 + ptop)
            - jnp.log(hpsx2m[None] * self.hsig3 + ptop)) * dmsf[None] \
            * self.m_di
        vdyn = vdyn - rtbar * (
            jnp.log(hpsy2[None] * self.hsig3 + ptop)
            - jnp.log(hpsy2m[None] * self.hsig3 + ptop)) * dmsf[None] \
            * self.m_di
        # geopotential gradient
        dmsf2 = 1.0 / (2.0 * self.dx * self.msfd)
        udyn = udyn - psdota[None] * (
            phi + shift(phi, -1, 0) - shift(phi, 0, -1)
            - shift(phi, -1, -1)) * dmsf2[None] * self.m_di
        vdyn = vdyn - psdota[None] * (
            phi + shift(phi, 0, -1) - shift(phi, -1, 0)
            - shift(phi, -1, -1)) * dmsf2[None] * self.m_di

        uten = udyn + uphy
        vten = vdyn + vphy
        if self.iboudy == 4:
            wd3 = self.spwd[None]
            uten = wd3 * uten + (1.0 - wd3) * bdy.ut
            vten = wd3 * vten + (1.0 - wd3) * bdy.vt
        uten = uten * self.m_di
        vten = vten * self.m_di

        # -- time filters (mod_timefilter.F90) ---------------------------
        # ps: RA filter (filter_ra_2d)
        dps = self.gnu1 * (psc + psb - 2.0 * psa)
        psb_n = jnp.where(self.m_ci > 0.5, psa + dps, psb)
        psa_n = jnp.where(self.m_ci > 0.5, psc, psa)
        # t: RA
        dtf = self.gnu1 * (tc + s.t_b - 2.0 * s.t_a)
        t_b_n = jnp.where(self.m_ci > 0.5, s.t_a + dtf, s.t_b)
        t_a_n = jnp.where(self.m_ci > 0.5, tc, s.t_a)
        # qv: RAW beta=0.53 with minqq floor (filter_raw_qv)
        beta = 0.53
        dq = self.gnu1 * (qvc + s.qx_b[IQV] - 2.0 * s.qx_a[IQV])
        qv_b_n = jnp.where(self.m_ci > 0.5,
                           jnp.maximum(s.qx_a[IQV] + beta * dq,
                                       c.minqq * psa),
                           s.qx_b[IQV])
        qv_a_n = jnp.where(self.m_ci > 0.5,
                           jnp.maximum(qvc + (beta - 1.0) * dq,
                                       c.minqq * psb),
                           s.qx_a[IQV])
        # qc..qs: RAW gnu2 low=0 (filter_raw_4d), batched over species
        dqcf = self.gnu2 * (qhc + s.qx_b[1:] - 2.0 * s.qx_a[1:])
        qh_b_n = jnp.where(self.m_ci > 0.5,
                           jnp.maximum(s.qx_a[1:] + beta * dqcf, 0.0),
                           s.qx_b[1:])
        qh_a_n = jnp.where(self.m_ci > 0.5,
                           jnp.maximum(qhc + (beta - 1.0) * dqcf, 0.0),
                           s.qx_a[1:])
        if self.ntr:
            # tracers: RAW filter like the hydrometeors (filter_raw on
            # atmx%chi, mod_tendency.F90:430-470)
            dchf = self.gnu2 * (chic + s.chi_b - 2.0 * s.chi_a)
            chi_b_n = jnp.where(self.m_ci > 0.5,
                                jnp.maximum(s.chi_a + beta * dchf, 0.0),
                                s.chi_b)
            chi_a_n = jnp.where(self.m_ci > 0.5,
                                jnp.maximum(chic + (beta - 1.0) * dchf,
                                            0.0),
                                s.chi_a)
        # u, v forecast + RA filter
        ucf = s.u_b + dt * uten
        vcf = s.v_b + dt * vten
        duf = self.gnu1 * (ucf + s.u_b - 2.0 * s.u_a)
        dvf = self.gnu1 * (vcf + s.v_b - 2.0 * s.v_a)
        u_b_n = jnp.where(self.m_di > 0.5, s.u_a + duf, s.u_b)
        u_a_n = jnp.where(self.m_di > 0.5, ucf, s.u_a)
        v_b_n = jnp.where(self.m_di > 0.5, s.v_a + dvf, s.v_b)
        v_a_n = jnp.where(self.m_di > 0.5, vcf, s.v_a)

        psa_n = fix_cross_pad(psa_n)
        psb_n = fix_cross_pad(psb_n)

        # -- split-explicit correction (mod_split.F90:243-480) -----------
        (psa_n, psb_n, t_a_n, t_b_n, u_a_n, u_b_n, v_a_n, v_b_n,
         dstor_n, hstor_n) = self._splitf(
            psa_n, psb_n, t_a_n, t_b_n, u_a_n, u_b_n, v_a_n, v_b_n,
            s.dstor, s.hstor)
        psa_n = fix_cross_pad(psa_n)
        psb_n = fix_cross_pad(psb_n)

        # -- bdyval: apply boundary ring values (mod_bdycod.F90:1109) ----
        xt2 = xt + dt
        # copy a-level edges into b-level, then set a-level edges to bdy
        ecm = self.e_call > 0.5
        edm = self.e_dall > 0.5
        psb_n = jnp.where(ecm, psa_n, psb_n)
        t_b_n = jnp.where(ecm, t_a_n, t_b_n)
        qv_b_n = jnp.where(ecm, qv_a_n, qv_b_n)
        qh_b_n = jnp.where(ecm, qh_a_n, qh_b_n)
        u_b_n = jnp.where(edm, u_a_n, u_b_n)
        v_b_n = jnp.where(edm, v_a_n, v_b_n)
        psa_n = jnp.where(ecm, bdy.ps0 + xt2 * bdy.pst, psa_n)
        t_a_n = jnp.where(ecm, bdy.t0 + xt2 * bdy.tt, t_a_n)
        qv_a_n = jnp.where(ecm, bdy.qv0 + xt2 * bdy.qvt, qv_a_n)
        u_a_n = jnp.where(edm, bdy.u0 + xt2 * bdy.ut, u_a_n)
        v_a_n = jnp.where(edm, bdy.v0 + xt2 * bdy.vt, v_a_n)
        psa_n = fix_cross_pad(psa_n)
        psb_n = fix_cross_pad(psb_n)
        # inflow/outflow edges (mod_bdycod.F90:1809+): hydrometeors
        # always (bdyflow); qv switched when iboudy is 3 or 4
        ucx = dot2cross(u_a_n)
        vcx = dot2cross(v_a_n)
        qh_a_n = self._flow_edges(qh_a_n, psa_n, ucx, vcx)
        if self.iboudy in (3, 4):
            qv_a_n = self._flow_edges(qv_a_n, psa_n, ucx, vcx,
                                      qext=qv_a_n)
        if self.ntr:
            # tracer boundary rings: copy a→b, set a to the CHBC value
            # (or clean air), inflow/outflow edges (chibdyflow)
            chb_edge = (bdy.chi0 + xt2 * bdy.chit) \
                if bdy.chi0 is not None else jnp.zeros_like(chi_a_n)
            chi_b_n = jnp.where(ecm, chi_a_n, chi_b_n)
            chi_a_n = jnp.where(ecm, chb_edge, chi_a_n)
            chi_a_n = self._flow_edges(chi_a_n, psa_n, ucx, vcx)

        qx_a = jnp.concatenate([qv_a_n[None], qh_a_n])
        qx_b = jnp.concatenate([qv_b_n[None], qh_b_n])

        # UW TCM prognostic TKE (ibltyp=2): advect/diffuse/forecast
        tkephy = sfupd.pop("_tkephy", None)
        if self.ibltyp == 2:
            tkedyn = self._tke_dyn(s, qdot, uavg1, uavg2, vavg1, vavg2,
                                   psa, xkc)
            tke_a_n, tke_b_n = self._tke_forecast(
                s, tkedyn, tkephy if tkephy is not None else 0.0,
                rpsa, dt)
            sfupd = dict(sfupd, tke_a=tke_a_n, tke_b=tke_b_n)

        if self.ntr:
            sfupd = dict(sfupd, chi_a=chi_a_n, chi_b=chi_b_n)
        ns = s._replace(
            ps_a=psa_n, ps_b=psb_n, u_a=u_a_n, u_b=u_b_n,
            v_a=v_a_n, v_b=v_b_n, t_a=t_a_n, t_b=t_b_n,
            qx_a=qx_a, qx_b=qx_b, dstor=dstor_n, hstor=hstor_n,
            heatrt=heatrt, **sfupd)
        diags = dict(
            pten=pten_n, omega=omega,
            tmax=jnp.max(jnp.where(self.m_ci > 0.5, tdec, 0.0)),
            psmax=jnp.max(jnp.where(self.m_ci > 0.5, psa_n, 0.0)),
            psmin=jnp.min(jnp.where(self.m_ci > 0.5, psa_n, 1e9)),
        )
        return ns, diags

    # ------------------------------------------------------------------
    @with_topology
    def step_nh(self, s: HydroState, bdy: BdyState, xt, dt,
                flags: StepFlags = StepFlags(), coszrs=None, solar=None
                ) -> Tuple[HydroState, Dict[str, jax.Array]]:
        """MM5 non-hydrostatic step (idynamic=2): the tend NH branches
        (mod_tendency.F90 decouple/compute_omega/adiabatic idynamic==2
        paths) + the semi-implicit acoustic solver (Main/mod_sound.F90).

        p* is the constant reference ps0−ptop; pp and w are prognostic.
        """
        from .sound import sound as nh_sound
        base = self.base
        g = self.grid
        kz, iy, jx = self.kz, g.iy, g.jx
        ptop = self.ptop

        psa = s.ps_a          # constant = base.ps0
        psb = s.ps_b
        rpsa = 1.0 / psa
        rpsb = 1.0 / psb
        psdota = cross2dot(psa)
        rpsda = 1.0 / psdota

        # decouple (mod_tendency decouple, NH parts :1040-1075)
        uc, vc = s.u_a, s.v_a
        umc = uc * self.msfd
        vmc = vc * self.msfd
        ud = uc * rpsda
        vd = vc * rpsda
        ub_bdy = (bdy.u0 + xt * bdy.ut) * rpsda
        vb_bdy = (bdy.v0 + xt * bdy.vt) * rpsda
        ud = jnp.where(self.e_d2 > 0.5, ub_bdy, ud)
        vd = jnp.where(self.e_d2 > 0.5, vb_bdy, vd)
        umd = ud * self.msfd
        vmd = vd * self.msfd
        tdec = s.t_a * rpsa
        qvdec = jnp.maximum(s.qx_a[IQV] * rpsa, c.minqq)
        qhdec = jnp.maximum(s.qx_a[1:] * rpsa, 0.0)
        qcdec = qhdec[0]
        tv = tdec * (1.0 + c.ep1 * qvdec)
        ppdec = s.pp_a * rpsa[None]
        wdec = s.w_a * rpsa[None]
        pr1 = base.pr0 + ppdec
        rho1 = pr1 / (c.rgas * jnp.maximum(tv, 100.0))
        # buoyancy factor (atmx%pr, mod_tendency.F90:1068-1071)
        bfac = (tv - base.t0 - ppdec / (c.cpd * base.rho0)) \
            / jnp.maximum(tdec, 100.0)

        # compute_omega NH (:1157-1195)
        ucc4 = umd + shift(umd, 0, 1) + shift(umd, 1, 0) + shift(umd, 1, 1)
        vcc4 = vmd + shift(vmd, 0, 1) + shift(vmd, 1, 0) + shift(vmd, 1, 1)
        qdot_i = (-base.rhof0[1:kz] * c.egrav * wdec[1:kz]
                  / (base.psfull[None] - ptop * 1000.0)
                  - self.sig3[1:kz] * (
                      base.dpsdxm[None] * (self.twt1[1:] * ucc4[1:]
                                           + self.twt2[1:] * ucc4[:-1])
                      + base.dpsdym[None] * (self.twt1[1:] * vcc4[1:]
                                             + self.twt2[1:] * vcc4[:-1])))
        qdot = jnp.concatenate(
            [jnp.zeros((1, iy, jx), self.dtype), qdot_i,
             jnp.zeros((1, iy, jx), self.dtype)], axis=0)
        rmsfx2 = 1.0 / (2.0 * self.dx * self.msfx ** 2)
        divh = ((shift(umc, 1, 1) + shift(umc, 0, 1)
                 - shift(umc, 1, 0) - umc)
                + (shift(vmc, 1, 1) + shift(vmc, 1, 0)
                   - shift(vmc, 0, 1) - vmc)) * rmsfx2
        div = (divh + (qdot[1:] - qdot[:kz]) * psa[None] / self.dsig3) \
            * self.m_c
        omega = -0.5 * c.egrav * base.rho0 * rpsb[None] \
            * (s.w_b[:kz] + s.w_b[1:]) * rpsb[None]

        # mkslice equivalents for physics (time b)
        psdotb = cross2dot(psb)
        ubd3 = s.u_b / psdotb
        vbd3 = s.v_b / psdotb
        ubx3 = dot2cross(ubd3)
        vbx3 = dot2cross(vbd3)
        tb3 = s.t_b * rpsb
        qvb3 = jnp.maximum(s.qx_b[IQV] * rpsb, c.minqq)
        qhb3 = jnp.maximum(s.qx_b[1:] * rpsb, 0.0)
        qcb3 = qhb3[0]
        ppb3 = s.pp_b * rpsb[None]
        pb3 = base.pr0 + ppb3
        pf3 = jnp.concatenate(
            [base.pf0[:1], base.pf0[1:kz]
             + 0.5 * (ppb3[:-1] + ppb3[1:]),
             (base.psfull + ppb3[kz - 1:kz])], axis=0)
        ps2d = base.psfull + ppb3[kz - 1]
        tvb3 = tb3 * (1.0 + c.ep1 * qvb3 - qcb3)
        rhob3 = pb3 / (c.rgas * jnp.maximum(tb3, 100.0))
        qsb3 = pfwsat(jnp.maximum(tb3, 100.0), pb3)
        rhb3 = jnp.clip(qvb3 / qsb3, self.rhmin, self.rhmax)
        dzq = (pf3[1:] - pf3[:-1]) / (rhob3 * c.egrav)
        zq = jnp.concatenate(
            [cumsum_mm(dzq, axis=0, reverse=True),
             jnp.zeros((1, iy, jx), self.dtype)], axis=0)
        za = 0.5 * (zq[:-1] + zq[1:])
        if coszrs is None:
            coszrs = jnp.zeros_like(psb)
        atms = dict(ubd3=ubd3, vbd3=vbd3, ubx3=ubx3, vbx3=vbx3, tb3=tb3,
                    qvb3=qvb3, qcb3=qcb3, qhb3=qhb3, tvb3=tvb3, pb3=pb3,
                    pf3=pf3, ps2d=ps2d, rhob3=rhob3, qsb3=qsb3, rhb3=rhb3,
                    za=za, zq=zq, dzq=dzq, psb=psb, psa=psa,
                    omega_pa=omega, qdot=qdot, rpsb=rpsb, coszrs=coszrs)
        if solar is not None:
            atms["eccf"], atms["solcon"] = solar[0], solar[1]
            if solar.shape[0] > 2:
                atms["mpos"] = solar[2]

        # diffusion coefficients (NH variant, mod_diffusion idyn/=1)
        dudx = (shift(ubd3, 1, 1) + shift(ubd3, 0, 1) - shift(ubd3, 1, 0)
                - ubd3)
        dvdx = (shift(vbd3, 1, 1) + shift(vbd3, 0, 1) - shift(vbd3, 1, 0)
                - vbd3)
        dudy = (shift(ubd3, 1, 0) + shift(ubd3, 1, 1) - ubd3
                - shift(ubd3, 0, 1))
        dvdy = (shift(vbd3, 1, 0) + shift(vbd3, 1, 1) - vbd3
                - shift(vbd3, 0, 1))
        wb3dec = s.w_b * rpsb[None]
        dwdz = wb3dec[:kz] - wb3dec[1:]
        duv = jnp.sqrt(jnp.maximum(
            (dudx - dvdy) ** 2 + (dvdx + dudy) ** 2 - dwdz ** 2, 0.0))
        xkc_raw = jnp.minimum(self.hgfact[None] + self.dydc * duv,
                              2.0 * self.xkhmax) * self.m_c
        xkc_raw = fix_cross_pad(xkc_raw)
        xkd = 0.25 * (xkc_raw + shifte(xkc_raw, -1, -1)
                      + shifte(xkc_raw, 0, -1) + shifte(xkc_raw, -1, 0))
        rdxsq = 1.0 / (self.dx * self.dx)
        if self.idiffu == 3:
            xkc = self.diff6 * psb[None] * jnp.ones_like(xkc_raw)
            xkd = self.diff6 * psdotb[None] * jnp.ones_like(xkc_raw)
        else:
            xkc = xkc_raw * rdxsq * psb[None]
            xkd = xkd * rdxsq * psdotb[None]
        xkcf = jnp.concatenate([xkc[:1], xkc], axis=0)

        # advection ------------------------------------------------------
        uavg1 = shift(umc, 1, 0) + umc
        uavg2 = shift(umc, 1, 1) + shift(umc, 0, 1)
        vavg1 = shift(vmc, 0, 1) + vmc
        vavg2 = shift(vmc, 1, 1) + shift(vmc, 1, 0)
        udyn, vdyn = self._advection_uv(umc, vmc, ud, vd, uc, vc, qdot)
        # T advection (ithadv=0 NH: exner-weighted interfaces on p0)
        tdyn0 = self._hadv_scalar(tdec, uavg1, uavg2, vavg1, vavg2,
                                  ps=psa)
        tdyn0 = self._stability_guard(tdyn0, tdec * psa[None], psa,
                                      "abs")
        ta = s.t_a
        rdphf = base.pr0 ** (-c.c287)
        rdplf = base.pf0[1:kz] ** c.c287
        dq_t = ta * rdphf
        fT = rdplf * qdot[1:kz] * (self.twt1[1:] * dq_t[1:]
                                   + self.twt2[1:] * dq_t[:-1])
        tdyn0 = tdyn0 + self._vadv_flux(fT, qdot)
        # qv / qc (same forms as hydrostatic; Kuo defers qv vadv, see
        # step())
        qvhadv = self._hadv_scalar(qvdec, uavg1, uavg2, vavg1, vavg2,
                                   ps=psa)
        qvhadv = self._stability_guard(qvhadv, qvdec, psa, "rel")
        qva = s.qx_a[IQV]
        ok = ((qva[1:] > c.minqq * psa[None])
              & (qva[:-1] > c.minqq * psa[None]))
        fgq = jnp.where(ok, qva[1:] * (qva[:-1]
                                       / jnp.maximum(qva[1:], 1e-30))
                        ** self.qcon[1:], 0.0)
        qv_vadv = self._vadv_flux(qdot[1:kz] * fgq, qdot)
        kuo_defer = (self.physics is not None
                     and getattr(self.physics, "kuo_defer", False))
        qvten = qvhadv if kuo_defer else qvhadv + qv_vadv
        qhten = self._hadv_scalar(qhdec, uavg1, uavg2, vavg1, vavg2,
                                  ps=psa)
        qhten = self._stability_guard(qhten, qhdec, psa, "rel")
        qha = s.qx_a[1:]
        fi = (self.twt1[1:] * qha[:, 1:]
              + self.twt2[1:] * qha[:, :-1])
        thr = c.minqq * c.minqq * psa[None]
        fqh = jnp.where(qdot[1:kz] > 0.0,
                        jnp.where(qha[:, :-1] > thr, qdot[1:kz] * fi, 0.0),
                        jnp.where(qha[:, 1:] > thr, qdot[1:kz] * fi, 0.0))
        qhten = qhten + self._vadv_flux(fqh, qdot)
        # pp advection (hadv ind=0 on decoupled + vadv ind=0 on coupled)
        ppdyn = self._hadv_scalar(ppdec, uavg1, uavg2, vavg1, vavg2)
        fpp = qdot[1:kz] * (self.twt1[1:] * s.pp_a[1:]
                            + self.twt2[1:] * s.pp_a[:-1])
        ppdyn = ppdyn + self._vadv_flux(fpp, qdot)
        # w advection (hadv ind=1: winds interpolated to interfaces;
        # vadv nk=kzp1 ind=0 half-level fluxes)
        wdyn = jnp.zeros_like(s.w_a)
        wdec_a = s.w_a * rpsa[None]
        ua1_i = self.twt1[1:] * uavg1[1:] + self.twt2[1:] * uavg1[:-1]
        ua2_i = self.twt1[1:] * uavg2[1:] + self.twt2[1:] * uavg2[:-1]
        va1_i = self.twt1[1:] * vavg1[1:] + self.twt2[1:] * vavg1[:-1]
        va2_i = self.twt1[1:] * vavg2[1:] + self.twt2[1:] * vavg2[:-1]
        wd_i = wdec_a[1:kz]
        fx1 = shift(wd_i, 0, -1) + wd_i
        fx2 = wd_i + shift(wd_i, 0, 1)
        fy1 = shift(wd_i, -1, 0) + wd_i
        fy2 = wd_i + shift(wd_i, 1, 0)
        wh = -self.xmapf[None] * (ua2_i * fx2 - ua1_i * fx1
                                  + va2_i * fy2 - va1_i * fy1) * self.m_ci
        wdyn = wdyn.at[1:kz].add(wh)
        # vertical flux of w at half levels (vadv3d ind=0 nk=kzp1,
        # Main/mod_advection.F90:754-766): interior interfaces K=1..kz-1
        # get (fx0[K-1] − fx0[K])·dds0[K]
        fx0 = 0.5 * (qdot[:kz] + qdot[1:]) * (s.w_a[:kz] + s.w_a[1:])
        dds_i = 1.0 / (self.dsig3[1:] + self.dsig3[:-1])   # K=1..kz-1
        wdyn = wdyn.at[1:kz].add((fx0[:-1] - fx0[1:]) * dds_i)

        # coriolis (NH curvature :1838-1876, simplified to H-Coriolis)
        udyn = udyn + self.coriol[None] * vc * self.m_di
        vdyn = vdyn - self.coriol[None] * uc * self.m_di

        # adiabatic NH (:1568-1680)
        thetadd = jnp.zeros_like(tdyn0)
        cpm = cpmf(qvdec)
        scr1 = 0.5 * c.egrav * base.rho0 * (s.w_a[:kz] + s.w_a[1:]) \
            * rpsa[None]
        tdyn = tdyn0 + (tdec * div
                        - (scr1 * psa[None] + ppdyn
                           + ppdec * div) / (rho1 * cpm)) * self.m_ci
        ppdyn = ppdyn + ppdec * div * self.m_ci
        qvten = qvten + qvdec * div * self.m_ci
        qhten = qhten + qhdec * div * self.m_ci
        # w buoyancy terms (:1620-1660)
        rofac_i = (self.dsig3[:-1] * base.rho0[1:]
                   + self.dsig3[1:] * base.rho0[:-1]) \
            / (self.dsig3[:-1] * rho1[1:] + self.dsig3[1:] * rho1[:-1])
        ucc4c = uc + shift(uc, 0, 1) + shift(uc, 1, 0) + shift(uc, 1, 1)
        vcc4c = vc + shift(vc, 0, 1) + shift(vc, 1, 0) + shift(vc, 1, 1)
        uaq = 0.25 * (self.twt1[1:] * ucc4c[1:] + self.twt2[1:] * ucc4c[:-1])
        vaq = 0.25 * (self.twt1[1:] * vcc4c[1:] + self.twt2[1:] * vcc4c[:-1])
        wbuoy = ((self.twt2[1:] * bfac[:-1] + self.twt1[1:] * bfac[1:])
                 * rofac_i * c.egrav * psa[None]
                 + (uaq ** 2 + vaq ** 2) * c.rearthrad * rpsa[None]
                 + wdec[1:kz] * (self.twt1[1:] * div[1:]
                                 + self.twt2[1:] * div[:-1]))
        # water loading
        wbuoy = wbuoy - c.egrav * psa[None] * (
            self.twt2[1:] * qcdec[:-1] + self.twt1[1:] * qcdec[1:])
        wdyn = wdyn.at[1:kz].add(wbuoy * self.m_ci)

        # boundary nudging (tdyn/qv/u/v like hydro, + pp, w)
        xtd = xt + dt
        tdyn = tdyn + self._nudge3(
            (bdy.t0 + xtd * bdy.tt) - s.t_b, self.nfc, self.ngc)
        qvten = qvten + self._nudge3(
            (bdy.qv0 + xtd * bdy.qvt) - s.qx_b[IQV], self.nfc, self.ngc)
        udyn = udyn + self._nudge3(
            (bdy.u0 + xtd * bdy.ut) - s.u_b, self.nfd, self.ngd, dot=True)
        vdyn = vdyn + self._nudge3(
            (bdy.v0 + xtd * bdy.vt) - s.v_b, self.nfd, self.ngd, dot=True)
        ppdyn = ppdyn + self._nudge3(-s.pp_b, self.nfc, self.ngc)
        wnud = self._nudge3(-s.w_b[1:kz], self.nfc[:kz - 1], self.ngc[:kz - 1])
        wdyn = wdyn.at[1:kz].add(wnud)

        # physics --------------------------------------------------------
        tphy = jnp.zeros_like(tdyn)
        qvphy = jnp.zeros_like(qvten)
        qhphy = jnp.zeros_like(qhten)
        uphy = jnp.zeros_like(udyn)
        vphy = jnp.zeros_like(vdyn)
        sfupd: Dict[str, jax.Array] = {}
        cldfra = jnp.zeros_like(tdyn)
        heatrt = s.heatrt
        if self.physics is not None:
            (tphy, qvphy, qhphy, uphy, vphy, cldfra,
             heatrt, sfupd) = self.physics(
                 self, atms, s, bdy, flags, dt,
                 dyn=dict(tdyn=tdyn, qvdyn=qvten, qvhadv=qvhadv,
                          qv_vadv=qv_vadv))
        tphy = tphy + psb[None] * heatrt * self.m_ci
        # pp heating tendency (xgamma·p0·Q/(cp·T0), mod_rad NH coupling)
        ppphy = (1.0 / (1.0 - c.rovcp)) * base.pr0 * heatrt \
            / jnp.maximum(base.t0, 100.0) * psb[None] * c.rcpd

        # diffusion ------------------------------------------------------
        udyn = udyn + self._diffu_dot(ubd3, xkd)
        vdyn = vdyn + self._diffu_dot(vbd3, xkd)
        tdyn = tdyn + self._diffu_cross(tb3, xkc)
        qvten = qvten + self._diffu_cross(qvb3, xkc)
        qhten = qhten + self._diffu_cross(qhb3, xkc)
        ppdyn = ppdyn + self._diffu_cross(ppb3, xkc)
        wdiff = self._diffu_cross(wb3dec, xkcf)
        wdyn = wdyn + wdiff

        tten = tdyn + tphy
        qvten_t = qvten + qvphy
        qhten_t = qhten + qhphy
        ppten_t = ppdyn + ppphy
        wten_t = wdyn
        uten = udyn + uphy
        vten = vdyn + vphy

        if self.cfg.physics.ipptls == 1:
            dtc, dqv, dqc = self._condtq(s, tten, qvten_t, qhten_t[0],
                                         psb, rpsb, cldfra, dt)
            tten = tten + dtc
            qvten_t = qvten_t + dqv
            qhten_t = qhten_t.at[0].add(dqc)
        if self.iboudy == 4:
            # sponge on total tendencies (mod_tendency.F90:1481-1499);
            # pp/w boundary fields are 0 → blend toward 0 tendency
            wc3 = self.spwc[None]
            wd3 = self.spwd[None]
            tten = wc3 * tten + (1.0 - wc3) * bdy.tt
            qvten_t = wc3 * qvten_t + (1.0 - wc3) * bdy.qvt
            qhten_t = wc3 * qhten_t
            uten = wd3 * uten + (1.0 - wd3) * bdy.ut
            vten = wd3 * vten + (1.0 - wd3) * bdy.vt
            ppten_t = wc3 * ppten_t
            wten_t = wc3 * wten_t      # (1,iy,jx) broadcasts over kz+1

        if getattr(self, "ifrayd", 0) == 1:
            # upper-level Rayleigh damping toward the BCs
            # (mod_tendency.F90:356-364, 465-477; tau at
            # mod_bdycod.F90:5115-5123), top min(kz, rayndamp) levels
            za = atms["za"]
            zq = atms["zq"]
            halfpi = 0.5 * jnp.pi
            def _tau(z, zmax):
                t_ = self.rayalpha0 * jnp.sin(
                    halfpi * (1.0 - (zmax - z) / self.rayhd)) ** 2
                return jnp.where(z > zmax - self.rayhd, t_, 0.0)
            nr = min(kz, self.rayndamp)
            km = (jnp.arange(kz) < nr).astype(za.dtype)[:, None, None]
            tau_c = _tau(za, za[0:1]) * km
            xt2 = xt + dt
            tten = tten + tau_c * ((bdy.t0 + xt2 * bdy.tt) - s.t_b)
            qvten_t = qvten_t + tau_c * (
                (bdy.qv0 + xt2 * bdy.qvt) - s.qx_b[IQV])
            # dot-point z: 4-point average (raydampuv :4966)
            zad = cross2dot(za)
            tau_d = _tau(zad, zad[0:1]) * km
            uten = uten + tau_d * ((bdy.u0 + xt2 * bdy.ut) - s.u_b)
            vten = vten + tau_d * ((bdy.v0 + xt2 * bdy.vt) - s.v_b)
            # pp/w boundary values are 0 (raydamp3f with d_zero)
            ppten_t = ppten_t - tau_c * s.pp_b
            kmq = (jnp.arange(kz + 1) < nr).astype(za.dtype)[:, None, None]
            tau_q = _tau(zq, zq[0:1]) * kmq
            wten_t = wten_t - tau_q * s.w_b

        # forecast t/qx + filters (t filter after sound's dp' correction
        # ordering is approximated: filter first, sound adjusts both)
        tc = s.t_b + dt * tten * self.m_ci
        qvc = s.qx_b[IQV] + dt * qvten_t * self.m_ci
        qhc = s.qx_b[1:] + dt * qhten_t * self.m_ci
        qvc = self._negfix(qvc)
        qhc = self._negfix(qhc)
        dtf = self.gnu1 * (tc + s.t_b - 2.0 * s.t_a)
        t_b_n = jnp.where(self.m_ci > 0.5, s.t_a + dtf, s.t_b)
        t_a_n = jnp.where(self.m_ci > 0.5, tc, s.t_a)
        beta = 0.53
        dq = self.gnu1 * (qvc + s.qx_b[IQV] - 2.0 * s.qx_a[IQV])
        qv_b_n = jnp.where(self.m_ci > 0.5,
                           jnp.maximum(s.qx_a[IQV] + beta * dq,
                                       c.minqq * psa), s.qx_b[IQV])
        qv_a_n = jnp.where(self.m_ci > 0.5,
                           jnp.maximum(qvc + (beta - 1.0) * dq,
                                       c.minqq * psb), s.qx_a[IQV])
        dqcf = self.gnu2 * (qhc + s.qx_b[1:] - 2.0 * s.qx_a[1:])
        qh_b_n = jnp.where(self.m_ci > 0.5,
                           jnp.maximum(s.qx_a[1:] + beta * dqcf, 0.0),
                           s.qx_b[1:])
        qh_a_n = jnp.where(self.m_ci > 0.5,
                           jnp.maximum(qhc + (beta - 1.0) * dqcf, 0.0),
                           s.qx_a[1:])

        # acoustic solver → new u/v/pp/w + dp' T corrections -------------
        from .sound import sound as _snd
        s_t = s._replace(t_a=t_a_n, t_b=t_b_n)
        u_c, v_c, pp_c, w_c, t_a_n, t_b_n = _snd(
            self, base, s_t, uten, vten, ppten_t, wten_t, tb3, qvb3, dt)
        # Asselin filters on sound outputs (mod_sound.F90:690-716)
        duf = self.gnu1 * (u_c + s.u_b - 2.0 * s.u_a)
        u_b_n = jnp.where(self.m_di > 0.5, s.u_a + duf, s.u_b)
        u_a_n = jnp.where(self.m_di > 0.5, u_c, s.u_a)
        dvf = self.gnu1 * (v_c + s.v_b - 2.0 * s.v_a)
        v_b_n = jnp.where(self.m_di > 0.5, s.v_a + dvf, s.v_b)
        v_a_n = jnp.where(self.m_di > 0.5, v_c, s.v_a)
        dpf = self.gnu1 * (pp_c + s.pp_b - 2.0 * s.pp_a)
        pp_b_n = jnp.where(self.m_ci > 0.5, s.pp_a + dpf, s.pp_b)
        pp_a_n = jnp.where(self.m_ci > 0.5, pp_c, s.pp_a)
        dwf = self.gnu2 * (w_c + s.w_b - 2.0 * s.w_a)
        w_b_n = jnp.where(self.m_ci[None] > 0.5, s.w_a + dwf, s.w_b)
        w_a_n = jnp.where(self.m_ci[None] > 0.5, w_c, s.w_a)

        # bdyval ---------------------------------------------------------
        xt2 = xt + dt
        ecm = self.e_call > 0.5
        edm = self.e_dall > 0.5
        t_b_n = jnp.where(ecm, t_a_n, t_b_n)
        qv_b_n = jnp.where(ecm, qv_a_n, qv_b_n)
        qh_b_n = jnp.where(ecm, qh_a_n, qh_b_n)
        u_b_n = jnp.where(edm, u_a_n, u_b_n)
        v_b_n = jnp.where(edm, v_a_n, v_b_n)
        pp_b_n = jnp.where(ecm, pp_a_n, pp_b_n)
        w_b_n = jnp.where(ecm, w_a_n, w_b_n)
        t_a_n = jnp.where(ecm, bdy.t0 + xt2 * bdy.tt, t_a_n)
        qv_a_n = jnp.where(ecm, bdy.qv0 + xt2 * bdy.qvt, qv_a_n)
        u_a_n = jnp.where(edm, bdy.u0 + xt2 * bdy.ut, u_a_n)
        v_a_n = jnp.where(edm, bdy.v0 + xt2 * bdy.vt, v_a_n)
        # inflow/outflow edges (mod_bdycod.F90:1809+)
        ucx = dot2cross(u_a_n)
        vcx = dot2cross(v_a_n)
        qh_a_n = self._flow_edges(qh_a_n, psa, ucx, vcx)
        if self.iboudy in (3, 4):
            qv_a_n = self._flow_edges(qv_a_n, psa, ucx, vcx,
                                      qext=qv_a_n)

        qx_a = jnp.concatenate([qv_a_n[None], qh_a_n])
        qx_b = jnp.concatenate([qv_b_n[None], qh_b_n])
        tkephy = sfupd.pop("_tkephy", None)
        if self.ibltyp == 2:
            tkedyn = self._tke_dyn(s, qdot, uavg1, uavg2, vavg1, vavg2,
                                   psa, xkc)
            tke_a_n, tke_b_n = self._tke_forecast(
                s, tkedyn, tkephy if tkephy is not None else 0.0,
                rpsa, dt)
            sfupd = dict(sfupd, tke_a=tke_a_n, tke_b=tke_b_n)
        ns = s._replace(
            u_a=u_a_n, u_b=u_b_n, v_a=v_a_n, v_b=v_b_n,
            t_a=t_a_n, t_b=t_b_n, qx_a=qx_a, qx_b=qx_b,
            pp_a=pp_a_n, pp_b=pp_b_n, w_a=w_a_n, w_b=w_b_n,
            heatrt=heatrt, **sfupd)
        diags = dict(
            wmax=jnp.max(jnp.abs(w_a_n * rpsb[None])),
            ppmax=jnp.max(jnp.abs(pp_a_n * rpsb[None])),
            tmax=jnp.max(jnp.where(self.m_ci > 0.5, tdec, 0.0)),
        )
        return ns, diags

    # ------------------------------------------------------------------
    def _flow_edges(self, q, ps, ucx, vcx, qext=None):
        """Inflow/outflow-dependent cross edge values
        (mod_bdycod.F90:1809-1948 qv with iboudy 3/4; :2155-2230
        hydrometeors always): inflow edges take the external value
        (or 0 for hydrometeors, qext=None), outflow edges extrapolate
        the decoupled interior value recoupled with the edge p*.
        ucx/vcx are 4-dot cross-averaged winds = windavg/4.

        q may carry leading batch axes (species), ellipsis-indexed.
        Periodic directions (band/CRM) have no flow edges."""
        iy, jx = q.shape[-2], q.shape[-1]
        rps = 1.0 / ps
        qdec = q * rps
        if not self.periodic_x:
            # west: cross col 0, interior col 1 (windavg > 0 inflow)
            ext = qext[..., 0] if qext is not None else 0.0
            val = jnp.where(ucx[:, :, 0] > 0.0, ext,
                            qdec[..., 1] * ps[:, 0])
            q = q.at[..., 0].set(val)
            # east: cross col jx-2, interior jx-3 (inflow if u < 0)
            ext = qext[..., jx - 2] if qext is not None else 0.0
            val = jnp.where(ucx[:, :, jx - 2] < 0.0, ext,
                            qdec[..., jx - 3] * ps[:, jx - 2])
            q = q.at[..., jx - 2].set(val)
        if not self.periodic_y:
            # south: cross row 0, interior 1 (inflow if v > 0)
            ext = qext[..., 0, :] if qext is not None else 0.0
            val = jnp.where(vcx[:, 0, :] > 0.0, ext,
                            qdec[..., 1, :] * ps[0, :])
            q = q.at[..., 0, :].set(val)
            # north: cross row iy-2, interior iy-3 (inflow if v < 0)
            ext = qext[..., iy - 2, :] if qext is not None else 0.0
            val = jnp.where(vcx[:, iy - 2, :] < 0.0, ext,
                            qdec[..., iy - 3, :] * ps[iy - 2, :])
            q = q.at[..., iy - 2, :].set(val)
        return q

    # ------------------------------------------------------------------
    def _nudge2d(self, diff):
        """nudge2d for ps (Main/mod_bdycod.F90:4597): F·Δ − G·∇²Δ using
        the level-kz coefficient maps."""
        fmap = self.nfc[-1]
        gmap = self.ngc[-1]
        lap = (shift(diff, 0, -1) + shift(diff, 0, 1)
               + shift(diff, -1, 0) + shift(diff, 1, 0) - 4.0 * diff)
        return (fmap * diff - gmap * lap) * self.m_ci

    def _nudge3(self, diff, fmap, gmap, dot=False):
        """nudge3d (Main/mod_bdycod.F90:4218-4406): tendency increment
        F(n,k)·Δ − G(n,k)·∇²Δ inside the relaxation zone."""
        lap = (shift(diff, 0, -1) + shift(diff, 0, 1)
               + shift(diff, -1, 0) + shift(diff, 1, 0) - 4.0 * diff)
        m = self.m_di if dot else self.m_ci
        return (fmap * diff - gmap * lap) * m

    def _diffu6(self, fflux, flim, xk, m):
        """idiffu=3 6th-order monotonic hyperdiffusion (diffu_*
        idiffu==3 branches, Main/mod_diffusion.F90:412-519,602-660 —
        WRF's Knievel et al. 2007 scheme): interface fluxes
        10·Δ1 − 5·Δ2 + Δ3, zeroed where the flux is up-gradient
        w.r.t. the map-factor-decoupled field ``flim`` (the
        reference's cross version limits on f/mpd while fluxing raw
        f, :637-651 — kept).  Edge handling via index clamping →
        ``shifte`` replication.  NOTE: the reference's own loops
        iterate a single row/column (``do j = jdi2, jdi2``,
        :421/:611) — an evident transcription bug of the WRF scheme,
        which applies everywhere; implemented here over the full
        interior as intended."""
        # one edge-replicating pad per field, then static slices —
        # the per-shift pad form (12 pads) trips an f32
        # fusion-emitter assert in both XLA:CPU and the TPU compiler.
        # Periodic axes (band/CRM topologies) wrap instead of
        # clamping, matching shift/shifte.
        from .stencil import _PX, _PY
        ny, nx = fflux.shape[-2], fflux.shape[-1]
        lead = [(0, 0)] * (fflux.ndim - 2)

        def padded(a):
            ay = jnp.pad(a, lead + [(3, 3), (0, 0)],
                         mode="wrap" if _PY else "edge")
            return jnp.pad(ay, lead + [(0, 0), (3, 3)],
                           mode="wrap" if _PX else "edge")

        ffp = padded(fflux)
        flp = padded(flim)

        def one_axis(dy, dx):
            def cut(a, n):
                y0 = 3 + n * dy
                x0 = 3 + n * dx
                return a[..., y0:y0 + ny, x0:x0 + nx]
            sh = lambda n: cut(ffp, n)
            sl = lambda n: cut(flp, n)
            fp1 = (10.0 * (sh(1) - sh(0)) - 5.0 * (sh(2) - sh(-1))
                   + (sh(3) - sh(-2)))
            fp1 = jnp.where(fp1 * (sl(1) - sl(0)) <= 0.0, 0.0, fp1)
            fp0 = (10.0 * (sh(0) - sh(-1)) - 5.0 * (sh(1) - sh(-2))
                   + (sh(2) - sh(-3)))
            fp0 = jnp.where(fp0 * (sl(0) - sl(-1)) <= 0.0, 0.0, fp0)
            return fp1 - fp0
        return xk * (one_axis(0, 1) + one_axis(1, 0)) * m

    def _diffu_cross(self, fdec, xkc):
        """diffu_x3d (Main/mod_diffusion.F90:539-660): idiffu=1
        4th-order interior / 2nd-order on the first interior ring;
        idiffu=2 single 9-point 4th-order operator (:592-601);
        idiffu=3 6th-order monotonic (_diffu6)."""
        if self.idiffu == 3:
            return self._diffu6(fdec, fdec / self.msfd, xkc,
                                self.m_ci)
        s1 = (shift(fdec, 0, 1) + shift(fdec, 0, -1)
              + shift(fdec, 1, 0) + shift(fdec, -1, 0))
        if self.idiffu == 2:
            sd = (shift(fdec, 1, 1) + shift(fdec, -1, -1)
                  + shift(fdec, -1, 1) + shift(fdec, 1, -1))
            return xkc * ((4.0 / 6.0) * s1 + (1.0 / 6.0) * sd
                          - (20.0 / 6.0) * fdec) * self.m_ci
        s2 = (shift(fdec, 0, 2) + shift(fdec, 0, -2)
              + shift(fdec, 2, 0) + shift(fdec, -2, 0))
        four = -xkc * (s2 - 4.0 * s1 + 12.0 * fdec)
        two = xkc * (s1 - 4.0 * fdec)
        ring = self.m_ci * (1.0 - self.m_ci2)
        return four * self.m_ci2 + two * ring

    def _diffu_dot(self, fdec, xkd):
        """diffu_d (Main/mod_diffusion.F90:280-440) applied to a
        decoupled dot field f/msfd; idiffu=2 uses the 9-point
        4th-order operator (:386-411); idiffu=3 6th-order monotonic
        on u/mpd (:412-519)."""
        fm = fdec / self.msfd
        if self.idiffu == 3:
            return self._diffu6(fm, fm, xkd, self.m_di)
        s1 = (shift(fm, 0, 1) + shift(fm, 0, -1)
              + shift(fm, 1, 0) + shift(fm, -1, 0))
        if self.idiffu == 2:
            sd = (shift(fm, 1, 1) + shift(fm, -1, -1)
                  + shift(fm, -1, 1) + shift(fm, 1, -1))
            return xkd * ((4.0 / 6.0) * s1 + (1.0 / 6.0) * sd
                          - (20.0 / 6.0) * fm) * self.m_di
        s2 = (shift(fm, 0, 2) + shift(fm, 0, -2)
              + shift(fm, 2, 0) + shift(fm, -2, 0))
        four = -xkd * (s2 - 4.0 * s1 + 12.0 * fm)
        two = xkd * (s1 - 4.0 * fm)
        ring = self.m_di * (1.0 - self.m_di2)
        return four * self.m_di2 + two * ring

    def _negfix(self, q):
        """Negative-water fix (mod_tendency.F90:383-393): replace negative
        values by 1% of the 3×3-neighborhood mean absolute value."""
        acc = jnp.zeros_like(q)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc = acc + jnp.abs(shift(q, dy, dx))
        repl = 0.01 * acc / 9.0
        return jnp.where((q < 0.0) & (self.m_ci > 0.5), repl, q)

    def _condtq(self, s, tten, qvten, qcten, psc, rpsc, cldfra, dt):
        """SUBEX saturation adjustment (condtq,
        Main/mod_micro_interface.F90:382-493)."""
        t_p1 = (s.t_b + dt * tten) * rpsc[None]
        qv_p1 = s.qx_b[IQV] + dt * qvten
        qc_p1 = s.qx_b[IQC] + dt * qcten
        qv_p1 = jnp.maximum(qv_p1, c.minqq * psc[None]) * rpsc[None]
        qc_p1 = jnp.where(qc_p1 < c.dlowval * psc[None], 0.0,
                          qc_p1) * rpsc[None]
        pres = (self.hsig3 * psc[None] + self.ptop) * 1000.0
        t_p1 = jnp.maximum(t_p1, 10.0)   # guard against dead cells
        qvs = pfwsat(t_p1, pres)
        wwlh = wlh(t_p1)
        r1 = 1.0 / (1.0 + wwlh * wwlh * qvs / (c.rwat * c.cpd * t_p1 ** 2))
        rhc = jnp.clip(qv_p1 / qvs, 0.0, 1.0)
        # rh0adj from cldfrac (mod_micro_interface.F90:368-371)
        rpsb = 1.0 / s.ps_b
        qvb3 = jnp.maximum(s.qx_b[IQV] * rpsb[None], c.minqq)
        pb3 = (self.hsig3 * s.ps_b[None] + self.ptop) * 1000.0
        tb3 = jnp.maximum(s.t_b * rpsb[None], 10.0)
        rh = jnp.clip(qvb3 / pfwsat(tb3, pb3), self.rhmin, self.rhmax)
        rh0adj = 1.0 - (1.0 - rh) / jnp.maximum((1.0 - cldfra) ** 2, 1e-10)
        rh0adj = jnp.clip(rh0adj, 0.0, 0.99999)
        # qv in the cloudy fraction forecast (approximate: qs at b + qv ten)
        qvc_cld = jnp.maximum(
            pfwsat(tb3, pb3) + dt * qvten * rpsc[None], 0.0)
        fccc = 1.0 - jnp.sqrt(jnp.clip((1.0 - rhc)
                                       / jnp.maximum(1.0 - rh0adj, 1e-10),
                                       0.0, None))
        fccc = jnp.clip(fccc, 0.0, 1.0)
        dqv = jnp.where((rhc < rh0adj) | (rhc > 0.99999),
                        self.conf * (qv_p1 - qvs),
                        self.conf * fccc * (qvc_cld - qvs))
        tmp1 = r1 * dqv
        exces = qc_p1 + tmp1
        tmp2 = jnp.where(exces >= 0.0, tmp1 / dt, -qc_p1 / dt)
        active = jnp.abs(tmp2) > c.dlowval
        tmp2 = jnp.where(active, tmp2, 0.0) * self.m_ci
        dqv_t = -psc[None] * tmp2
        dqc_t = psc[None] * tmp2
        dt_t = psc[None] * tmp2 * wwlh * c.rcpd
        return dt_t, dqv_t, dqc_t

    # ------------------------------------------------------------------
    def _mode_geopotential(self, t, ps):
        """delh per mode (mod_split.F90:341-408): const + slope·(ps-pd)
        + Σ_k tau(l,k)·T_k/ps."""
        tsum = jnp.einsum("nk,kyx->nyx", self.sp_tau, t) / ps[None]
        return (self.sp_hconst[:, None, None]
                + self.sp_hslope[:, None, None] * (ps - self.sp_pd)[None]
                + tsum)

    def _grad_dot(self, h):
        """Cross→dot gradient pair used by spstep (mod_split.F90:500-520):
        x-grad and y-grad at dot points / (2dx·msfx)."""
        fac = 1.0 / (2.0 * self.dx * self.msfx)
        gx = (h + shift(h, -1, 0) - shift(h, 0, -1)
              - shift(h, -1, -1)) * fac
        gy = (h + shift(h, 0, -1) - shift(h, -1, 0)
              - shift(h, -1, -1)) * fac
        return gx * self.m_di, gy * self.m_di

    def _div_cross(self, uu, vv):
        """Dot→cross divergence (mod_split.F90:312-320)."""
        d = ((shift(uu, 0, 1) + shift(uu, 1, 1) - uu - shift(uu, 1, 0))
             + (shift(vv, 1, 0) + shift(vv, 1, 1) - vv - shift(vv, 0, 1))
             ) / (2.0 * self.dx * self.msfx ** 2)
        return d * self.m_c

    def _splitf(self, psa, psb, t_a, t_b, u_a, u_b, v_a, v_b,
                dstor, hstor):
        """Split-explicit fast-mode correction (splitf + spstep,
        Main/mod_split.F90:243-670; Madala 1987). Static-unrolled
        substeps (aam = [4, 2] for nsplit=2 → 8/4 substeps)."""
        psdota = cross2dot(psa)
        d_f = self._mode_divergence(u_a, v_a)     # (nsplit, iy, jx)
        d_0 = self._mode_divergence(u_b, v_b)
        h_f = self._mode_geopotential(t_a, psa)
        h_0 = self._mode_geopotential(t_b, psb)
        deld1 = dstor - d_0
        deld3 = d_f - dstor
        delh1 = hstor - h_0
        delh3 = h_f - hstor
        dstor_n = d_0
        hstor_n = h_0

        edge = self.e_call > 0.5
        ddsum_l = []
        dhsum_l = []
        for ns in range(self.nsplit):
            aam = self.sp_aam[ns]
            dtau = self.sp_dtau[ns]
            m2 = 2 * aam
            hbar = float(self.sc.hbar[ns])
            fd = deld3[ns]
            fh = delh3[ns]
            d0 = deld1[ns]
            h0 = delh1[ns]
            ddsum = d0
            dhsum = h0

            def lstep(h):
                gx, gy = self._grad_dot(h)
                uu = gx * psdota * self.msfd
                vv = gy * psdota * self.msfd
                return self._div_cross(uu, vv)

            # first forward substep
            d1 = d0 - dtau * lstep(h0) + fd / m2
            h1 = h0 - dtau * hbar * d0 / psa + fh / m2
            h1 = jnp.where(edge, h0 * (aam - 1.0) / aam, h1)
            ddsum = ddsum + d1
            dhsum = dhsum + h1
            dm1, dcur, hm1, hcur = d0, d1, h0, h1
            # leapfrog substeps
            for _ in range(2, m2 + 1):
                dnew = dm1 - 2.0 * dtau * lstep(hcur) + fd / aam
                hnew = hm1 - 2.0 * dtau * hbar * dcur / psa + fh / aam
                hnew = jnp.where(edge, 2.0 * hcur - hm1, hnew)
                ddsum = ddsum + dnew
                dhsum = dhsum + hnew
                dm1, dcur, hm1, hcur = dcur, dnew, hcur, hnew
            ddsum_l.append(ddsum)
            dhsum_l.append(dhsum)
        ddsum = jnp.stack(ddsum_l)
        dhsum = jnp.stack(dhsum_l)

        # corrections (mod_split.F90:418-476)
        dps = jnp.einsum("n,nyx->yx", self.sp_an, ddsum)
        psa = psa - dps * self.m_ci
        psb = psb - self.gnu1 * dps * self.m_ci
        dtm = jnp.einsum("kn,nyx->kyx", self.sp_am, ddsum)
        t_a = t_a + dtm * self.m_ci
        t_b = t_b + self.gnu1 * dtm * self.m_ci
        fac = psdota / (2.0 * self.dx * self.msfd)
        gxs = []
        gys = []
        for ns in range(self.nsplit):
            h = dhsum[ns]
            gx = (h + shift(h, -1, 0) - shift(h, 0, -1)
                  - shift(h, -1, -1)) * fac
            gy = (h + shift(h, 0, -1) - shift(h, -1, 0)
                  - shift(h, -1, -1)) * fac
            gxs.append(gx)
            gys.append(gy)
        gx = jnp.stack(gxs)
        gy = jnp.stack(gys)
        dum = jnp.einsum("kn,nyx->kyx", self.sp_zmatx, gx)
        dvm = jnp.einsum("kn,nyx->kyx", self.sp_zmatx, gy)
        u_a = u_a - dum * self.m_di
        u_b = u_b - self.gnu1 * dum * self.m_di
        v_a = v_a - dvm * self.m_di
        v_b = v_b - self.gnu1 * dvm * self.m_di
        return (psa, psb, t_a, t_b, u_a, u_b, v_a, v_b,
                dstor_n, hstor_n)

    def _mode_divergence(self, u, v):
        """Project divergence of coupled winds onto split modes
        (mod_split.F90:270-300): (nsplit, iy, jx)."""
        uu = u * self.msfd[None]
        vv = v * self.msfd[None]
        ddiv = ((shift(uu, 0, 1) + shift(uu, 1, 1) - uu - shift(uu, 1, 0))
                + (shift(vv, 1, 0) + shift(vv, 1, 1) - vv
                   - shift(vv, 0, 1))) / (2.0 * self.dx
                                          * self.msfx[None] ** 2)
        ddiv = ddiv * self.m_c
        return jnp.einsum("nk,kyx->nyx", self.sp_zmatxr, ddiv)

    @with_topology
    def init_split_storage(self, s: HydroState):
        """Initial dstor/hstor from the b-level state (spinit,
        Main/mod_split.F90:180-240)."""
        dstor = self._mode_divergence(s.u_b, s.v_b)
        hstor = self._mode_geopotential(s.t_b, s.ps_b)
        return s._replace(dstor=dstor, hstor=hstor)
