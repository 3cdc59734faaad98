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
    # surface / physics persistent state (uncoupled; the MOLOCH analogue
    # of the sfs/heatrt arrays shared with the physics stack,
    # Main/mod_moloch.F90:1386 physical_parametrizations)
    tg: jax.Array        # ground temperature (K)
    rainnc: jax.Array    # accumulated large-scale precip (kg/m2)
    rainc: jax.Array     # accumulated convective precip (kg/m2)
    heatrt: jax.Array    # radiative heating rate (K/s), (kz, iy, jx)
    qfx: jax.Array       # surface moisture flux (kg/m2/s)
    hfx: jax.Array       # surface sensible heat flux (W/m2)
    uvdrag: jax.Array    # surface drag coefficient ρ·Cd·V
    swsfc: jax.Array     # absorbed shortwave at surface (W/m2)
    lwsfc: jax.Array     # net downward longwave at surface (W/m2)
    cbmf: jax.Array      # Emanuel cloud-base mass flux memory
    cldefi: jax.Array    # Betts-Miller cloud efficiency memory
    cuten: jax.Array     # held cumulus tendencies (9, kz, iy, jx)
    cuprate: jax.Array   # held convective precip rate
    wavg: jax.Array      # KF trigger running-mean w (avg_ww)
    # full surface/physics pack, same layouts as HydroState (MOLOCH
    # surface parity: BATS1e/lake/ice run the same schemes here —
    # mod_moloch.F90:1386 calls the identical surface_model stack)
    bats: jax.Array      # (10, iy, jx) BATS1e land pack
    seaice: jax.Array    # (4, iy, jx)
    dcsst: jax.Array     # (3, iy, jx)
    tlak: jax.Array      # (nlak, iy, jx) Hostetler profile
    lakhi: jax.Array
    lakice: jax.Array
    laksnow: jax.Array
    laksnag: jax.Array
    # MYJ per-layer TKE (atms%tkepbl; not advected) + surface layer state
    tke_a: jax.Array     # (kz+1, iy, jx)
    pbl0: jax.Array      # (2, iy, jx)
    # CCM3 LW absorptivity/emissivity cache (dtabem alarm; flat leading
    # axis like HydroState): ((kz+1)², iy, jx), (4·kz, iy, jx),
    # (kz+1, iy, jx)
    abstot: jax.Array
    absnxt: jax.Array
    emstot: jax.Array
    # chemistry tracers (chemt of mod_moloch; uncoupled mixing ratios,
    # (ntr, kz, iy, jx), advected by the WAF pass). Named chi_b so the
    # shared PhysicsSuite/chem code reads the same attribute on both
    # cores (MOLOCH has no leapfrog b level; this IS the state).
    chi_b: jax.Array
    chemdiag: jax.Array  # (3, ntr, iy, jx) emission/drydep/wetdep kg/m²


class MolochBdy(NamedTuple):
    """MOLOCH lateral boundary pairs (xtb/xqb/xub/xvb/xpaib of
    Main/mod_atm_interface.F90:39-60, uncoupled fields; b0 + t·bt)."""
    pai0: jax.Array
    pait: jax.Array
    t0: jax.Array
    tt: jax.Array
    qv0: jax.Array
    qvt: jax.Array
    u0: jax.Array
    ut: jax.Array
    v0: jax.Array
    vt: jax.Array


def zeros_moloch_phys(kz: int, iy: int, jx: int, dtype=jnp.float64,
                      nlak: int = 1, ntr: int = 0):
    """Zero-initialized physics/surface fields for MolochState."""
    z2 = jnp.zeros((iy, jx), dtype)
    z3 = jnp.zeros((kz, iy, jx), dtype)
    return dict(tg=z2, rainnc=z2, rainc=z2, heatrt=z3, qfx=z2, hfx=z2,
                uvdrag=z2, swsfc=z2, lwsfc=z2, cbmf=z2,
                cldefi=jnp.full((iy, jx), 0.6, dtype),
                cuten=jnp.zeros((9, kz, iy, jx), dtype),
                cuprate=z2, wavg=z3,
                bats=jnp.zeros((10, iy, jx), dtype),
                seaice=jnp.zeros((4, iy, jx), dtype),
                dcsst=jnp.zeros((3, iy, jx), dtype),
                tlak=jnp.zeros((nlak, iy, jx), dtype),
                lakhi=jnp.full((iy, jx), 0.01, dtype),
                lakice=z2, laksnow=z2, laksnag=z2,
                tke_a=jnp.full((kz + 1, iy, jx), 1.0e-3, dtype),
                pbl0=jnp.zeros((2, iy, jx), dtype),
                abstot=jnp.zeros(((kz + 1) * (kz + 1), iy, jx), dtype),
                absnxt=jnp.zeros((4 * kz, iy, jx), dtype),
                emstot=jnp.zeros((kz + 1, iy, jx), dtype),
                chi_b=jnp.zeros((ntr, kz, iy, jx), dtype),
                chemdiag=jnp.zeros((3, ntr, iy, jx), dtype))


class MolochCore:
    """MOLOCH integration engine (compile-time constants + pure step)."""

    def __init__(self, grid: ModelGrid, cfg: RegCMConfig,
                 dtype=jnp.float64, physics=None):
        self.grid = grid
        self.cfg = cfg
        self.dtype = dtype
        self.physics = physics
        f = lambda x: jnp.asarray(x, dtype)
        g = grid
        kz, iy, jx = g.kz, g.iy, g.jx
        self.kz, self.iy, self.jx = kz, iy, jx
        self.dx = float(g.ds)
        self.dtsec = cfg.dtsec
        self.nadv = cfg.moloch.mo_nadv
        # Pallas hot-path kernels on TPU (extras pallas=0 opts out).
        # Multi-device runs must register their mesh via set_mesh():
        # a plain pallas_call under a GSPMD-sharded jit does not
        # partition, so with a mesh the shard_map-wrapped kernels
        # (pallas_kernels.waf_advect_sharded / tridiag_w_sharded,
        # explicit ppermute halos) are used instead.
        from .pallas_kernels import tpu_available
        self.use_pallas = bool(int(cfg.physics.extras.get(
            "pallas", 1))) and tpu_available()
        # per-kernel opt-outs (diagnostics / fault isolation)
        self.use_pallas_tridiag = self.use_pallas and bool(int(
            cfg.physics.extras.get("pallas_tridiag", 1)))
        self.use_pallas_waf = self.use_pallas and bool(int(
            cfg.physics.extras.get("pallas_waf", 1)))
        self.mesh = None
        self._waf_k3 = None       # dt-free WAF coefficients (lazy)
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

        # every-step smoother coefficients (mod_moloch.F90:217-219)
        self.nupait = 1.0 / self.nadv
        self.nuwind = 1.0 / self.nsound
        self.nuqx = 0.5 * self.nuwind

        # physics contract shared with PhysicsSuite (the attributes the
        # suite reads off `core`; MOLOCH prognostics are uncoupled so the
        # coupling factor it passes is 1)
        self.nqx = 5 if cfg.physics.ipptls in (2, 3) else 2
        if cfg.physics.ichem:
            from ..chem.species import build_species
            self.ntr = build_species(cfg.chem.chemsimtype).ntr
        else:
            self.ntr = 0
        # interface interpolation weights for the chem settling flux
        # (twt of mod_vertint; shared contract with the chem module)
        twt = np.asarray(g.twt)
        self.twt1 = f(twt[:, 0])[:, None, None]
        self.twt2 = f(twt[:, 1])[:, None, None]
        self.ptop = 0.0                      # Kuo p* convention (unused)
        self.grid_lndocn = f(g.lndocn)
        self.sst = jnp.full((iy, jx), 288.0, dtype)
        self.coriol = f(g.coriol)
        self.m_di = self.m_u                 # only used by B-grid paths
        sx = cfg.subex
        lndm = f(g.lndocn)
        self.qck1 = jnp.where(lndm > 0.5, sx.qck1land, sx.qck1oce)
        self.cgul = jnp.where(lndm > 0.5, sx.gulland, sx.guloce)
        self.cevap = jnp.where(lndm > 0.5, sx.cevaplnd, sx.cevapoce)
        self.caccr = jnp.where(lndm > 0.5, sx.caccrlnd, sx.caccroce)
        self.rh0 = jnp.where(lndm > 0.5, sx.rh0land, sx.rh0oce)
        self.rhmax = sx.rhmax
        self.rhmin = 0.01
        self.conf = sx.conf

        # upper Rayleigh damping toward boundary values (moraydamp,
        # Main/mod_bdycod.F90 + tau :5115; ramps over rayhd below the top)
        dxp = cfg.dyn.extras
        self.ifrayd = int(dxp.get("ifrayd", 1))
        self.rayalpha0 = float(dxp.get("rayalpha0", 3.0e-4))
        self.rayhd = float(dxp.get("rayhd", 1.0e4))
        zeta_np = np.stack([md_zeta_h(zitah[k], orog, self.a0, self.b0)
                            for k in range(kz)])
        ztop = zeta_np[0]
        ramp = lambda z: np.where(
            z > ztop - self.rayhd,
            self.rayalpha0
            * np.sin(0.5 * np.pi
                     * (1.0 - (ztop - z) / self.rayhd)) ** 2, 0.0)
        self.raytau = f(ramp(zeta_np))              # cross centers
        zeta_u = 0.5 * (zeta_np + np.roll(zeta_np, 1, axis=2))
        zeta_v = 0.5 * (zeta_np + np.roll(zeta_np, 1, axis=1))
        ztop_u = zeta_u[0]
        ztop_v = zeta_v[0]
        self.raytau_u = f(np.where(
            zeta_u > ztop_u - self.rayhd,
            self.rayalpha0 * np.sin(0.5 * np.pi * (
                1.0 - (ztop_u - zeta_u) / self.rayhd)) ** 2, 0.0))
        self.raytau_v = f(np.where(
            zeta_v > ztop_v - self.rayhd,
            self.rayalpha0 * np.sin(0.5 * np.pi * (
                1.0 - (ztop_v - zeta_v) / self.rayhd)) ** 2, 0.0))

    # ------------------------------------------------------------------
    def set_mesh(self, mesh):
        """Register the device mesh for multi-chip runs.  With >1
        device the Pallas hot-path kernels switch to their shard_map
        wrappers (explicit ppermute halos) — a bare pallas_call under
        GSPMD would silently all-gather the domain into every chip."""
        self.mesh = mesh
        return self

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
        qx = jnp.concatenate(
            [f(qv)[None], jnp.zeros((self.nqx - 1, kz, iy, jx),
                                    self.dtype)])
        nlak = int(self.cfg.physics.extras.get("lake_ndpmax", 100)) \
            if self.cfg.physics.lakemod == 1 else 1
        phys = zeros_moloch_phys(kz, iy, jx, self.dtype, nlak=nlak,
                                 ntr=self.ntr)
        phys["tg"] = f(t[kz - 1])
        return MolochState(u=z3, v=z3,
                           w=jnp.zeros((kz + 1, iy, jx), self.dtype),
                           pai=f(pai), t=f(t), qx=qx, **phys)

    # ------------------------------------------------------------------
    def fields_from_sigma(self, ps, t, qv, u, v, sigma_f):
        """ICBC fields on sigma-p half levels → MOLOCH zita levels
        (the mod_init idynamic=3 path: height interpolation +
        hydrostatic pai via paicompute, Main/mod_bdycod.F90:5125).

        ps in Pa (full surface pressure), t/qv/u/v (kz_src, iy, jx) on
        sigma half levels (top→bottom), sigma_f (kz_src+1,) interfaces.
        Returns dict(pai, t, qv, u, v) on the core's grid (u/v at
        C-grid faces). Runs once per boundary input — plain numpy."""
        ps = np.asarray(ps, np.float64)
        t = np.asarray(t, np.float64)
        qv = np.asarray(qv, np.float64)
        ptop = float(self.grid.ptop) * 1000.0          # Pa
        sf = np.asarray(sigma_f, np.float64)[:, None, None]
        pf = sf * (ps[None] - ptop) + ptop             # (kzs+1, iy, jx)
        tv = t * (1.0 + c.ep1 * qv)
        # hypsometric heights above ground at half levels
        dz_lay = c.rgas * tv / c.egrav * np.log(pf[1:] / pf[:-1])
        zf = np.zeros_like(pf)
        zf[:-1] = np.cumsum(dz_lay[::-1], axis=0)[::-1]
        za_src = 0.5 * (zf[:-1] + zf[1:])              # above ground
        za_dst = np.asarray(self.zeta)                 # above ground
        kzs = za_src.shape[0]
        src_z = za_src[::-1]                    # ascending in height
        dst_z = za_dst[::-1]
        idx = np.sum(src_z[None] <= dst_z[:, None], axis=1)
        idx = np.clip(idx, 1, kzs - 1)
        lo, hi = idx - 1, idx
        zlo = np.take_along_axis(src_z, lo, 0)
        zhi = np.take_along_axis(src_z, hi, 0)
        wgt = np.clip((dst_z - zlo) / np.maximum(zhi - zlo, 1e-9),
                      0.0, 1.0)
        def vinterp(fld):
            # linear in height, clamped at the profile ends (vectorized
            # over all columns at once)
            src_f = np.asarray(fld, np.float64)[::-1]
            flo = np.take_along_axis(src_f, lo, 0)
            fhi = np.take_along_axis(src_f, hi, 0)
            return (flo + wgt * (fhi - flo))[::-1]
        t_m = vinterp(t)
        qv_m = np.maximum(vinterp(qv), c.minqq)
        u_m = vinterp(np.asarray(u, np.float64))
        v_m = vinterp(np.asarray(v, np.float64))
        pai = self.paicompute(ps, t_m, qv_m)
        f = lambda x: jnp.asarray(x, self.dtype)
        uf, vf = self.x2uvstag(f(u_m), f(v_m))
        return dict(pai=f(pai), t=f(t_m), qv=f(qv_m), u=uf, v=vf)

    def paicompute(self, ps, t, qv):
        """Hydrostatic Exner initialization (paicompute,
        Main/mod_bdycod.F90:5125-5155): lowest level from ps extrapolated
        over the surface half layer, then upward quadratic recursion."""
        kz = self.kz
        t = np.asarray(t, np.float64)
        qv = np.asarray(qv, np.float64)
        fmzf = np.asarray(self.fmzf, np.float64)
        ht = np.asarray(self.ht, np.float64)           # geopotential
        zz1 = -c.egrav * HZITA * bzita(0.5 * self.dz, self.b0) \
            * math.log(1.0 - 0.5 * self.dz / HZITA)
        zdelta = ht * (gzita(0.5 * self.dz, self.a0) - 1.0) + zz1
        tvk = t[kz - 1] * (1.0 + c.ep1 * qv[kz - 1])
        p_low = np.asarray(ps, np.float64) \
            * np.exp(-zdelta / (c.rgas * tvk))
        pai = np.empty((kz,) + p_low.shape, np.float64)
        pai[kz - 1] = (p_low / c.stdp) ** c.rovcp
        for k in range(kz - 2, -1, -1):
            tv1 = t[k] * (1.0 + c.ep1 * qv[k])
            tv2 = t[k + 1] * (1.0 + c.ep1 * qv[k + 1])
            zb = 2.0 * c.egrav * self.dz / (fmzf[k + 1] * c.cpd) \
                + tv1 - tv2
            zdel = np.sqrt(zb ** 2 + 4.0 * tv2 * tv1)
            pai[k] = -pai[k + 1] / (2.0 * tv2) * (zb - zdel)
        return pai

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
            if self.use_pallas_tridiag:
                # fused up/down Thomas sweeps with the column in VMEM
                # (pallas_kernels.tridiag_w) — one HBM round trip
                # instead of the two scans' operand materializations
                from .pallas_kernels import tridiag_w, tridiag_w_sharded
                if self.mesh is not None and self.mesh.devices.size > 1:
                    w_new_int = tridiag_w_sharded(self.mesh, wexpl,
                                                  zm, zp, w[kz])
                else:
                    w_new_int = tridiag_w(wexpl, zm, zp, w[kz])
            else:
                # upward sweep: K = kz-1 .. 1 (0-based interfaces)
                def up_body(carry, K):
                    w_kp1, wwkw_kp1 = carry
                    i = K - 1                   # index into (kz-1) arrays
                    zrapp = 1.0 / (1.0 + zm[i] + zp[i]
                                   - zm[i] * wwkw_kp1)
                    w_k = zrapp * (wexpl[i] + zm[i] * w_kp1)
                    wwkw_k = zrapp * zp[i]
                    return (w_k, wwkw_k), (w_k, wwkw_k)

                init = (w[kz], jnp.zeros_like(w[kz]))
                _, (w_prov_r, wwkw_r) = jax.lax.scan(
                    up_body, init, jnp.arange(kz - 1, 0, -1))
                w_prov = jnp.flip(w_prov_r, axis=0)  # ifaces 1..kz-1
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

    def couple_uvten(self, utenx, vtenx, cpl):
        """Cross-point physics wind tendencies → C-grid faces
        (tenxtouvten, Main/mpplib/mod_mppparam.F90:13524-13580): 4th-order
        interpolation in the face-normal direction; MOLOCH prognostics
        are uncoupled so no p* factor. Interior faces only (the edge
        2nd-order rows are masked off with the face-interior masks)."""
        u = 0.5625 * (utenx + shifte(utenx, 0, -1)) \
            - 0.0625 * (shifte(utenx, 0, 1) + shifte(utenx, 0, -2))
        v = 0.5625 * (vtenx + shifte(vtenx, -1, 0)) \
            - 0.0625 * (shifte(vtenx, 1, 0) + shifte(vtenx, -2, 0))
        return u * self.m_u, v * self.m_v

    # ------------------------------------------------------------------
    def mkslice(self, t, pai, qx, u, v, w):
        """Physics-ready fields (init_slice MOLOCH aliases,
        Main/mod_slice.F90:49-99 + the idynamic=3 branch :107-167).

        Returns the same `atms` dict contract as the hydrostatic core's
        in-step mkslice, with cpl=1 (uncoupled tendencies)."""
        kz = self.kz
        qv = jnp.maximum(qx[0], c.minqq)
        qh = jnp.maximum(qx[1:], 0.0)
        qc = qh[0]
        qcond = jnp.sum(qh, axis=0)
        tvirt = t * (1.0 + c.ep1 * qv - qcond)
        p = pai ** c.cpovr * c.stdp
        rho = p / (c.rgas * t)
        # surface pressure (mod_moloch.F90:374-381): extrapolate the
        # lowest-layer virtual temperature over the half-layer to z=0
        zz1 = -c.egrav * HZITA * bzita(0.5 * self.dz, self.b0) \
            * math.log(1.0 - 0.5 * self.dz / HZITA)
        # self.ht is geopotential (m²/s²) like mddom%ht
        zdgz = self.ht * (gzita(0.5 * self.dz, self.a0) - 1.0) + zz1
        ps = p[kz - 1] * jnp.exp(zdgz / (c.rgas * tvirt[kz - 1]))
        # interface pressures (mkslice :109-116)
        pf_int = c.stdp * (0.5 * (pai[1:] + pai[:-1])) ** c.cpovr
        pf3 = jnp.concatenate(
            [jnp.full((1,) + ps.shape, 100.0, self.dtype),
             pf_int, ps[None]], axis=0)
        qsb3 = pfwsat(t, p)
        rhb3 = jnp.clip(qv / qsb3, 0.01, 1.0)
        ux, vx = self.uvstag2x(u, v)
        dzq = self.zetaf[:-1] - self.zetaf[1:]
        return dict(
            ubd3=ux, vbd3=vx, ubx3=ux, vbx3=vx, tb3=t, qvb3=qv, qcb3=qc,
            qhb3=qh, tvb3=tvirt, pb3=p, pf3=pf3, ps2d=ps, rhob3=rho,
            qsb3=qsb3, rhb3=rhb3,
            za=self.zeta, zq=self.zetaf, dzq=dzq,
            # coupling factor 1 (uncoupled MOLOCH prognostics) and a
            # p*-like field in cb for the schemes that want it
            cpl=jnp.ones_like(ps), psb=ps * 1e-3,
            psa=ps * 1e-3, rpsb=jnp.ones_like(ps),
            omega_pa=-0.5 * c.egrav * rho * (w[:kz] + w[1:]),
            qdot=jnp.zeros_like(w), coszrs=jnp.zeros_like(ps))

    def _condtq(self, t, qx, p, tten, qxten, cldfra, dt):
        """SUBEX saturation adjustment, MOLOCH branch (condtq,
        Main/mod_micro_interface.F90:395-493 idynamic==3 path):
        provisional forecast with the accumulated physics tendencies,
        condensation/evaporation increments returned uncoupled."""
        from ..utils.thermo import wlh
        qv = jnp.maximum(qx[0], c.minqq)
        t_p1 = jnp.maximum(t + dt * tten, 10.0)
        qv_p1 = jnp.maximum(qx[0] + dt * qxten[0], c.minqq)
        qc_p1 = jnp.maximum(qx[1] + dt * qxten[1], 0.0)
        qvs = pfwsat(t_p1, p)
        wwlh = wlh(t_p1)
        r1 = 1.0 / (1.0 + wwlh * wwlh * qvs
                    / (c.rwat * c.cpd * t_p1 ** 2))
        rhc = jnp.clip(qv_p1 / qvs, 0.0, 1.0)
        rh = jnp.clip(qv / pfwsat(jnp.maximum(t, 10.0), p),
                      self.rhmin, self.rhmax)
        rh0adj = 1.0 - (1.0 - rh) / jnp.maximum((1.0 - cldfra) ** 2,
                                                1e-10)
        rh0adj = jnp.clip(rh0adj, 0.0, 0.99999)
        qvc_cld = jnp.maximum(pfwsat(jnp.maximum(t, 10.0), p)
                              + dt * qxten[0], 0.0)
        fccc = 1.0 - jnp.sqrt(jnp.clip(
            (1.0 - rhc) / jnp.maximum(1.0 - rh0adj, 1e-10), 0.0, None))
        fccc = jnp.clip(fccc, 0.0, 1.0)
        dqv = jnp.where((rhc < rh0adj) | (rhc > 0.99999),
                        self.conf * (qv_p1 - qvs),
                        self.conf * fccc * (qvc_cld - qvs))
        tmp1 = r1 * dqv
        exces = qc_p1 + tmp1
        tmp2 = jnp.where(exces >= 0.0, tmp1 / dt, -qc_p1 / dt)
        tmp2 = jnp.where(jnp.abs(tmp2) > c.dlowval, tmp2, 0.0) \
            * self.m_ci
        return tmp2 * wwlh * c.rcpd, -tmp2, tmp2

    # ------------------------------------------------------------------
    def step(self, st: MolochState, bdy=None, xt=0.0, dt=None,
             flags=None, coszrs=None, solar=None
             ) -> Tuple[MolochState, Dict[str, jax.Array]]:
        """One MOLOCH model step (moloch, mod_moloch.F90:224-480):
        acoustic/advection substeps → decouple → mkslice → physics
        (physical_parametrizations :1386) → boundary nudge + raydamp →
        every-step filters (filtuv/filtt/filtq :571-707).

        `dt` is accepted for driver-signature uniformity but MOLOCH is
        forward-in-time: the step length is always cfg dtsec."""
        kz = self.kz
        dtsec = self.dtsec
        dtstepa = dtsec / self.nadv
        dtsound = dtstepa / self.nsound
        if isinstance(bdy, dict):
            bdy = MolochBdy(**bdy)

        u, v, w = st.u, st.v, st.w
        pai, t = st.pai, st.t
        qx = st.qx
        qv = jnp.maximum(qx[0], c.minqq)
        qcond = jnp.sum(jnp.maximum(qx[1:], 0.0), axis=0)
        p = pai ** c.cpovr * c.stdp
        qsat = pfwsat(t, p)
        tvirt = t * (1.0 + c.ep1 * qv - qcond)
        tetav = tvirt / pai

        chi = st.chi_b
        # Pallas WAF + the CCM3 radiation stage co-resident in one
        # executable trips a runtime kernel fault on TPU v5e for
        # jx >= 144 (UNAVAILABLE device error at dispatch; bisected:
        # tridiag_w+rad is clean, waf+rad faults, waf alone at 192 is
        # clean). Radiation-bearing step variants (1/nrad cadence)
        # therefore take the XLA _wafone path — ~4 ms extra once per
        # rad alarm, < 0.1 ms/step amortized.
        use_pallas_waf = self.use_pallas_waf and not (
            flags is not None and getattr(flags, "do_rad", False))
        for _ in range(self.nadv):
            u, v, w, pai, s = self._sound(u, v, w, pai, tetav, qv, qsat,
                                          dtsound)
            # advection of all fields (advection, :1042-1095) — one
            # vmapped WAF pass batched over {θv, π, ux, vx, wx, qx,
            # chem tracers} (a single fused kernel instead of nf
            # sequential passes)
            ux, vx = self.uvstag2x(u, v)
            wx = self.wstag2x(w)
            parts = [tetav[None], pai[None], ux[None], vx[None],
                     wx[None], qx]
            if self.ntr:
                parts.append(chi)
            fields = jnp.concatenate(parts, axis=0)
            if use_pallas_waf:
                # fused 3-sweep WAF kernel over the whole field stack
                # (pallas_kernels.waf_advect): halo windows in VMEM,
                # one HBM round trip per field instead of the ~10
                # materialized temporaries per sweep
                from .pallas_kernels import waf_advect, \
                    waf_advect_sharded
                if self.mesh is not None and self.mesh.devices.size > 1:
                    adv = waf_advect_sharded(
                        self.mesh, fields, u * self.rmu[None],
                        v * self.rmv[None], s, self.fmz, self.fmzf,
                        self.mx2, self.m_ci, dtstepa / self.dx,
                        dtstepa / self.dz)
                else:
                    adv = waf_advect(
                        fields, u * self.rmu[None],
                        v * self.rmv[None], s, self.fmz, self.fmzf,
                        self.mx2, self.m_ci, dtstepa / self.dx,
                        dtstepa / self.dz)
            else:
                adv = jax.vmap(
                    lambda fld: self._wafone(fld, u, v, s,
                                             dtstepa))(fields)
            tetav, pai, ux, vx, wx = (adv[0], adv[1], adv[2], adv[3],
                                      adv[4])
            qx = adv[5:5 + self.nqx]
            if self.ntr:
                chi = jnp.maximum(adv[5 + self.nqx:], 0.0)
            u, v = self.x2uvstag(ux, vx)
            w = self.x2wstag(wx, w)

        # de-couple: T from θv·π (:322-350)
        qv = jnp.maximum(qx[0], c.minqq)
        qh = jnp.maximum(qx[1:], 0.0)
        qx = jnp.concatenate([qv[None], qh])
        qcond = jnp.sum(qh, axis=0)
        tvirt = tetav * pai
        t = tvirt / (1.0 + c.ep1 * qv - qcond)

        # -- physics (physical_parametrizations, :1386) ------------------
        sfupd: Dict[str, jax.Array] = {}
        heatrt = st.heatrt
        if self.physics is not None and flags is not None:
            atms = self.mkslice(t, pai, qx, u, v, w)
            if coszrs is not None:
                atms["coszrs"] = coszrs
            if solar is not None:
                atms["eccf"], atms["solcon"] = solar[0], solar[1]
                if solar.shape[0] > 2:
                    atms["mpos"] = solar[2]
            s_now = st._replace(u=u, v=v, w=w, pai=pai, t=t, qx=qx)
            z3 = jnp.zeros_like(t)
            (tphy, qvphy, qhphy, uphy, vphy, cldfra, heatrt,
             sfupd) = self.physics(
                 self, atms, s_now, bdy, flags, dtsec,
                 dyn=dict(tdyn=z3, qvdyn=z3, qvhadv=z3, qv_vadv=z3))
            # heating rate added uncoupled every step (:1489-1492)
            tphy = tphy + heatrt * self.m_ci
            if self.cfg.physics.ipptls == 1:
                dtc, dqv, dqc = self._condtq(
                    t, qx, atms["pb3"], tphy,
                    jnp.stack([qvphy, qhphy[0]]), cldfra, dtsec)
                tphy = tphy + dtc
                qvphy = qvphy + dqv
                qhphy = qhphy.at[0].add(dqc)
            chiphy = sfupd.pop("_chiten", None)
            if self.ntr and chiphy is not None:
                chi = jnp.maximum(chi + dtsec * chiphy
                                  * self.m_ci[None, None], 0.0)
            # update status (:1546-1568): forward-Euler apply, floors
            t = t + dtsec * tphy * self.m_ci
            qv = jnp.maximum(qv + dtsec * qvphy * self.m_ci, c.minqq)
            qh = jnp.maximum(qh + dtsec * qhphy * self.m_ci, 0.0)
            qx = jnp.concatenate([qv[None], qh])
            u = u + dtsec * uphy
            v = v + dtsec * vphy

        # -- boundary relaxation (moloch boundary, :485-548) -------------
        if bdy is not None:
            xtd = xt + dtsec
            pai = pai + self._nudge(bdy.pai0 + xtd * bdy.pait - pai)
            t = t + self._nudge(bdy.t0 + xtd * bdy.tt - t)
            qv = jnp.maximum(
                qv + self._nudge(bdy.qv0 + xtd * bdy.qvt - qv),
                c.minqq)
            u = u + self._nudge(bdy.u0 + xtd * bdy.ut - u)
            v = v + self._nudge(bdy.v0 + xtd * bdy.vt - v)
            if self.ntr:
                # chem lateral boundary: relax toward clean inflow air
                # (mod_che_bdyco nudge on chemt)
                chi = jnp.maximum(chi + self._nudge(-chi), 0.0)
            qx = qx.at[0].set(qv)
            # upper Rayleigh damping toward BCs (moraydamp,
            # mod_moloch.F90:420-425; tau ramps over rayhd below the top)
            if self.ifrayd == 1:
                u = u + dtsec * self.raytau_u \
                    * (bdy.u0 + xtd * bdy.ut - u) * self.m_u
                v = v + dtsec * self.raytau_v \
                    * (bdy.v0 + xtd * bdy.vt - v) * self.m_v
                t = t + dtsec * self.raytau \
                    * (bdy.t0 + xtd * bdy.tt - t) * self.m_ci
                pai = pai + dtsec * self.raytau \
                    * (bdy.pai0 + xtd * bdy.pait - pai) * self.m_ci

        # -- every-step 4-point smoothers (filtuv/filtt/filtq) -----------
        lap4 = lambda a: 0.125 * (shift(a, 0, -1) + shift(a, 0, 1)
                                  + shift(a, -1, 0) + shift(a, 1, 0)) \
            - 0.5 * a
        u = u + self.nuwind * lap4(u) * self.m_u
        v = v + self.nuwind * lap4(v) * self.m_v
        t = t + self.nupait * lap4(t) * self.m_ci
        qv2 = qx[0] + self.nuqx * lap4(qx[0]) * self.m_ci
        qh2 = qx[1:] + 0.5 * self.nuqx * lap4(qx[1:]) * self.m_ci[None]
        qx = jnp.concatenate([qv2[None], qh2])
        if self.ntr:
            chi = jnp.maximum(
                chi + 0.5 * self.nuqx * lap4(chi) * self.m_ci[None],
                0.0)
            sfupd = dict(sfupd, chi_b=chi)

        ns = st._replace(u=u, v=v, w=w, pai=pai, t=t, qx=qx,
                         heatrt=heatrt, **sfupd)
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
