"""Prognostic state pytrees.

The reference triplicates state over leapfrog time levels
(``atmstate_a/b/c``, ``Main/mpplib/mod_regcm_types.F90:169-203``). Here the
state is a single frozen dataclass pytree with explicit ``_a`` (time n) and
``_b`` (filtered n-1) levels; the ``_c`` (n+1) level exists only as
temporaries inside the jitted step. All fields are *coupled* (multiplied by
p* in cb) exactly like the reference prognostics.

Shapes: 3-D fields (kz, iy, jx); tracers (nqx, kz, iy, jx); 2-D (iy, jx).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# tracer indices (mod_runparams.F90:38-42 iqv..iqs, 0-based; SUBEX uses
# 2 species, Nogherotto-Tompkins/WSM5 use 5: mod_params.F90:1359-1363)
IQV = 0
IQC = 1
IQR = 2
IQI = 3
IQS = 4


class StepFlags(NamedTuple):
    """Static (compile-time) per-step physics cadence flags — the jit-safe
    counterpart of the reference's syncro_rad/syncro_srf alarms
    (Main/mpplib/mod_runparams.F90:51-75)."""
    do_rad: bool = False
    do_srf: bool = False
    do_cum: bool = True
    first: bool = False
    # absorptivity/emissivity refresh (getabetot on the dtabem alarm,
    # Main/mod_rad_interface.F90:62-65): True recomputes the LW
    # abstot/absnxt/emstot tensors from scratch; False reuses the
    # cached state copy (radclw consumes the cache either way).
    # Defaults True so a bare do_rad step is self-contained.
    do_abem: bool = True


class HydroState(NamedTuple):
    """Hydrostatic-core leapfrog state (idynamic=1)."""
    ps_a: jax.Array      # p* = ps - ptop (cb), cross
    ps_b: jax.Array
    u_a: jax.Array       # p*·u (cb m/s), dot
    u_b: jax.Array
    v_a: jax.Array
    v_b: jax.Array
    t_a: jax.Array       # p*·T (cb K), cross
    t_b: jax.Array
    qx_a: jax.Array      # p*·q (cb kg/kg), (nqx, kz, iy, jx), cross
    qx_b: jax.Array
    # MM5 non-hydrostatic prognostics (idynamic=2; zero-size unused for
    # the hydrostatic core): p*·pp (pressure perturbation, cb·Pa) and
    # p*·w (cb·m/s) on kz+1 interfaces
    pp_a: jax.Array
    pp_b: jax.Array
    w_a: jax.Array
    w_b: jax.Array
    # split-explicit mode storage (mod_split dstor/hstor), (nsplit, iy, jx)
    dstor: jax.Array
    hstor: jax.Array
    # surface / physics persistent state
    tg: jax.Array        # ground temperature (K), cross
    rainnc: jax.Array    # accumulated large-scale precip (kg/m2)
    rainc: jax.Array     # accumulated convective precip (kg/m2)
    heatrt: jax.Array    # radiative heating rate (K/s, decoupled), (kz,iy,jx)
    qfx: jax.Array       # surface moisture flux (kg/m2/s), cross
    hfx: jax.Array       # surface sensible heat flux (W/m2), cross
    uvdrag: jax.Array    # surface drag velocity coefficient, cross
    swsfc: jax.Array     # absorbed shortwave at surface (W/m2)
    lwsfc: jax.Array     # net downward longwave at surface (W/m2)
    cbmf: jax.Array      # Emanuel cloud-base mass flux memory (kg/m2/s)
    cldefi: jax.Array    # Betts-Miller cloud efficiency memory (mod_cu_bm)
    # cumulus tendencies held between syncro_cum alarms (dtcum,
    # Main/mod_cu_interface.F90:288: the scheme runs every dtcum and
    # its tendencies persist): packed (9, kz, iy, jx) =
    # [tten, qvten, utenx, vtenx, cldfra, cldlwc, qcten, qiten,
    #  qdetr] (uncoupled; the last three are Tiedtke detrainment)
    cuten: jax.Array
    cuprate: jax.Array   # held convective precip rate (kg/m²/s)
    # running-mean vertical velocity for the Kain-Fritsch trigger
    # (avg_ww, Main/mod_cu_interface.F90:256-268), (kz, iy, jx)
    wavg: jax.Array
    # turbulence state: UW TCM prognostic TKE on kz+1 interfaces
    # (atmstate%tke, advected/diffused/RAW-filtered when ibltyp=2,
    # mod_tendency.F90:518-544); MYJ (ibltyp=4) stores its per-layer
    # TKE in tke_a[:kz] without dynamics (atms%tkepbl)
    tke_a: jax.Array     # (kz+1, iy, jx), uncoupled
    tke_b: jax.Array
    # MYJ persistent surface-layer state (thz0, qz0), (2, iy, jx)
    pbl0: jax.Array
    # Hostetler lake model state (lakemod=1, mod_ocn_lake.F90):
    # tlak water temperature profile (°C) on nlak 1 m layers (depth 1
    # when lakemod=0), ice thickness state hi (m), average ice (m),
    # snow (mm w.e.), snow age
    tlak: jax.Array
    lakhi: jax.Array
    lakice: jax.Array
    laksnow: jax.Array
    laksnag: jax.Array
    # BATS1e land state, packed (NBATS=10, iy, jx): tgbrd, tlef, taf,
    # ldew, sncv, snag, ssw, rsw, tsw, gwet (physics/surface/bats.py)
    bats: jax.Array
    # sea-ice state, packed (4, iy, jx): sfice, sncv, snag, tgrd_ice
    # (physics/surface/seaice.py)
    seaice: jax.Array
    # diurnal-SST state (idcsst=1), packed (3, iy, jx): deltas,
    # tdeltas, tskin (physics/surface/dcsst.py)
    dcsst: jax.Array
    # CCM3 LW absorptivity/emissivity cache, refreshed on the dtabem
    # alarm (gasabstot/gasemstot/gasabsnxt of
    # Main/mod_rad_interface.F90:62-65). Stored flat on the leading
    # axis so every state leaf stays 3-D (sharding on iy/jx):
    # abstot ((kz+1)², iy, jx), absnxt (4·kz, iy, jx),
    # emstot (kz+1, iy, jx).
    abstot: jax.Array
    absnxt: jax.Array
    emstot: jax.Array
    # chemistry tracers (ichem=1): coupled p*·chi, (ntr, kz, iy, jx)
    # with ntr=0 when chemistry is off (atms%chi/chib of
    # mod_atm_interface; leapfrog a/b levels like qx)
    chi_a: jax.Array
    chi_b: jax.Array
    # accumulated chemistry diagnostics (3, ntr, iy, jx):
    # [0]=emission, [1]=dry deposition, [2]=wet deposition (kg/m²)
    # (cemtrac / remdrd / wdrout+wdwout analogues, mod_che_common)
    chemdiag: jax.Array


class BdyState(NamedTuple):
    """Lateral boundary values (mod_bdycod v3dbound/v2dbound equivalents).

    b0: value at the last boundary input time; bt: time tendency
    (b1-b0)/dtbdys. Full-grid arrays; only the boundary zone is consumed.
    xt: seconds since b0 was valid (host-updated scalar per step).
    """
    ps0: jax.Array       # (iy, jx)  p* bdy
    pst: jax.Array
    t0: jax.Array        # (kz, iy, jx), coupled p*T
    tt: jax.Array
    qv0: jax.Array       # coupled p*qv
    qvt: jax.Array
    u0: jax.Array
    ut: jax.Array
    v0: jax.Array
    vt: jax.Array
    # chemistry boundary pairs (mod_che_bdyco chebdy; None when
    # chemistry is off or no CHBC data — the core then relaxes toward
    # clean (zero) inflow air)
    chi0: Optional[jax.Array] = None
    chit: Optional[jax.Array] = None
    # slab-ocean q-flux adjustment (SOM monthly qflx, read_som
    # Main/mod_ncio.F90:1130-1169 → qflb0/qflbt of mod_slabocean;
    # here the month-interpolated value refreshed at each boundary
    # alarm). None unless do_qflux_adj with an attached SOM file.
    qflb0: Optional[jax.Array] = None


def zeros_hydro(kz: int, iy: int, jx: int, nqx: int = 2, nsplit: int = 2,
                nlak: int = 1, ntr: int = 0, nnsg: int = 1,
                dtype=jnp.float32) -> HydroState:
    z2 = jnp.zeros((iy, jx), dtype)
    z3 = jnp.zeros((kz, iy, jx), dtype)
    z4 = jnp.zeros((nqx, kz, iy, jx), dtype)
    zs = jnp.zeros((nsplit, iy, jx), dtype)
    zw = jnp.zeros((kz + 1, iy, jx), dtype)
    return HydroState(
        ps_a=z2, ps_b=z2, u_a=z3, u_b=z3, v_a=z3, v_b=z3,
        t_a=z3, t_b=z3, qx_a=z4, qx_b=z4,
        pp_a=z3, pp_b=z3, w_a=zw, w_b=zw, dstor=zs, hstor=zs,
        tg=z2, rainnc=z2, rainc=z2, heatrt=z3, qfx=z2, hfx=z2,
        uvdrag=z2, swsfc=z2, lwsfc=z2, cbmf=z2,
        # BM efinit: avgefi everywhere (mod_cu_bm.F90:229-236)
        cldefi=jnp.full((iy, jx), 0.6, dtype),
        cuten=jnp.zeros((9, kz, iy, jx), dtype),
        cuprate=z2, wavg=z3,
        tke_a=jnp.full((kz + 1, iy, jx), 1.0e-3, dtype),
        tke_b=jnp.full((kz + 1, iy, jx), 1.0e-3, dtype),
        pbl0=jnp.zeros((2, iy, jx), dtype),
        tlak=jnp.zeros((nlak, iy, jx), dtype),
        lakhi=jnp.full((iy, jx), 0.01, dtype),
        lakice=z2, laksnow=z2, laksnag=z2,
        # BATS pack: per-subcell (10, nnsg, iy, jx) when nsg>1
        bats=(jnp.zeros((10, nnsg, iy, jx), dtype) if nnsg > 1
              else jnp.zeros((10, iy, jx), dtype)),
        seaice=jnp.zeros((4, iy, jx), dtype),
        dcsst=jnp.zeros((3, iy, jx), dtype),
        abstot=jnp.zeros(((kz + 1) * (kz + 1), iy, jx), dtype),
        absnxt=jnp.zeros((4 * kz, iy, jx), dtype),
        emstot=jnp.zeros((kz + 1, iy, jx), dtype),
        chi_a=jnp.zeros((ntr, kz, iy, jx), dtype),
        chi_b=jnp.zeros((ntr, kz, iy, jx), dtype),
        chemdiag=jnp.zeros((3, ntr, iy, jx), dtype))


def bdy_from_state(s: HydroState) -> BdyState:
    """Fixed boundary values equal to the current state (synthetic runs)."""
    z3 = jnp.zeros_like(s.t_a)
    z2 = jnp.zeros_like(s.ps_a)
    return BdyState(
        ps0=s.ps_a, pst=z2,
        t0=s.t_a, tt=z3,
        qv0=s.qx_a[IQV], qvt=z3,
        u0=s.u_a, ut=z3, v0=s.v_a, vt=z3)
