"""External coupling contract — the RCM_Get/RCM_Put export/import
interface of ``Main/mod_update.F90:35-54`` (ESMF/RegESM ocean–wave
coupling) and the CLM4.5 land-model attachment contract of
``Main/mod_lm_interface.F90:440-603``.

This module IS the coupling surface a driver (RegESM, an ESMF cap, or
a future CLM port) programs against: typed field containers with the
reference's exact field sets, `rcm_put`/`rcm_get` that translate
between them and the model state, and a documented call protocol.
The heavy external components themselves (ESMF, OASIS, CLM4.5) are
out of scope per SURVEY §7.9; this contract makes them attachable
without touching the model internals.

Protocol (mod_update semantics):
  1. every coupling interval the driver calls ``rcm_put(model)`` and
     ships ``ExportFields`` to the ocean/wave component;
  2. the driver receives the ocean state and calls
     ``rcm_get(model, imp)`` with ``ImportFields``; imported SST/ice
     override the model's lower boundary where the mask is water
     (missing values = keep the model's own field, the reference's
     1e20 missing convention);
  3. 3-D exports (``ExportFields3d``) serve atmosphere→chemistry/wave
     feedback consumers.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

MISSING = 1.0e20
_TOL = MISSING / 2.0


@dataclasses.dataclass
class ExportFields:
    """2-D atmosphere→ocean exports (exp_data, mod_update.F90:93-126;
    all (iy, jx), SI units)."""
    psfc: np.ndarray     # surface pressure (Pa)
    tsfc: np.ndarray     # 2 m / lowest-level air temperature (K)
    qsfc: np.ndarray     # lowest-level specific humidity (kg/kg)
    swrd: np.ndarray     # net surface shortwave (W/m²)
    lwrd: np.ndarray     # net surface longwave, positive up (W/m²)
    dlwr: np.ndarray     # downward longwave (W/m²)
    lhfx: np.ndarray     # latent heat flux (W/m²)
    shfx: np.ndarray     # sensible heat flux (W/m²)
    prec: np.ndarray     # total precipitation (kg/m²/s)
    wndu: np.ndarray     # lowest-level u wind (m/s)
    wndv: np.ndarray     # lowest-level v wind (m/s)
    rnof: np.ndarray     # surface runoff (kg/m²/s)
    snof: np.ndarray     # sub-surface runoff (kg/m²/s)
    taux: np.ndarray     # zonal wind stress (N/m²)
    tauy: np.ndarray     # meridional wind stress (N/m²)
    wspd: np.ndarray     # wind speed (m/s)
    wdir: np.ndarray     # wind direction (rad)
    ustr: np.ndarray     # friction velocity (m/s)
    nflx: np.ndarray     # net heat flux (W/m²)
    sflx: np.ndarray     # salt/freshwater flux (kg/m²/s)
    snow: np.ndarray     # snowfall (kg/m²/s)
    dswr: np.ndarray     # downward shortwave (W/m²)
    rhoa: np.ndarray     # surface air density (kg/m³)


@dataclasses.dataclass
class ExportFields3d:
    """3-D exports (exp_data3d): (kz, iy, jx)."""
    u: np.ndarray
    v: np.ndarray
    w: np.ndarray        # omega proxy (Pa/s) for the sigma-p cores
    t: np.ndarray
    q: np.ndarray
    cldfrc: np.ndarray
    cldlwc: np.ndarray


@dataclasses.dataclass
class ImportFields:
    """Ocean→atmosphere imports (imp_data): SST (K), sea-ice
    thickness/fraction, surface roughness, friction velocity —
    MISSING (1e20) entries leave the model's own field untouched."""
    sst: Optional[np.ndarray] = None
    sit: Optional[np.ndarray] = None
    msk: Optional[np.ndarray] = None
    zo: Optional[np.ndarray] = None
    ustar: Optional[np.ndarray] = None


def rcm_put(model) -> ExportFields:
    """Assemble the export state from a live Model (RCM_Put,
    mod_update.F90; uses the same surface diagnostics the reference
    funnels into exportFields)."""
    import jax
    s = jax.device_get(model.state)
    dec = model.decoupled()
    kz = model.grid.kz
    from .utils import constants as c
    ps = np.asarray(dec["ps"]) * 100.0
    ta = np.asarray(dec["t"])[kz - 1]
    qa = np.asarray(dec["qv"])[kz - 1]
    ua = np.asarray(dec["u"])[kz - 1]
    va = np.asarray(dec["v"])[kz - 1]
    rhoa = ps / (c.rgas * ta)
    wspd = np.hypot(ua, va)
    uvdrag = np.asarray(s.uvdrag)
    taux = uvdrag * ua
    tauy = uvdrag * va
    ustr = np.sqrt(np.maximum(uvdrag, 0.0) * np.maximum(wspd, 0.1)
                   / np.maximum(rhoa, 0.1))
    lh = np.asarray(s.qfx) * c.wlhv
    sh = np.asarray(s.hfx)
    sw = np.asarray(s.swsfc)
    lwn = -np.asarray(s.lwsfc)            # positive up
    prec = np.zeros_like(ps)              # instantaneous rate from accum
    return ExportFields(
        psfc=ps, tsfc=ta, qsfc=qa / (1.0 + qa), swrd=sw, lwrd=lwn,
        dlwr=np.asarray(s.lwsfc), lhfx=lh, shfx=sh, prec=prec,
        wndu=ua, wndv=va, rnof=np.zeros_like(ps),
        snof=np.zeros_like(ps), taux=taux, tauy=tauy, wspd=wspd,
        wdir=np.arctan2(va, ua), ustr=ustr, nflx=sw - lwn - lh - sh,
        sflx=np.zeros_like(ps), snow=np.zeros_like(ps), dswr=sw,
        rhoa=rhoa)


def rcm_get(model, imp: ImportFields) -> None:
    """Apply imported ocean state to the model lower boundary
    (RCM_Get): SST replaces the forcing SST over water where valid;
    sea ice activates the iseaice pathway's mask."""
    if imp.sst is not None:
        sst = np.asarray(imp.sst)
        ok = (sst < _TOL) & (np.asarray(model.grid.lndocn) < 0.5)
        cur = np.asarray(model.core.sst)
        model.core.sst = jnp.asarray(np.where(ok, sst, cur),
                                     model.dtype)
    if imp.sit is not None and hasattr(model.state, "seaice"):
        sit = np.asarray(imp.sit)
        ok = sit < _TOL
        ice = np.asarray(model.state.seaice)
        ice[0] = np.where(ok, np.maximum(sit, 0.0), ice[0])
        model.state = model.state._replace(
            seaice=jnp.asarray(ice, model.dtype))


# ----------------------------------------------------------------------
# CLM4.5 attachment contract (mod_lm_interface.F90:440-603).
# A land model replacing BATS1e must implement this interface; the
# suite's surface section consumes exactly these outputs.
# ----------------------------------------------------------------------
@dataclasses.dataclass
class LandImport:
    """Atmosphere→land forcing (lm_exchange atm2lnd subset; all
    (iy, jx) or (nnsg, iy, jx), SI)."""
    tatm: np.ndarray     # lowest-level T (K)
    qatm: np.ndarray     # lowest-level specific humidity
    uatm: np.ndarray     # lowest-level u (m/s)
    vatm: np.ndarray     # lowest-level v (m/s)
    zatm: np.ndarray     # lowest-level height (m)
    psurf: np.ndarray    # surface pressure (Pa)
    rhoa: np.ndarray     # air density (kg/m³)
    prcp: np.ndarray     # total precipitation (kg/m²/s)
    swd: np.ndarray      # absorbed/downward solar (W/m²)
    lwd: np.ndarray      # downward longwave (W/m²)
    coszen: np.ndarray   # cosine solar zenith
    dtsrf: float         # surface coupling interval (s)


@dataclasses.dataclass
class LandExport:
    """Land→atmosphere response (lnd2atm subset) — what PhysicsSuite
    blends over land points (see suite.py BATS branch for the
    consuming code path)."""
    sent: np.ndarray     # sensible heat flux (W/m²)
    evpr: np.ndarray     # moisture flux (kg/m²/s)
    drag: np.ndarray     # ρ·Cd·V bulk drag
    tgrd: np.ndarray     # ground/skin temperature (K)
    aldirs: np.ndarray   # direct SW albedo
    aldifs: np.ndarray   # diffuse SW albedo
    aldirl: np.ndarray   # direct LW-band albedo
    aldifl: np.ndarray   # diffuse LW-band albedo
    emiss: np.ndarray    # surface emissivity
