"""Round-1 broadband radiation ("ccm3-lite").

Structurally mirrors the CCM3 column driver contract
(``Main/radlib/mod_rad_colmod3.F90:207``; staging structs
``mod_2_rad``/``rad_2_mod`` ``Main/mpplib/mod_regcm_types.F90:558-606``):
inputs T/qv/cloud profiles + coszrs + albedo, outputs heating rates
(K/s), surface SW absorbed, surface LW net. The spectral k-distribution
CCM3/RRTMG transfer is a later-round port; this module uses broadband
two-stream-like transmission so the full model closes its energy loop:

- SW: Rayleigh + H2O absorption (Lacis-Hansen type), per-layer cloud
  reflection/absorption from LWP, beam attenuated top-down (lax.scan).
- LW: grey emissivity from water-vapour path + cloud emissivity,
  two-pass up/down broadband fluxes (lax.scan).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import constants as c


# GHG emissivity sensitivities (per-unit log concentration, scaled by
# dp/p0): KCO2 calibrated so doubling CO2 gives ΔOLR ≈ −3.7 W/m2 on the
# standard atmosphere; CH4/N2O scaled by their relative forcing
# efficiencies (≈0.5/0.15 W/m2 per historical increment).
KCO2 = 0.084
KCH4 = 0.018
KN2O = 0.011


class RadOut(NamedTuple):
    heatrt: jax.Array     # (kz, iy, jx) K/s (decoupled)
    swabs_sfc: jax.Array  # absorbed SW at surface (W/m2)
    lwnet_sfc: jax.Array  # net downward LW at surface (W/m2)
    olr: jax.Array        # outgoing LW at TOA (W/m2)
    swtoa: jax.Array      # net SW at TOA (W/m2)


def radiation(t, qv, pf, ph, cldfra, cldlwc, coszrs, tg, albedo,
              eccf=1.0, co2ppm=330.0, ch4ppb=1700.0,
              n2oppb=310.0) -> RadOut:
    """Broadband radiative transfer; all (kz, iy, jx), pf (kz+1, iy, jx).

    t (K), qv (kg/kg), pf/ph (Pa), cldfra (0-1), cldlwc in-cloud g/m3,
    coszrs cosine zenith, tg ground T, albedo surface albedo.
    co2ppm/ch4ppb/n2oppb: well-mixed GHG concentrations (from
    physics/radiation/ghg.py scenario tables); the grey LW opacity is
    calibrated at (330, 1700, 310), and the logarithmic increments are
    tuned so a CO2 doubling reduces OLR by ≈3.7 W/m2 (the canonical
    radiative forcing the reference's spectral schemes produce).
    """
    kz = t.shape[0]
    dp = pf[1:] - pf[:-1]                       # Pa
    wpath = qv * dp * c.regrav                  # layer water vapour (kg/m2)
    dz = dp / (jnp.maximum(ph, 1.0) / (c.rgas * t)) * c.regrav
    lwp = cldlwc * cldfra * dz                  # layer LWP (g/m2)

    # ---------------- shortwave ----------------------------------------
    s0 = c.solcon * eccf * jnp.maximum(coszrs, 0.0)
    mu = jnp.maximum(coszrs, 0.01)
    # layer transmissions
    # H2O absorption (Lacis & Hansen 1974): A(w) = 2.9 w/((1+141.5 w)^0.635
    # + 5.925 w) with w the CUMULATIVE slant path (cm) from TOA; the layer
    # absorbs the increment A(w_bot) − A(w_top).
    wcum = jnp.cumsum(wpath, axis=0) / 10.0 / mu[None]
    def _lh(w):
        return 2.9 * w / ((1.0 + 141.5 * w) ** 0.635 + 5.925 * w)
    atot = _lh(wcum)
    atop = jnp.concatenate([jnp.zeros_like(atot[:1]), atot[:-1]], axis=0)
    absw = jnp.clip(atot - atop, 0.0, 0.5)
    # Rayleigh + ozone lumped: small constant optical depth per Δp
    tray = 1.0 - 0.03 * (dp / c.stdp)
    # cloud: reflection from LWP (Stephens 1978 type)
    tau_c = 0.15 * lwp / jnp.maximum(mu[None], 0.1)
    refl_c = tau_c / (6.7 + tau_c)
    abs_c = jnp.clip(0.025 * tau_c, 0.0, 0.2) * cldfra
    trans = tray * (1.0 - absw) * (1.0 - refl_c) * (1.0 - abs_c)
    absorb = (1.0 - absw) * 0.0 + absw + abs_c   # absorbed fraction/layer

    def sw_layer(beam, k):
        absorbed = beam * jnp.clip(absorb[k], 0.0, 0.9)
        beam_new = beam * jnp.clip(trans[k], 0.0, 1.0)
        return beam_new, absorbed

    beam_sfc, sw_abs_layer = jax.lax.scan(sw_layer, s0, jnp.arange(kz))
    swabs_sfc = beam_sfc * (1.0 - albedo)
    # upward reflected beam absorption neglected (broadband approx)
    cpdp = c.cpd * dp * c.regrav                # J/m2/K per layer
    sw_heat = sw_abs_layer / cpdp

    # ---------------- longwave -----------------------------------------
    # grey layer emissivity from vapour path + cloud (broadband
    # calibration: OLR ≈ 263 W/m2, sfc LW ≈ −78 W/m2, tropospheric
    # cooling 2-5 K/day for the std atmosphere at 50% RH)
    emis_v = 1.0 - jnp.exp(-0.2 * jnp.sqrt(jnp.maximum(wpath, 0.0)))
    emis_c = cldfra * (1.0 - jnp.exp(-0.13 * lwp))
    # well-mixed GHG increment (log forcing, zero at calibration point)
    ghfac = (KCO2 * jnp.log(co2ppm / 330.0)
             + KCH4 * jnp.log(ch4ppb / 1700.0)
             + KN2O * jnp.log(n2oppb / 310.0))
    emis_g = jnp.clip(ghfac, -0.3, 0.3) * (dp / c.stdp)
    emis = jnp.clip(emis_v + emis_c * (1.0 - emis_v) + emis_g,
                    1.0e-4, 0.999)
    bint = c.sigm * t ** 4

    # downward pass (top → surface)
    def lw_down(fdn, k):
        fdn_new = fdn * (1.0 - emis[k]) + emis[k] * bint[k]
        return fdn_new, fdn_new

    fdn_top = jnp.zeros_like(tg)
    fdn_sfc, fdn = jax.lax.scan(lw_down, fdn_top, jnp.arange(kz))
    # upward pass (surface → top)
    sfc_emis = 0.98
    fup_sfc = sfc_emis * c.sigm * tg ** 4 + (1.0 - sfc_emis) * fdn_sfc

    def lw_up(fup, k):
        fup_new = fup * (1.0 - emis[k]) + emis[k] * bint[k]
        return fup_new, fup_new

    olr, fup_r = jax.lax.scan(lw_up, fup_sfc, jnp.arange(kz - 1, -1, -1))
    fup = jnp.flip(fup_r, axis=0)               # fup[k] = flux above layer k

    # net flux at interfaces: F(k) = fup_at - fdn_at; heating from div
    fdn_if = jnp.concatenate([fdn_top[None], fdn], axis=0)   # (kz+1,…)
    fup_if = jnp.concatenate([fup, fup_sfc[None]], axis=0)
    fnet = fup_if - fdn_if
    lw_heat = -(fnet[:-1] - fnet[1:]) / cpdp
    lwnet_sfc = fdn_sfc - fup_sfc

    heatrt = sw_heat + lw_heat
    # keep rates sane (broadband scheme guard)
    heatrt = jnp.clip(heatrt, -30.0 / 86400.0, 30.0 / 86400.0)
    swtoa = s0 - beam_sfc * albedo
    return RadOut(heatrt=heatrt, swabs_sfc=swabs_sfc,
                  lwnet_sfc=lwnet_sfc, olr=olr, swtoa=swtoa)


def surface_albedo(coszrs, landmask, snow=None):
    """Simple land/ocean albedo (surface_albedo contract,
    Main/mod_lm_interface.F90:440; full BATS albedo later)."""
    mu = jnp.maximum(coszrs, 0.01)
    alb_ocn = 0.05 / (mu + 0.15)
    alb_lnd = jnp.full_like(coszrs, 0.16)
    return jnp.where(landmask > 0.5, alb_lnd, alb_ocn)
