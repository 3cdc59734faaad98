"""Chemistry tendency orchestration — the ``tractend2`` equivalent
(``Main/chemlib/mod_che_tend.F90:63-583``).

Called from inside PhysicsSuite at the reference's call site (tend →
physical_parametrizations → tractend2): computes the surface-layer
met fields (10 m wind, aerodynamic resistance), natural emission
fluxes (dust, sea salt, pollen), settling/dry deposition for aerosol
tracers, gas dry deposition (Zhang 2003 resistances), wet scavenging,
aqueous+gas sulfur chemistry, carbonaceous aging, and — for
``igaschem`` sets — the CBMZ gas-phase solver on its ``dtchsolv``
cadence.  Returns the coupled tracer tendency ``chiten`` plus
accumulated diagnostics.

Surface-layer simplifications follow the reference's own CLM45 branch
(mod_che_tend.F90:253-291): temp10 from the lapse rate, rh10 from the
lowest model level — documented deviations from the BATS-deltk path.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import constants as c
from .species import ChemSpec, build_species
from .dust import DustEmission
from .deposition import (aerodyresis, drydep_aero, settling_tend,
                         wetdep_tend, CROUGH, CXMOPOR, CIEXSOL, CDEPUV)

ZOCE = 0.0004      # ocean roughness (m), zoce of mod_constants
ZLND = 0.01        # bare-land roughness zlnd
ZSNO = 0.00040     # snow roughness zsno


class ChemTend:
    """Chemistry tendency operator bound to one grid/config."""

    def __init__(self, cfg, grid, spec: ChemSpec, dtype=None):
        self.cfg = cfg
        self.spec = spec
        self.ntr = spec.ntr
        ch = cfg.chem
        self.ichsursrc = int(ch.ichsursrc)
        self.ichdrdepo = int(ch.ichdrdepo)
        self.ichremlsc = int(ch.ichremlsc)
        self.ichremcvc = int(ch.ichremcvc)
        self.ichdustemd = int(ch.ichdustemd)
        self.rdstemfac = float(ch.rdstemfac)
        f = (lambda x: jnp.asarray(x, dtype)) if dtype is not None \
            else (lambda x: jnp.asarray(x))
        self.f = f
        # landuse class map (ivegcov: ocean/lake classes 14/15 → 0,
        # tractend2 :168-178)
        lveg = np.asarray(grid.extras.get(
            "lveg", np.where(np.asarray(grid.lndocn) > 0.5, 2, 15)),
            dtype=np.int32)
        ivegcov = np.where((lveg == 14) | (lveg == 15), 0, lveg)
        self.ivegcov = jnp.asarray(ivegcov)
        self.water = jnp.asarray(ivegcov == 0)
        # effective roughness by class (crough; water zoce)
        zeff = np.where(ivegcov > 0,
                        CROUGH[np.clip(ivegcov - 1, 0, 21)], ZOCE)
        self.zeff = f(zeff)
        # soil-water normalization 1/(depuv·1e-3·2650·(1−porosity))
        # (tractend2 :236-240 Fecan gravimetric conversion)
        iex = CIEXSOL[np.clip(ivegcov - 1, 0, 21)]
        xmo = CXMOPOR[np.clip(iex - 1, 0, 11)]
        self.soilw_fac = f(1.0 / (CDEPUV * 1.0e-3 * 2650.0
                                  * np.maximum(1.0 - xmo, 1e-6)))
        iy, jx = grid.iy, grid.jx
        # -- dust (only when dust tracers are active) ------------------
        self.idust = spec.indices("dust")
        self.dust = None
        if self.idust:
            # texture fractions (dustsotex): fractional field from
            # DOMAIN when present, else one-hot dominant class
            if "texfrac" in grid.extras:
                tex = np.asarray(grid.extras["texfrac"])
            else:
                ltex = np.asarray(grid.extras.get(
                    "ltex", np.full((iy, jx), 6)), dtype=np.int32)
                tex = np.zeros((12, iy, jx))
                np.put_along_axis(tex, np.clip(ltex - 1, 0, 11)[None],
                                  1.0, axis=0)
            emitmask = ((ivegcov == 8) | (ivegcov == 11)).astype(float)
            self.dust = DustEmission(spec.bin_size, tex, emitmask,
                                     ichdustemd=self.ichdustemd,
                                     rdstemfac=self.rdstemfac,
                                     dtype=dtype)
        # -- sea salt --------------------------------------------------
        self.isslt = spec.indices("sslt")
        self.seasalt = None
        if self.isslt:
            from .seasalt import SeasaltEmission
            self.seasalt = SeasaltEmission()
        # -- pollen ----------------------------------------------------
        self.ipollen = spec.indices("pollen")
        # emission potential map (chemsrc): zero without a CHEMISS
        # inventory file in this environment
        self.pollen_src = f(np.asarray(grid.extras.get(
            "pollen_src", np.zeros((iy, jx)))))
        # -- sulfur ----------------------------------------------------
        self.iso2 = spec.iso2
        self.iso4 = spec.iso4
        self.oxcl = None
        if spec.ioxclim:
            from .oxclim import load_oxidants, IOX_OH, IOX_H2O2
            sig = np.asarray(grid.hsigma)
            ox = load_oxidants(cfg, grid, sig)
            self.oxcl = (f(ox[IOX_OH]), f(ox[IOX_H2O2]))
        # -- gas dry deposition ----------------------------------------
        from .drydep_gas import GAS_ROW
        self.gasdep = [(i, n) for i, n in enumerate(spec.names)
                       if spec.kind[i] in ("so2", "gas")
                       and n in GAS_ROW]
        # lcov for the gas scheme (water → class 14, >20 → 20)
        lcov = np.where(ivegcov == 0, 14, np.minimum(ivegcov, 20))
        self.lcov_gas = jnp.asarray(lcov, jnp.int32)
        # -- per-tracer aerosol parameters -----------------------------
        amask = spec.aerosol_mask
        self.aer_mask = jnp.asarray(amask)
        # safe (nonzero) diameters/densities for the dense aerosol
        # deposition math; results masked to aerosol tracers only
        self.bin_diam = f(np.where(amask, spec.bin_diam, 1.0))
        self.rhop = f(np.where(amask, spec.rhop, 1000.0))
        self.sol = f(np.where(amask, spec.sol, 0.0))
        self.aging_pairs = list(spec.aging_pairs)
        # -- gas phase (CBMZ or CB6r2) ---------------------------------
        self.cbmz = None
        if spec.igaschem:
            from .cbmz_driver import Cb6Driver, CbmzDriver
            mk = Cb6Driver if spec.simtype == "CB6" else CbmzDriver
            self.cbmz = mk(cfg, grid, spec, dtype=dtype)
        # -- SNA thermodynamic equilibrium (DCCB iisoropia) ------------
        self.sna = None
        if getattr(spec, "isna", 0):
            from .sna import SnaDriver
            self.sna = SnaDriver(spec)

    def __call__(self, core, atms, s, cldfra_ls, cum_cldfra,
                 remrat, rembc, conv_prate, dt, ls_prate=None
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Returns (chiten coupled (ntr,kz,iy,jx), diag dict with
        emission/drydep/wetdep fluxes in kg/m²/s)."""
        kz = core.kz
        psb = atms["psb"]
        # tendency coupling factor: p* for the sigma-p cores, 1 for
        # MOLOCH (uncoupled chemt; tractend2's idynamic==3 branches)
        cpl = atms.get("cpl", psb)
        tb3 = atms["tb3"]
        rho = atms["rhob3"]
        dzq = atms["dzq"]
        za = atms["za"]
        chib = s.chi_b                      # coupled p*·chi

        # -- surface-layer fields (tractend2 preliminary block) --------
        zak = za[kz - 1]
        fact = jnp.log(zak / 10.0) / jnp.log(
            zak / jnp.maximum(self.zeff, 1e-6))
        u10 = atms["ubx3"][kz - 1] * (1.0 - fact)
        v10 = atms["vbx3"][kz - 1] * (1.0 - fact)
        wid10 = jnp.sqrt(u10 ** 2 + v10 ** 2)
        # CLM45-branch simplifications (mod_che_tend.F90:276-280)
        temp10 = tb3[kz - 1] + c.lrate * (zak - 10.0)
        rh10 = atms["rhb3"][kz - 1]
        tsurf = s.tg
        srad = s.swsfc
        # gravimetric soil water from the BATS 10 cm store (bats[6])
        soilw = s.bats[6] * self.soilw_fac
        # vegetation/snow fractions from the BATS pack
        from ..physics.surface.bats import fseas_fn, _depth
        lncl = jnp.clip(
            (core.physics.bats_ss["mfcv"]
             - core.physics.bats_ss["seasf"] * fseas_fn(s.bats[0]))
            if getattr(core.physics, "land_scheme", "") == "bats1e"
            else jnp.full_like(psb, 0.1), 0.0, 1.0)
        if getattr(core.physics, "land_scheme", "") == "bats1e":
            _, _, _, scvk, _ = _depth(
                s.bats[4], s.bats[5], lncl,
                core.physics.bats_ss["rough"])
        else:
            scvk = jnp.zeros_like(psb)
        # the reference zeroes snow for the gas-drydep scheme
        # (drydep_gas :845 snow(:) = d_zero)
        snow_mm = jnp.zeros_like(psb)
        vegfrac = lncl
        snowfrac = scvk

        ustar, xra = aerodyresis(self.zeff, wid10, temp10, tsurf,
                                 rh10, srad, self.water)

        chiten = jnp.zeros_like(chib)
        diag: Dict[str, jax.Array] = {}
        emflx = jnp.zeros((self.ntr,) + psb.shape, chib.dtype)
        sfc_fac = cpl / (dzq[kz - 1] * rho[kz - 1])

        # -- natural emissions (sfflux equivalents) --------------------
        if self.ichsursrc:
            if self.dust is not None:
                rsfrow = self.dust(ustar, self.zeff, soilw, wid10,
                                   rho[kz - 1], vegfrac, snowfrac)
                for b, itr in enumerate(self.idust):
                    chiten = chiten.at[itr, kz - 1].add(
                        rsfrow[b] * sfc_fac)
                    emflx = emflx.at[itr].add(rsfrow[b])
            if self.seasalt is not None:
                ss = self.seasalt(wid10, self.water.astype(chib.dtype))
                for b, itr in enumerate(self.isslt):
                    chiten = chiten.at[itr, kz - 1].add(ss[b] * sfc_fac)
                    emflx = emflx.at[itr].add(ss[b])
            if self.ipollen:
                from .pollen import pollen_emission
                tot_pr = conv_prate + (ls_prate
                                       if ls_prate is not None else 0.0)
                pe = pollen_emission(self.pollen_src, ustar, wid10,
                                     rh10, tot_pr)
                itr = self.ipollen[0]
                chiten = chiten.at[itr, kz - 1].add(pe * sfc_fac)
                emflx = emflx.at[itr].add(pe)
            diag["emflx"] = emflx

        # -- settling + dry deposition (aerosol tracers) ---------------
        if self.ichdrdepo:
            dd = drydep_aero(self.bin_diam, self.rhop, tb3, rho,
                             atms["pb3"], self.ivegcov, ustar, xra)
            am = self.aer_mask[:, None, None, None]
            pdepv = jnp.where(am, dd.pdepv, 0.0)
            ddepv = jnp.where(am[:, 0], dd.ddepv, 0.0)
            st_ten, ddflx = settling_tend(
                chib, cpl, pdepv, ddepv, dzq, rho,
                core.twt1, core.twt2, dt)
            chiten = chiten + st_ten
            diag["ddflx"] = ddflx
            # gas dry deposition (drydep_gas, Zhang 2003 resistances)
            if self.gasdep:
                from .drydep_gas import gas_drydep_velocity
                vdg = gas_drydep_velocity(
                    [n for _, n in self.gasdep], self.lcov_gas,
                    atms.get("mpos", 6.5), ustar, xra,
                    (conv_prate + (ls_prate if ls_prate is not None
                                   else 0.0)) * 3600.0,
                    snow_mm, srad, tsurf, temp10, rh10,
                    atms.get("coszrs", jnp.zeros_like(psb)))
                rdz = 1.0 / dzq[kz - 1]
                for gi, (itr, _) in enumerate(self.gasdep):
                    kd = vdg[gi] * rdz
                    kav = jnp.maximum(chib[itr, kz - 1], 0.0) / dt
                    ddrem = jnp.where(kd * dt < 25.0,
                                      kav * (1.0 - jnp.exp(-kd * dt)),
                                      0.0)
                    chiten = chiten.at[itr, kz - 1].add(-ddrem)
        else:
            pdepv = jnp.zeros((self.ntr, kz) + psb.shape, chib.dtype)

        # -- wet deposition (wetdepa; aerosol tracers only) ------------
        kcumtop = jnp.full(psb.shape, -1, jnp.int32)
        if self.ichremlsc or self.ichremcvc or self.iso2 is not None:
            has = cum_cldfra > 1e-3
            anyc = jnp.any(has, axis=0)
            kcumtop = jnp.where(
                anyc, jnp.argmax(has.astype(jnp.int32), axis=0), -1)
            kcumbot = jnp.where(
                anyc, kz - 1 - jnp.argmax(
                    jnp.flip(has, 0).astype(jnp.int32), axis=0), -1)
        wl = atms["qcb3"] * rho * 1000.0          # g/m³
        if self.ichremlsc or self.ichremcvc:
            wt_ten, wflx = wetdep_tend(
                chib, cpl, tb3, wl, cldfra_ls, cum_cldfra, remrat,
                kcumtop, kcumbot, rembc, conv_prate, pdepv,
                self.bin_diam, self.rhop, self.sol, dzq, rho, dt,
                ichremlsc=self.ichremlsc, ichremcvc=self.ichremcvc)
            am = self.aer_mask[:, None, None, None]
            chiten = chiten + jnp.where(am, wt_ten, 0.0)
            diag["wdflx"] = wflx

        # -- sulfur chemistry (chemsox) --------------------------------
        if self.iso2 is not None and self.iso4 is not None \
                and self.oxcl is not None:
            from .sox import chemsox
            rpsb = atms.get("rpsb")
            unc = lambda a: a * rpsb if rpsb is not None else a
            out = chemsox(unc(chib[self.iso2]), unc(chib[self.iso4]),
                          rho, tb3,
                          atms.get("coszrs", jnp.zeros_like(psb)),
                          wl, cldfra_ls, cum_cldfra, kcumtop,
                          rembc * 3600.0, self.oxcl[0], self.oxcl[1],
                          dt)
            chiten = chiten.at[self.iso2].add(out.so2_ten * cpl[None])
            chiten = chiten.at[self.iso4].add(out.so4_ten * cpl[None])
            diag["so2_wash"] = out.washout_so2

        # -- carbonaceous aging (aging_carb) ---------------------------
        if self.aging_pairs:
            from .carbon import aging_tend
            rpsb = atms.get("rpsb")
            unc = chib * rpsb[None] if rpsb is not None else chib
            at = aging_tend(unc, self.aging_pairs, dt)
            chiten = chiten + at * cpl[None]

        # -- CBMZ gas-phase solver (chemistry, on dtchsolv) ------------
        if self.cbmz is not None:
            chemten = self.cbmz(atms, s, chib, cpl, dt)
            chiten = chiten + chemten

        # -- SNA equilibrium repartition (aerodriver,
        #    mod_che_isorropia.F90:64-161, iisoropia==1) --------------
        if self.sna is not None:
            chiten = chiten + self.sna(atms, s, chib, cpl, dt)

        return chiten * core.m_ci[None, None], diag


def build_chem(cfg, grid, dtype=None):
    """Config-time chemistry factory (mod_che_start start_chem
    equivalent): None when ichem=0, a ChemTend for supported
    chemsimtypes, ValueError otherwise."""
    if cfg.physics.ichem == 0:
        return None
    spec = build_species(cfg.chem.chemsimtype)
    if spec is None:
        raise ValueError("ichem=1 requires chemparam chemsimtype")
    return ChemTend(cfg, grid, spec, dtype=dtype)
