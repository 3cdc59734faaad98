"""Chemistry tendency orchestration — the ``tractend2`` equivalent
(``Main/chemlib/mod_che_tend.F90:63-583``) for the aerosol (dust)
simulations.

Called from inside PhysicsSuite at the reference's call site (tend →
physical_parametrizations → tractend2): computes the surface-layer
met fields (10 m wind, aerodynamic resistance), natural emission
fluxes, settling/dry deposition and wet scavenging, and returns the
coupled tracer tendency ``chiten`` plus accumulated diagnostics.

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
    """Dust-chemistry tendency operator bound to one grid/config."""

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
        # texture fractions (dustsotex): fractional field from DOMAIN
        # when present, else one-hot of the dominant texture class
        iy, jx = grid.iy, grid.jx
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
                                 rdstemfac=self.rdstemfac, dtype=dtype)
        self.bin_diam = f(spec.bin_diam)
        self.rhop = f(spec.rhop)
        self.sol = f(spec.sol)

    def __call__(self, core, atms, s, cldfra_ls, cum_cldfra,
                 remrat, rembc, conv_prate, dt
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
        vegfrac = lncl
        snowfrac = scvk

        ustar, xra = aerodyresis(self.zeff, wid10, temp10, tsurf,
                                 rh10, srad, self.water)

        chiten = jnp.zeros_like(chib)
        diag: Dict[str, jax.Array] = {}

        # -- dust emission (sfflux, mod_che_dust.F90:547) --------------
        if self.ichsursrc:
            rsfrow = self.dust(ustar, self.zeff, soilw, wid10,
                               rho[kz - 1], vegfrac, snowfrac)
            # kg/m²/s → coupled kg/kg/s·p* into the lowest layer
            chiten = chiten.at[:, kz - 1].add(
                rsfrow / (dzq[kz - 1] * rho[kz - 1])[None]
                * cpl[None])
            diag["emflx"] = rsfrow

        # -- settling + dry deposition (drydep_aero) -------------------
        if self.ichdrdepo:
            dd = drydep_aero(self.bin_diam, self.rhop, tb3, rho,
                             atms["pb3"], self.ivegcov, ustar, xra)
            st_ten, ddflx = settling_tend(
                chib, cpl, dd.pdepv, dd.ddepv, dzq, rho,
                core.twt1, core.twt2, dt)
            chiten = chiten + st_ten
            diag["ddflx"] = ddflx
            pdepv = dd.pdepv
        else:
            pdepv = jnp.zeros((self.ntr, kz) + psb.shape, chib.dtype)

        # -- wet deposition (wetdepa) ----------------------------------
        if self.ichremlsc or self.ichremcvc:
            # cumulus bounds from the convective cloud fraction
            has = cum_cldfra > 1e-3
            anyc = jnp.any(has, axis=0)
            kcumtop = jnp.where(
                anyc, jnp.argmax(has.astype(jnp.int32), axis=0), -1)
            kcumbot = jnp.where(
                anyc, kz - 1 - jnp.argmax(
                    jnp.flip(has, 0).astype(jnp.int32), axis=0), -1)
            wl = atms["qcb3"] * rho * 1000.0          # g/m³
            wt_ten, wflx = wetdep_tend(
                chib, cpl, tb3, wl, cldfra_ls, cum_cldfra, remrat,
                kcumtop, kcumbot, rembc, conv_prate, pdepv,
                self.bin_diam, self.rhop, self.sol, dzq, rho, dt,
                ichremlsc=self.ichremlsc, ichremcvc=self.ichremcvc)
            chiten = chiten + wt_ten
            diag["wdflx"] = wflx

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
