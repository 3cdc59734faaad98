"""Physics suite: ordered column-physics orchestration.

Replicates ``physical_parametrizations`` (``Main/mod_tendency.F90:
1682-1820``): cumulus → cloud fraction + resolved microphysics →
radiation (dtrad alarm) → surface model (dtsrf alarm) → PBL. Returns
coupled physics tendencies for the dynamical core plus persistent-state
updates (Tg, fluxes, heating rates, precip accumulators).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.state import HydroState, BdyState, StepFlags, IQV, IQC
from ..utils import constants as c
from .micro.subex import subex, subex_cldfrac, combine_clouds
from .cumulus.emanuel import cupeman, ELCRIT_LND, ELCRIT_OCN, EPMAX
from .pbl.holtslag import holtbl
from .radiation.simple import radiation, surface_albedo
from .surface.fluxes import surface_fluxes
from ..dynamics.stencil import cross2dot


# Selector values this framework implements. Config-time validation
# mirrors the reference's cross-check-and-die behavior in ``param``
# (Main/mod_params.F90) — an unimplemented selector must be a hard error
# at model build, never a silent no-op.
SUPPORTED = dict(
    icup={0, 1, 2, 3, 4, 5, 6},    # Kuo/Grell/BM/Emanuel/Tiedtke/KF
    ibltyp={0, 1, 2, 3, 4},        # Holtslag / UW TCM / GFS / MYJ
    ipptls={0, 1, 2, 3},           # SUBEX / nogtom / WSM5
    iocnflx={1, 2, 3},             # BATS / Zeng / COARE
    icldfrac={0, 1, 2, 3, 4, 5, 6},
    irrtm={0},                     # CCM3 only (RRTMG later round)
    iboudy={0, 1, 2, 3, 4, 5},
)


def validate_physics(cfg):
    """Raise ValueError for any selector the framework does not implement
    (the reference cross-validates namelists in mod_params and calls
    ``fatal``; silent fallback is the worst failure mode)."""
    p = cfg.physics
    checks = [
        ("icup_lnd", abs(p.icup_lnd), SUPPORTED["icup"]),
        ("icup_ocn", abs(p.icup_ocn), SUPPORTED["icup"]),
        ("ibltyp", p.ibltyp, SUPPORTED["ibltyp"]),
        ("ipptls", p.ipptls, SUPPORTED["ipptls"]),
        ("iocnflx", p.iocnflx, SUPPORTED["iocnflx"]),
        ("icldfrac", p.icldfrac, SUPPORTED["icldfrac"]),
        ("irrtm", p.irrtm, SUPPORTED["irrtm"]),
        ("iboudy", p.iboudy, SUPPORTED["iboudy"]),
    ]
    for name, val, ok in checks:
        if val not in ok:
            raise ValueError(
                f"physicsparam {name}={val} is not implemented in "
                f"regcm_tpu (supported: {sorted(ok)}). Refusing to run "
                f"with a silently-disabled scheme.")
    if cfg.dim.nsg > 1:
        if cfg.core.idynamic == 3:
            raise ValueError(
                "dimparam nsg>1 (subgrid surface) is not wired for "
                "the MOLOCH core yet (idynamic=3)")
        if p.ichem != 0:
            raise ValueError(
                "ichem=1 with nsg>1 subgrid surface is not wired yet")
        if str(p.extras.get("land_scheme", "bats1e")) != "bats1e":
            raise ValueError("nsg>1 requires the BATS1e land scheme")
    if p.ichem != 0:
        # validate the tracer set (raises for unsupported chemsimtypes
        # — gas phase CBMZ/CB6r2, SSLT/CARB/SULF stay refused loudly)
        from ..chem.species import build_species
        build_species(cfg.chem.chemsimtype)
        if cfg.core.idynamic == 2:
            raise ValueError(
                "ichem=1 tracer advection is not wired for the MM5-NH "
                "core (idynamic=2) yet; use idynamic 1 or 3")
        if int(cfg.chem.ichdrdepo) == 2:
            raise ValueError(
                "chemparam ichdrdepo=2 (deposition through the BL "
                "flux) is not implemented; use ichdrdepo=1")
        if p.ibltyp != 1:
            raise ValueError(
                "ichem=1 tracer PBL mixing is implemented for "
                "ibltyp=1 (Holtslag) only")
        if p.ipptls != 1:
            raise ValueError(
                "ichem=1 wet scavenging needs the SUBEX removal-rate "
                "diagnostics (ipptls=1); nogtom/WSM5 remrat is not "
                "wired yet")
    if cfg.core.idynamic == 3 and 1 in (abs(p.icup_lnd), abs(p.icup_ocn)):
        raise ValueError(
            "icup=1 (Kuo) requires the sigma-p cores' deferred qv "
            "vertical advection staging and is not available with the "
            "MOLOCH core (idynamic=3)")
    if cfg.core.idynamic == 3 and p.ibltyp == 2:
        raise ValueError(
            "ibltyp=2 (UW TCM) needs the MOLOCH WAF TKE advection "
            "path, which is not wired yet; use ibltyp 1/3/4 with "
            "idynamic=3")


class PhysicsSuite:
    """Callable plugged into HydroCore (core.physics)."""

    def __init__(self, cfg, grid):
        validate_physics(cfg)
        self.cfg = cfg
        self.grid = grid
        self.ricr = 0.25      # ricr_lnd/ocn default (mod_params.F90:485)
        # land/ocean cumulus split (icup_lnd/icup_ocn,
        # Main/mpplib/mod_runparams.F90:109-153): when they differ each
        # scheme runs on the full dense grid and the tendencies are
        # blended by the land mask (TPU-idiomatic masked batching).
        self.icup_lnd = max(cfg.physics.icup_lnd, 0)
        self.icup_ocn = max(cfg.physics.icup_ocn, 0)
        self.idynamic = cfg.core.idynamic
        # the dycore defers qv vertical advection to the Kuo scheme
        # (mod_tendency.F90:1371-1373); a mixed Kuo/other configuration
        # would leave the non-Kuo columns without vadv — refuse it.
        self.kuo_defer = 1 in (self.icup_lnd, self.icup_ocn)
        if self.kuo_defer and self.icup_lnd != self.icup_ocn:
            raise ValueError(
                "icup=1 (Kuo) cannot be mixed with a different scheme on "
                "the other surface type (deferred qv vadv contract)")
        # shallow convection runs everywhere when any icup < 0
        # (mod_tendency.F90:316, shallcu has no land/ocean gating)
        self.shallow = (cfg.physics.icup_lnd < 0
                        or cfg.physics.icup_ocn < 0)
        # Kain-Fritsch (icup=6): config-time saturation-point tables
        # + namelist parameters; the trigger needs the running-mean w
        # held in state (wavg, updated every step below)
        self.uses_kf = 6 in (self.icup_lnd, self.icup_ocn)
        if self.uses_kf:
            from .cumulus.kain_fritsch import KFTables, KFParams
            kfn = cfg.kf
            cld = cfg.raw.get("cldparam", {}) if cfg.raw else {}
            self._kf_tab = KFTables.build(cfg.ptop_cb * 1000.0)
            self._kf_par = KFParams(
                entrate=float(kfn.kf_entrate),
                convrate=float(kfn.kf_convrate),
                min_pef=float(kfn.kf_min_pef),
                max_pef=float(kfn.kf_max_pef),
                dpp=float(kfn.kf_dpp),
                min_dtcape=float(kfn.kf_min_dtcape),
                max_dtcape=float(kfn.kf_max_dtcape),
                tkemax=float(kfn.kf_tkemax),
                wthreshold=float(kfn.kf_wthreshold),
                k2_const=float(cld.get("k2_const", 500.0)),
                kfac_shal=float(cld.get("kfac_shal", 0.07)),
                kfac_deep=float(cld.get("kfac_deep", 0.14)))
        if 1 in (self.icup_lnd, self.icup_ocn):
            from .cumulus.kuo import build_kuo_tables
            import numpy as _np
            tw, vq = build_kuo_tables(grid.sigma, grid.hsigma,
                                      grid.dsigma, grid.ptop)
            self._kuo_tabs = (jnp.asarray(tw), jnp.asarray(vq))
        # minorig: lowest Emanuel origin level (mod_params.F90:2352-2355)
        import numpy as _np
        hs = grid.hsigma
        kl = [k for k in range(len(hs)) if hs[k] <= 0.950]
        self.minorig = grid.kz - (max(kl) + 1) if kl else 1
        # GHG scenario concentrations at the run start year
        # (set_scenario, Main/mpplib/mod_ipcc_scenario.F90:216)
        from .radiation.ghg import ghg_concentrations
        year = cfg.restart.mdate0 // 1000000 \
            if getattr(cfg, "restart", None) else 1990
        self.ghg = ghg_concentrations(
            cfg.physics.scenario, float(year),
            int(cfg.physics.extras.get("ghg_year_const", 1950)))
        # radiation scheme: the full CCM3 column model is the irrtm=0
        # default (colmod3, Main/radlib/mod_rad_colmod3.F90:207); the
        # calibrated broadband surrogate stays available as a debug
        # option (physicsparam extras rad_scheme='broadband')
        self.rad_scheme = str(cfg.physics.extras.get("rad_scheme",
                                                     "ccm3"))
        if self.rad_scheme == "ccm3":
            from .radiation.ccm3.tables import ghg_mmr
            # CFC-11/12 from the scenario ODS record (extras override)
            self.ghg_mmr = ghg_mmr(dict(
                co2=self.ghg["co2ppm"], ch4=self.ghg["ch4ppb"],
                n2o=self.ghg["n2oppb"],
                cfc11=float(cfg.physics.extras.get(
                    "cfc11ppt", self.ghg["cfc11ppt"])),
                cfc12=float(cfg.physics.extras.get(
                    "cfc12ppt", self.ghg["cfc12ppt"]))))
        # config-time TSI fallback (per-day value arrives via
        # atms["solcon"] from the driver's solar_state)
        self.solcon = float(cfg.physics.extras.get("fixedsolarval",
                                                   1367.0))
        self.xlat = jnp.asarray(grid.xlat)
        # interactive chemistry (tractend2 equivalent; ichem=1)
        self.chem = None
        self.aertab = None
        if cfg.physics.ichem:
            from ..chem.tend import build_chem
            self.chem = build_chem(cfg, grid)
            ndust = len(self.chem.spec.indices("dust"))
            if int(cfg.chem.idirect) >= 2 and \
                    ndust == self.chem.ntr and ndust > 0:
                # aerosol direct effect fed back into radiation
                # (idirect=2; aeroppt tables for the external dust
                # mixture — mixed/gas sets await their optics tables)
                from ..chem.optics import dust_optics_tables
                self.aertab = dust_optics_tables(self.chem.ntr)
        # BATS1e land model (mod_bats_*, the reference's default land
        # scheme): per-point landuse/texture from the DOMAIN fields
        # (grid.extras lveg/ltex; defaults: short grass over land,
        # ocean class 15 over water, loam texture)
        self.land_scheme = str(cfg.physics.extras.get("land_scheme",
                                                      "bats1e"))
        # nnsg subgrid: nsg×nsg surface subcells per coarse cell
        # (Share/mod_dynparam.F90 nsg; BATS batched over nnsg,
        # Main/batslib/mod_bats_common.F90 + the rdnnsg flux averaging
        # of Main/mod_lm_interface.F90:542-545)
        self.nnsg = max(int(cfg.dim.nsg), 1) ** 2
        if self.land_scheme == "bats1e":
            import numpy as _np
            from .surface.bats import soil_static
            lveg = _np.asarray(grid.extras.get(
                "lveg", _np.where(grid.lndocn > 0.5, 2, 15)))
            ltex = _np.asarray(grid.extras.get(
                "ltex", _np.full((grid.iy, grid.jx), 6)))
            self.bats_ss_np = soil_static(lveg, ltex)
            self.bats_ss = {k: jnp.asarray(v)
                            for k, v in self.bats_ss_np.items()}
            if self.nnsg > 1:
                shp = (self.nnsg, grid.iy, grid.jx)
                lvs = _np.asarray(grid.extras.get(
                    "lveg_sub", _np.broadcast_to(lveg, shp)))
                lts = _np.asarray(grid.extras.get(
                    "ltex_sub", _np.broadcast_to(ltex, shp)))
                # per-subcell land mask (ocean/lake classes 14/15)
                self.lnd_sub = jnp.asarray(
                    ((lvs != 14) & (lvs != 15)).astype(float))
                self.bats_ss_sub_np = soil_static(lvs, lts)
                self.bats_ss_sub = {k: jnp.asarray(v) for k, v
                                    in self.bats_ss_sub_np.items()}
        # Hostetler lake model (lakemod=1, mod_ocn_lake.F90): static
        # depth index / extinction / mask from the DOMAIN lake-depth
        # field (grid.extras["dhlake"], m)
        self.lakemod = cfg.physics.lakemod
        if self.lakemod == 1:
            import numpy as _np
            from .surface.lake import init_lake
            dh = _np.asarray(grid.extras.get(
                "dhlake", _np.zeros((grid.iy, grid.jx))))
            nlak = int(cfg.physics.extras.get("lake_ndpmax", 100))
            _, eta, idep = init_lake(dh, grid.xlat,
                                     _np.full(dh.shape, 288.0), nlak)
            self.lake_eta = jnp.asarray(eta)
            self.lake_idep = jnp.asarray(idep)
            self.lakmsk = jnp.asarray(
                ((dh >= 2.0) & (grid.lndocn < 0.5)).astype(float))

    # -- deep cumulus dispatch (cu_interface :335-369 + the icup_lnd/ocn
    #    split of Main/mpplib/mod_runparams.F90:109-153) -----------------
    def _cumulus(self, core, atms, s, flags, dyn, dt):
        """Run the configured deep scheme(s) dense over the grid and
        blend land/ocean tendencies by mask. All outputs are uncoupled
        cross-grid fields (K/s, kg/kg/s, m/s²)."""
        tb3 = atms["tb3"]
        zero3 = jnp.zeros_like(tb3)
        zero2 = jnp.zeros_like(atms["psb"])
        empty = dict(tten=zero3, qvten=zero3, utenx=zero3, vtenx=zero3,
                     prate=zero2, has_precip=False,
                     cldfra=zero3, cldlwc=zero3, qcten=zero3,
                     qiten=zero3, qdetr=zero3, state={})
        if self.kuo_defer and dyn is not None:
            # non-convecting columns still need the deferred qv vadv
            # term back (mod_cu_kuo.F90:270-282), every step
            rcpl = 1.0 / atms.get("cpl", atms["psb"])
            empty["qvten"] = dyn["qv_vadv"] * rcpl[None]
        if not flags.do_cum or (self.icup_lnd == 0 and self.icup_ocn == 0):
            return empty
        out_l = self._cumulus_one(self.icup_lnd, core, atms, s, dyn, dt) \
            if self.icup_lnd else empty
        if self.icup_ocn == self.icup_lnd:
            return out_l
        out_o = self._cumulus_one(self.icup_ocn, core, atms, s, dyn, dt) \
            if self.icup_ocn else empty
        lm2 = core.grid_lndocn > 0.5
        lm3 = lm2[None]
        b3 = lambda k: jnp.where(lm3, out_l[k], out_o[k])
        cur = dict(cbmf=s.cbmf, cldefi=s.cldefi)
        state = {}
        for k in set(out_l["state"]) | set(out_o["state"]):
            state[k] = jnp.where(lm2, out_l["state"].get(k, cur[k]),
                                 out_o["state"].get(k, cur[k]))
        return dict(tten=b3("tten"), qvten=b3("qvten"),
                    utenx=b3("utenx"), vtenx=b3("vtenx"),
                    prate=jnp.where(lm2, out_l["prate"], out_o["prate"]),
                    has_precip=(out_l["has_precip"]
                                or out_o["has_precip"]),
                    cldfra=b3("cldfra"), cldlwc=b3("cldlwc"),
                    qcten=b3("qcten"), qiten=b3("qiten"),
                    qdetr=b3("qdetr"), state=state)

    def _cumulus_one(self, icup, core, atms, s, dyn, dt):
        """One deep-convection scheme on the full dense grid."""
        kz = core.kz
        tb3 = jnp.maximum(atms["tb3"], 150.0)
        qvb3 = atms["qvb3"]
        pb3 = atms["pb3"]
        pf3 = atms["pf3"]
        rho = atms["rhob3"]
        psb = atms["psb"]
        cpl = atms.get("cpl", psb)
        rcpl = (1.0 / cpl)[None]
        zero3 = jnp.zeros_like(tb3)
        iy, jx = tb3.shape[1], tb3.shape[2]
        ncol = iy * jx
        flipc = lambda a: jnp.flip(a, axis=0).reshape(kz, ncol).T
        unflip = lambda a: jnp.flip(a.T.reshape(kz, iy, jx), axis=0)
        res = dict(utenx=zero3, vtenx=zero3, has_precip=True,
                   cldfra=zero3, cldlwc=zero3, qcten=zero3,
                   qiten=zero3, qdetr=zero3, state={})

        if icup == 1:
            # Kuo (cupara, Main/cumlib/mod_cu_kuo.F90:75): moisture-
            # convergence triggered; convecting columns get the Kuo
            # tendencies, the rest the deferred plain qv vadv term.
            from .cumulus.kuo import kuo
            tw, vq = self._kuo_tabs
            hs = self.grid.hsigma
            import numpy as _np
            k700 = int(_np.argmax(hs * 95.0 + 5.0 > 70.0)) + 1
            out = kuo(tb3, qvb3, pb3 * 1e-3, psb + core.ptop,
                      dyn["qvhadv"],
                      jnp.asarray(self.grid.sigma, tb3.dtype),
                      jnp.asarray(self.grid.hsigma, tb3.dtype),
                      jnp.asarray(self.grid.dsigma, tb3.dtype),
                      tw, vq, core.ptop, k700)
            am = out.active[None]
            res.update(
                tten=out.tten,
                qvten=jnp.where(am, out.qvten,
                                dyn["qv_vadv"] * rcpl),
                prate=out.prate)
        elif icup == 2:
            # Grell (FC80 closure; AS74 staged via forced profile)
            from .cumulus.grell import cup as grell_cup
            tn3 = tb3 + (dyn["tdyn"] * rcpl * dt
                         if dyn is not None else 0.0)
            qo3 = qvb3 + (dyn["qvdyn"] * rcpl * dt
                          if dyn is not None else 0.0)
            out = grell_cup(
                flipc(tb3), flipc(qvb3), flipc(tn3), flipc(qo3),
                flipc(pb3) * 0.01,
                atms["ps2d"].reshape(ncol) * 0.01,
                (core.ht / c.egrav).reshape(ncol),
                flipc(jnp.sqrt(atms["ubx3"] ** 2 + atms["vbx3"] ** 2)),
                dt, igcc=self.cfg.physics.igcc,
                kbmax=int((self.grid.hsigma > 0.4).sum()) - 1)
            cldfra = unflip(out.cldfrc)
            res.update(
                tten=unflip(out.outt), qvten=unflip(out.outq),
                prate=out.pratec.reshape(iy, jx),
                cldfra=cldfra,
                cldlwc=jnp.where(cldfra > 0.0, 0.3e-3 * 1000.0 * rho,
                                 0.0))
        elif icup == 3:
            # Betts-Miller (bmpara, Main/cumlib/mod_cu_bm.F90:134);
            # arrays already top-down, no flip.
            from .cumulus.betts_miller import (bmpara,
                                               model_cumulus_cloud,
                                               clwfromt)
            colc = lambda a: a.reshape(kz, ncol).T
            za = atms["za"]
            out = bmpara(colc(tb3), colc(qvb3), colc(pb3),
                         pf3.reshape(kz + 1, ncol).T,
                         colc(za + (core.ht / c.egrav)[None]),
                         atms["ps2d"].reshape(ncol),
                         core.grid_lndocn.reshape(ncol),
                         s.cldefi.reshape(ncol), dt)
            uncol = lambda a: a.T.reshape(kz, iy, jx)
            cldfra = uncol(model_cumulus_cloud(
                out.kbot, out.ktop, kz, float(self.cfg.geo.ds)))
            res.update(
                tten=uncol(out.tten), qvten=uncol(out.qten),
                prate=out.prate.reshape(iy, jx),
                cldfra=cldfra,
                cldlwc=jnp.where(cldfra > 0.001, clwfromt(tb3), 0.0),
                state=dict(cldefi=out.cldefi.reshape(iy, jx)))
        elif icup == 4:
            # Emanuel (cupemandrv, Main/cumlib/mod_cu_em.F90:107)
            qmix = qvb3
            qspec = qmix / (1.0 + qmix)
            qs_spec = atms["qsb3"] / (1.0 + atms["qsb3"])
            phflip = jnp.flip(pf3, axis=0).reshape(kz + 1, ncol).T
            # internal tracer transport (chemcutran, mod_cu_em.F90:
            # :454, :605-1150): mixing ratios ride the same plume /
            # downdraft algebra as u/v; applied on alarm steps only
            tra_em = None
            if (self.chem is not None and self.chem.ntr > 0
                    and self.cfg.chem.ichcumtra == 1):
                chi_u = jnp.maximum(
                    s.chi_b * atms["rpsb"][None], 0.0)
                tra_em = jnp.flip(jnp.transpose(
                    chi_u.reshape(self.chem.ntr, kz, ncol),
                    (2, 1, 0)), axis=1)       # (ncol, kz, ntr) bot-up
            out = cupeman(
                flipc(tb3), flipc(qspec), flipc(qs_spec),
                flipc(atms["ubx3"]), flipc(atms["vbx3"]),
                flipc(pb3) * 0.01, phflip * 0.01,
                s.cbmf.reshape(ncol), dt,
                jnp.where(core.grid_lndocn.reshape(ncol) > 0.5,
                          ELCRIT_LND, ELCRIT_OCN),
                jnp.full((ncol,), EPMAX, tb3.dtype),
                max(self.minorig - 1, 1),   # 0-based origin level
                tra=tra_em)
            qspec2 = flipc(qspec)
            cldfra = unflip(out.cldfra)
            res.update(
                tten=unflip(out.ft),
                qvten=unflip(out.fq / (1.0 - qspec2) ** 2),
                utenx=unflip(out.fu), vtenx=unflip(out.fv),
                prate=out.precip.reshape(iy, jx),
                cldfra=cldfra,
                cldlwc=jnp.where(cldfra > 0.0, 0.3e-3 * 1000.0 * rho,
                                 0.0),
                state=dict(cbmf=out.cbmf.reshape(iy, jx) * core.m_ci))
            if tra_em is not None:
                res["_emftra"] = out.ftra     # (ncol, kz, ntr) bot-up
        elif icup == 5:
            # "new Tiedtke" mass-flux scheme (ntiedtke,
            # Main/cumlib/mod_cu_tiedtke.F90:4508, driver tiedtkedrv
            # :207-434): specific-humidity basis in, mixing-ratio
            # tendencies out (:380-391); detrained condensate rides
            # qcten/qiten (+qdetr staged into nogtom, :392).
            from .cumulus.tiedtke import ntiedtke
            import numpy as _np
            colc = lambda a: a.reshape(kz, ncol).T
            uncol = lambda a: a.T.reshape(kz, iy, jx)
            # provisional state updated with the dynamic tendencies
            # (cucall :601-609: ztp1 = t + tte·dt etc) and ZERO
            # surface fluxes — the reference calls BL after CU
            # (:700-704), so the surface-flux shallow trigger is off
            if dyn is not None:
                tq = (dyn["qvdyn"] * rcpl)
                tt = dyn["tdyn"] * rcpl
            else:
                tq = zero3
                tt = zero3
            tb3p = tb3 + tt * dt
            qvb3p = jnp.maximum(qvb3 + tq * dt, c.minqq)
            qspec = qvb3p / (1.0 + qvb3p)
            qc_spec = atms["qcb3"] / (1.0 + qvb3p)
            za_c = colc(atms["za"])
            zf_mid = 0.5 * (za_c[:, :-1] + za_c[:, 1:])
            zf = jnp.concatenate(
                [2.0 * za_c[:, :1] - zf_mid[:, :1], zf_mid,
                 jnp.zeros_like(za_c[:, :1])], axis=1)
            qhfl = jnp.zeros((ncol, kz + 1), tb3.dtype)
            ahfs = jnp.zeros((ncol, kz + 1), tb3.dtype)
            tq_spec = tq / (1.0 + qvb3p) ** 2
            out = ntiedtke(
                colc(tb3p), colc(qspec), colc(atms["ubx3"]),
                colc(atms["vbx3"]), colc(qc_spec), qhfl, ahfs,
                colc(pb3), pf3.reshape(kz + 1, ncol).T,
                za_c * c.egrav, zf * c.egrav, colc(tq_spec),
                colc(tt),
                core.grid_lndocn.reshape(ncol) > 0.5,
                float(core.dtsec), float(self.cfg.ds_m),
                _np.asarray(self.grid.hsigma) * c.stdp,
                omega=colc(atms["omega_pa"]),
                lmfmid=bool(self.cfg.tiedtke.lmfmid),
                lmfsmooth=bool(self.cfg.tiedtke.lmfsmooth))
            qspec_c = colc(qspec)
            qcten = out.lten
            qiten = jnp.zeros_like(out.iten)
            if self.cfg.physics.ipptls == 2:
                qiten = out.iten          # :398-409
            else:
                qcten = qcten + out.iten  # :415-421
            cldfra = uncol(out.cldfra)
            res.update(
                tten=uncol(out.tten),
                qvten=uncol(out.qten / (1.0 - qspec_c) ** 2),
                utenx=uncol(out.uten), vtenx=uncol(out.vten),
                prate=out.prate.reshape(iy, jx),
                cldfra=cldfra,
                cldlwc=jnp.where(cldfra > 0.0, 0.3e-3 * 1000.0 * rho,
                                 0.0),
                qcten=uncol(qcten), qiten=uncol(qiten),
                qdetr=uncol(out.qdetr))
            # stash the tracer-transport interface for the chem hook
            # (ctracer runs inside the scheme on alarm steps only)
            res["_tdk"] = out
        elif icup == 6:
            # Kain-Fritsch (kfdrv/kfpara, Main/cumlib/mod_cu_kf.F90):
            # bottom-up column layout; the trigger reads the running-
            # mean w carried in state (avg_ww). ipptls>1 feeds back
            # mixed-phase hydrometeors (f_qi); the qr/qs tendencies
            # ride the qcten/qiten slots of the 9-slot cuten pack
            # (documented deviation — the micro autoconverts them).
            from .cumulus.kain_fritsch import kfpara
            qhb3 = atms["qhb3"]
            f_qi = self.cfg.physics.ipptls > 1
            ql0 = flipc(atms["qcb3"])
            qi0 = flipc(qhb3[2]) if (f_qi and core.nqx == 5) \
                else jnp.zeros_like(ql0)
            if self.cfg.physics.ibltyp == 2:
                tkei = s.tke_b
                tkec = 0.5 * (tkei[:-1] + tkei[1:])
            else:
                tkec = jnp.full_like(tb3, self._kf_par.tkemax)
            wavg = atms.get("_wavg", s.wavg)
            out = kfpara(
                self._kf_tab, self._kf_par, flipc(tb3), flipc(qvb3),
                flipc(atms["ubx3"]), flipc(atms["vbx3"]),
                flipc(atms["za"]), flipc(pb3), flipc(rho),
                flipc(atms["dzq"]), flipc(wavg), flipc(tkec),
                ql0, qi0, float(core.dtsec), float(self.cfg.ds_m),
                f_qi=f_qi)
            qcten = unflip(out.dqcdt + out.dqrdt)
            qiten = unflip(out.dqidt + out.dqsdt)
            cldfra = unflip(out.cldfra)
            res.update(
                tten=unflip(out.dtdt), qvten=unflip(out.dqdt),
                prate=out.prate.reshape(iy, jx),
                cldfra=cldfra,
                cldlwc=jnp.where(cldfra > 0.0, 0.3e-3 * 1000.0 * rho,
                                 0.0),
                qcten=qcten, qiten=qiten)
        else:
            raise ValueError(f"icup={icup} not implemented")
        return res

    def __call__(self, core, atms, s: HydroState, bdy: BdyState,
                 flags: StepFlags, dt, dyn=None):
        kz = core.kz
        psb = atms["psb"]
        tb3 = jnp.maximum(atms["tb3"], 150.0)
        qvb3 = atms["qvb3"]
        qcb3 = atms["qcb3"]
        pb3 = atms["pb3"]
        pf3 = atms["pf3"]
        rho = atms["rhob3"]
        rh = atms["rhb3"]
        za = atms["za"]
        dzq = atms["dzq"]
        m_ci = core.m_ci

        # tendency coupling factor: p* for the sigma-p cores (coupled
        # prognostics), 1 for MOLOCH (uncoupled; see mod_moloch.F90:1546
        # "t = t + dtsec*tten" vs the ×psb coupling in cu_interface)
        cpl = atms.get("cpl", psb)

        tphy = jnp.zeros_like(tb3)
        qvphy = jnp.zeros_like(tb3)
        qcphy = jnp.zeros_like(tb3)
        # extra hydrometeor tendencies (5-species schemes, nqx=5)
        qrphy = jnp.zeros_like(tb3)
        qiphy = jnp.zeros_like(tb3)
        qsphy = jnp.zeros_like(tb3)
        # cross-grid uncoupled wind tendencies, staggered+coupled once at
        # the end (uvcross2dot for B-grid cores / tenxtouvten for MOLOCH)
        utenx = jnp.zeros_like(tb3)
        vtenx = jnp.zeros_like(tb3)
        uphy = jnp.zeros_like(tb3)
        vphy = jnp.zeros_like(tb3)
        sfupd: Dict[str, jax.Array] = {}

        # -- cumulus (mod_tendency.F90:1686; cu_interface :251-535) ------
        # land/ocean scheme split: run each scheme dense, blend by mask.
        # The scheme runs on the syncro_cum alarm (dtcum,
        # mod_cu_interface.F90:288) and its tendencies persist in state
        # between calls; Kuo bypasses the alarm (deferred qv-vadv
        # contract needs the flow every step).
        if self.uses_kf:
            # running-mean w for the KF trigger, updated EVERY step
            # (avg_ww, mod_cu_interface.F90:256-268): weight
            # 1/max(int(max(dtcum,3600)/dt),1); w from -ω/(ρg)
            w1 = 1.0 / max(int(max(self.cfg.time.dtcum, 3600.0)
                               / core.dtsec), 1)
            w_now = -atms["omega_pa"] / (atms["rhob3"] * c.egrav)
            sfupd["wavg"] = (1.0 - w1) * s.wavg + w1 * w_now
            atms["_wavg"] = sfupd["wavg"]
        if self.kuo_defer or flags.do_cum:
            cu = self._cumulus(core, atms, s, flags, dyn, dt)
            if not self.kuo_defer:
                sfupd["cuten"] = jnp.stack(
                    [cu["tten"], cu["qvten"], cu["utenx"], cu["vtenx"],
                     cu["cldfra"], cu["cldlwc"], cu["qcten"],
                     cu["qiten"], cu["qdetr"]])
                sfupd["cuprate"] = cu["prate"]
        else:
            cu = dict(tten=s.cuten[0], qvten=s.cuten[1],
                      utenx=s.cuten[2], vtenx=s.cuten[3],
                      cldfra=s.cuten[4], cldlwc=s.cuten[5],
                      qcten=s.cuten[6], qiten=s.cuten[7],
                      qdetr=s.cuten[8],
                      prate=s.cuprate, has_precip=True, state={})
        cldfra_cum = cu["cldfra"]
        cldlwc_cum = cu["cldlwc"]
        tphy = tphy + cu["tten"] * cpl[None] * m_ci
        qvphy = qvphy + cu["qvten"] * cpl[None] * m_ci
        qcphy = qcphy + cu["qcten"] * cpl[None] * m_ci
        qiphy = qiphy + cu["qiten"] * cpl[None] * m_ci
        utenx = utenx + cu["utenx"]
        vtenx = vtenx + cu["vtenx"]
        if cu["has_precip"]:
            sfupd["rainc"] = s.rainc + cu["prate"] * m_ci * core.dtsec
        sfupd.update(cu["state"])

        # -- cloud fraction + SUBEX (mod_tendency.F90:1715-1740) ---------
        from .cloud.fractions import cldfrac_dispatch
        fcc = cldfrac_dispatch(
            self.cfg.physics.icldfrac, tb3, pb3, qvb3, qcb3, rh,
            atms["qsb3"], core.rh0[None], atms["ps2d"],
            float(self.cfg.geo.ds), landmask=core.grid_lndocn)
        cldlwc, cldfra = combine_clouds(fcc, qcb3, rho, tb3,
                                        cldfra_cum, cldlwc_cum)
        mic_remrat = mic_strappt = None
        if self.cfg.physics.ipptls == 1:
            out = subex(tb3, pb3, pf3, qvb3, qcb3, rh, rho, fcc, cpl, dt,
                        core.qck1, core.cgul, core.cevap, core.caccr)
            tphy = tphy + out.tten * m_ci
            qvphy = qvphy + out.qvten * m_ci
            qcphy = qcphy + out.qcten * m_ci
            precip = out.precip * m_ci
            sfupd["rainnc"] = s.rainnc + precip * core.dtsec
            # chemistry removal-rate diagnostics (remrat 1/s, rembc
            # mm/hr → mm/s via /3600, mod_che_tend.F90:124-127)
            mic_remrat = out.remrat
            mic_strappt = out.rembc / 3600.0
        elif self.cfg.physics.ipptls == 2:
            # Nogherotto-Tompkins 5-species implicit microphysics
            # (nogtom, Main/microlib/mod_micro_nogtom.F90:358).
            # Convective detrainment staging: Tiedtke (icup=5) feeds
            # its cu_qdetr diagnostic here; other schemes run with
            # zero qdetr exactly as the reference does.
            from .micro.nogtom import nogtom
            qhb3 = atms["qhb3"]
            qx5 = jnp.stack([qvb3, qhb3[0], qhb3[1], qhb3[2],
                             qhb3[3]])
            out = nogtom(tb3, qx5, pb3, pf3, rho,
                         cldfra, cu["qdetr"], s.heatrt,
                         atms["omega_pa"], core.grid_lndocn,
                         core.dtsec)
            pfac = cpl[None] * m_ci
            tphy = tphy + out.tten * pfac
            qvphy = qvphy + out.qxten[0] * pfac
            qcphy = qcphy + out.qxten[1] * pfac
            qrphy = qrphy + out.qxten[2] * pfac
            qiphy = qiphy + out.qxten[3] * pfac
            qsphy = qsphy + out.qxten[4] * pfac
            precip = (out.rainnc + out.snownc) * m_ci
            sfupd["rainnc"] = s.rainnc + precip * core.dtsec
        elif self.cfg.physics.ipptls == 3:
            # WSM5 (Main/mod_micro_interface.F90 microscheme → wsm5,
            # Main/microlib/mod_micro_wsm5.F90:214). Tendencies are
            # (new−old)·p*/dt exactly like ptfac coupling (wsm5:296-307).
            from .micro.wsm5 import wsm5
            iy, jx = tb3.shape[1], tb3.shape[2]
            ncol = iy * jx
            colb = lambda a: jnp.flip(a, 0).reshape(kz, ncol).T
            uncolb = lambda a: jnp.flip(a.T.reshape(kz, iy, jx), 0)
            qhb3 = atms["qhb3"]
            out = wsm5(colb(tb3), colb(qvb3), colb(qhb3[0]),
                       colb(qhb3[2]), colb(qhb3[1]), colb(qhb3[3]),
                       colb(pb3), colb(dzq), colb(rho),
                       colb(atms["qsb3"]), colb(rh), core.dtsec)
            pfac = cpl[None] / core.dtsec * m_ci
            tphy = tphy + (uncolb(out.t) - tb3) * pfac
            qvphy = qvphy + (uncolb(out.qv) - qvb3) * pfac
            qcphy = qcphy + (uncolb(out.qc) - qhb3[0]) * pfac
            qrphy = qrphy + (uncolb(out.qr) - qhb3[1]) * pfac
            qiphy = qiphy + (uncolb(out.qi) - qhb3[2]) * pfac
            qsphy = qsphy + (uncolb(out.qs) - qhb3[3]) * pfac
            precip = out.rain.reshape(iy, jx) * m_ci
            sfupd["rainnc"] = s.rainnc + precip * core.dtsec
        else:
            precip = jnp.zeros_like(psb)

        # -- radiation (dtrad alarm; mod_tendency.F90:1744-1782) ---------
        heatrt = s.heatrt
        if flags.do_rad:
            coszrs = atms["coszrs"]
            alb = surface_albedo(coszrs, core.grid_lndocn)
            if self.land_scheme == "bats1e":
                # BATS two-band direct/diffuse land albedo
                # (albedobats → mod_bats_albedo.F90:77), ocean albedo
                # from the bulk zenith formula.  With nnsg>1 the
                # albedo/emissivity are computed per subcell and
                # averaged over land subcells (lm%emissivity =
                # sum(lms%emisv)/nnsg, mod_lm_interface.F90:437).
                from .surface.bats import bats_albedo, fseas_fn
                if self.nnsg > 1:
                    bc = lambda a: jnp.broadcast_to(
                        a[None], (self.nnsg,) + a.shape)
                    swdr, lwdr, swdf, lwdf = bats_albedo(
                        bc(coszrs), s.bats[0], s.bats[6], s.bats[4],
                        s.bats[5], self.bats_ss_sub, self.lnd_sub)
                    nl = jnp.maximum(jnp.sum(self.lnd_sub, 0), 1.0)
                    mean_l = lambda a: jnp.sum(a * self.lnd_sub, 0) \
                        / nl
                    swdr, lwdr, swdf, lwdf = (mean_l(swdr),
                                              mean_l(lwdr),
                                              mean_l(swdf),
                                              mean_l(lwdf))
                    emis_land = mean_l(
                        self.bats_ss_sub["lndemiss"]
                        - self.bats_ss_sub["seasemi"]
                        * fseas_fn(s.bats[0]))
                else:
                    swdr, lwdr, swdf, lwdf = bats_albedo(
                        coszrs, s.bats[0], s.bats[6], s.bats[4],
                        s.bats[5], self.bats_ss, core.grid_lndocn)
                    emis_land = self.bats_ss["lndemiss"] \
                        - self.bats_ss["seasemi"] * fseas_fn(s.bats[0])
                lmm = core.grid_lndocn > 0.5
                aldirs = jnp.where(lmm, swdr, alb)
                aldifs = jnp.where(lmm, swdf, alb)
                aldirl = jnp.where(lmm, lwdr, alb)
                aldifl = jnp.where(lmm, lwdf, alb)
                emis2d_b = jnp.where(lmm, emis_land, 0.985)
                albvs = jnp.where(lmm, self.bats_ss["albvgs"], alb)
                albvl = jnp.where(lmm, self.bats_ss["albvgl"], alb)
            else:
                aldirs = aldifs = aldirl = aldifl = alb
                albvs = albvl = alb
                emis2d_b = jnp.full_like(psb, 0.985)
            # per-day solar forcing from the driver (solar1 outputs,
            # Main/mod_sun.F90:258-330): Berger eccentricity factor +
            # Lean-table TSI; config-time constants as fallback for
            # standalone physics calls
            eccf = atms.get("eccf", 1.0)
            solcon = atms.get("solcon", self.solcon)
            if self.rad_scheme == "ccm3":
                # CCM3 spectral radiation (colmod3/radctl) with the
                # BATS per-band albedos. LW absorptivity/
                # emissivity follow the dtabem alarm (getabetot,
                # Main/mod_rad_interface.F90:62-65): recomputed when
                # flags.do_abem, else read from the state cache.
                from .radiation.ccm3.driver import ccm3_radiation
                qib3 = atms["qhb3"][2] if core.nqx == 5 \
                    else jnp.zeros_like(qcb3)
                abem_cache = None if flags.do_abem else dict(
                    abstot=s.abstot, absnxt=s.absnxt, emstot=s.emstot)
                aer_kw = {}
                if self.aertab is not None:
                    aer_kw = dict(
                        aermmr=jnp.maximum(s.chi_b, 0.0)
                        * atms["rpsb"][None],
                        aertab=self.aertab)
                rad, abem_out = ccm3_radiation(
                    tb3, qvb3, qcb3, qib3, pb3, pf3, rh, dzq,
                    cldfra, cldlwc, coszrs, s.tg, core.grid_lndocn,
                    self.xlat, aldirs, aldifs, aldirl, aldifl,
                    albvs, albvl, emis2d_b,
                    self.ghg_mmr, eccf=eccf, solcon=solcon,
                    five_species=(core.nqx == 5),
                    cache=abem_cache, want_cache=flags.do_abem,
                    **aer_kw)
                if abem_out is not None:
                    sfupd.update(abem_out)
                heatrt = rad.heatrt * m_ci
                swabs = rad.swabs_sfc
                lwnet = rad.lwnet_sfc
            else:
                rad = radiation(tb3, qvb3, pf3, pb3, cldfra, cldlwc,
                                coszrs, s.tg, alb, eccf=eccf,
                                co2ppm=self.ghg["co2ppm"],
                                ch4ppb=self.ghg["ch4ppb"],
                                n2oppb=self.ghg["n2oppb"])
                heatrt = rad.heatrt * m_ci
                swabs = rad.swabs_sfc
                lwnet = rad.lwnet_sfc
            sfupd["swsfc"] = swabs
            sfupd["lwsfc"] = lwnet
        else:
            swabs = s.swsfc
            lwnet = s.lwsfc

        # -- surface model (dtsrf alarm; :1786-1795) ---------------------
        hfx, qfx, uvdrag, tg = s.hfx, s.qfx, s.uvdrag, s.tg
        if flags.do_srf:
            slab = self.cfg.physics.islab_ocean == 1
            # with the slab ocean the prognostic SST lives in tg over
            # ocean points (sfs%tg2 aliasing, mod_slabocean.F90:79)
            sst = s.tg if slab else core.sst
            if self.cfg.physics.idcsst == 1 and not slab:
                # ocean fluxes see the prognostic skin temperature
                # once it is spun up (dcsst, mod_ocn_zeng.F90:101-105)
                sst = jnp.where(s.dcsst[2] > 100.0, s.dcsst[2], sst)
            sf = surface_fluxes(
                atms["ubx3"][kz - 1], atms["vbx3"][kz - 1],
                tb3[kz - 1], qvb3[kz - 1], za[kz - 1],
                atms["ps2d"] / (c.rgas * tb3[kz - 1]),
                atms["ps2d"], s.tg, sst, core.grid_lndocn,
                swabs, lwnet, precip, self.cfg.time.dtsrf,
                iocnflx=self.cfg.physics.iocnflx)
            hfx, qfx, uvdrag, tg = sf.hfx, sf.qfx, sf.uvdrag, sf.tg
            if self.land_scheme == "bats1e":
                # full BATS1e over land points (vecbats,
                # Main/batslib/mod_bats_common.F90:318).  nnsg>1 runs
                # the scheme batched over (nnsg, iy, jx) subcells with
                # per-subcell landuse/texture and averages the fluxes
                # back to the coarse cell (rdnnsg,
                # mod_lm_interface.F90:542-545).
                from .surface.bats import vecbats
                rhox2d_b = atms["ps2d"] / (c.rgas * tb3[kz - 1])
                qs_spec = qvb3[kz - 1] / (1.0 + qvb3[kz - 1])
                prcp_tot = precip + cu["prate"] * m_ci
                if self.nnsg > 1:
                    bc = lambda a: jnp.broadcast_to(
                        a[None], (self.nnsg,) + a.shape)
                    bo = vecbats(
                        bc(tb3[kz - 1]), bc(qs_spec),
                        bc(atms["ubx3"][kz - 1]),
                        bc(atms["vbx3"][kz - 1]), bc(za[kz - 1]),
                        bc(rhox2d_b), bc(atms["ps2d"]), bc(prcp_tot),
                        bc(swabs), bc(-lwnet), bc(swabs),
                        bc(atms["coszrs"]),
                        # subgrid skin T carried as the subsoil tgbrd
                        # (documented deviation: per-subcell tgrd is
                        # folded into the pack)
                        s.bats[0], s.bats, self.bats_ss_sub,
                        self.lnd_sub, self.cfg.time.dtsrf)
                    nl = jnp.maximum(jnp.sum(self.lnd_sub, 0), 1.0)
                    mean_l = lambda a: jnp.sum(a * self.lnd_sub, 0) \
                        / nl
                    lfrac = jnp.mean(self.lnd_sub, axis=0)
                    anyl = lfrac > 0.0
                    blend = lambda ln, oc: jnp.where(
                        anyl, lfrac * ln + (1.0 - lfrac) * oc, oc)
                    hfx = blend(mean_l(bo.sent), hfx)
                    qfx = blend(jnp.maximum(mean_l(bo.evpr), 0.0),
                                qfx)
                    uvdrag = blend(mean_l(bo.drag), uvdrag)
                    tg = blend(mean_l(bo.tgrd), tg)
                else:
                    bo = vecbats(
                        tb3[kz - 1], qs_spec, atms["ubx3"][kz - 1],
                        atms["vbx3"][kz - 1], za[kz - 1], rhox2d_b,
                        atms["ps2d"], prcp_tot, swabs, -lwnet, swabs,
                        atms["coszrs"], s.tg, s.bats, self.bats_ss,
                        core.grid_lndocn, self.cfg.time.dtsrf)
                    lm_b = core.grid_lndocn > 0.5
                    hfx = jnp.where(lm_b, bo.sent, hfx)
                    qfx = jnp.where(lm_b, jnp.maximum(bo.evpr, 0.0),
                                    qfx)
                    uvdrag = jnp.where(lm_b, bo.drag, uvdrag)
                    tg = jnp.where(lm_b, bo.tgrd, tg)
                sfupd["bats"] = bo.bats
            if slab:
                # update_slabocean (mod_regcm_interface path,
                # mod_slabocean.F90:95): mixed-layer energy budget with
                # restoring toward the forcing SST (xtsb%b1 ≈ core.sst)
                from .surface.slab import update_slabocean
                sp = self.cfg.slaboc
                ocmask = core.grid_lndocn < 0.5
                # SOM monthly q-flux adjustment (qflux_adj = qflb0 +
                # xt·qflbt, mod_slabocean.F90:125; qflb0 carries the
                # month-interpolated value via the boundary alarm)
                qadj = 0.0
                if sp.do_qflux_adj and bdy is not None \
                        and getattr(bdy, "qflb0", None) is not None:
                    qadj = bdy.qflb0
                sst_new, _ = update_slabocean(
                    tg, core.sst, ocmask, swabs, -lwnet, hfx, qfx,
                    self.cfg.time.dtsrf,
                    mixed_layer_depth=sp.mixed_layer_depth,
                    do_restore_sst=sp.do_restore_sst,
                    sst_restore_timescale=sp.sst_restore_timescale,
                    qflux_adj=qadj)
                tg = sst_new
            if self.cfg.physics.idcsst == 1 and not slab:
                # Zeng-Beljaars diurnal warm layer + cool skin
                # (mod_ocn_zeng.F90:293-377)
                from .surface.dcsst import dcsst as dcsst_step
                rhox2d_d = atms["ps2d"] / (c.rgas * tb3[kz - 1])
                spd_d = jnp.sqrt(atms["ubx3"][kz - 1] ** 2
                                 + atms["vbx3"][kz - 1] ** 2)
                ustar_d = jnp.sqrt(
                    jnp.maximum(uvdrag, 1e-6) * jnp.maximum(spd_d, 0.1)
                    / rhox2d_d)
                dco = dcsst_step(core.sst, swabs, -lwnet, hfx, qfx,
                                 ustar_d, rhox2d_d, s.dcsst,
                                 core.grid_lndocn,
                                 self.cfg.time.dtsrf)
                ocm_d = core.grid_lndocn < 0.5
                tg = jnp.where(ocm_d, dco.tskin, tg)
                sfupd["dcsst"] = dco.dcsst
            if self.cfg.physics.iseaice == 1:
                # frozen-ocean points override the open-water fluxes
                # (seaice, mod_ocn_bats.F90:105; vecocn dispatch
                # mod_ocn_common.F90:62)
                from .surface.seaice import seaice as seaice_step
                rhox2d_i = atms["ps2d"] / (c.rgas * tb3[kz - 1])
                si = seaice_step(
                    tb3[kz - 1], qvb3[kz - 1], atms["ubx3"][kz - 1],
                    atms["vbx3"][kz - 1], za[kz - 1], rhox2d_i,
                    atms["ps2d"], precip, swabs, -lwnet, sst,
                    s.seaice, core.grid_lndocn, self.cfg.time.dtsrf)
                im = si.icemask > 0.5
                hfx = jnp.where(im, si.sent, hfx)
                qfx = jnp.where(im, si.evpr, qfx)
                uvdrag = jnp.where(im, si.drag, uvdrag)
                tg = jnp.where(im, si.tg, tg)
                sfupd["seaice"] = si.ice
            if self.lakemod == 1:
                # lake points override the ocean fluxes (lakedrv,
                # mod_ocn_lake.F90:203; llake dispatch
                # mod_ocn_common.F90:61)
                from .surface.lake import lakedrv
                rhox2d = atms["ps2d"] / (c.rgas * tb3[kz - 1])
                lk = lakedrv(
                    tb3[kz - 1], qvb3[kz - 1], atms["ubx3"][kz - 1],
                    atms["vbx3"][kz - 1], za[kz - 1], swabs, lwnet,
                    precip, s.hfx, s.qfx, rhox2d, atms["ps2d"],
                    s.tlak, s.lakhi, s.lakice, s.laksnow, s.laksnag,
                    tg, self.lake_eta, self.lake_idep, self.lakmsk,
                    self.xlat, self.cfg.time.dtsrf)
                m = self.lakmsk > 0.5
                hfx = jnp.where(m, lk.sent, hfx)
                qfx = jnp.where(m, jnp.maximum(lk.evpr, 0.0), qfx)
                uvdrag = jnp.where(m, lk.drag, uvdrag)
                tg = jnp.where(m, lk.tg, tg)
                sfupd.update(tlak=lk.tlak, lakhi=lk.lakhi,
                             lakice=lk.lakice, laksnow=lk.laksnow,
                             laksnag=lk.laksnag)
            sfupd.update(hfx=hfx, qfx=qfx, uvdrag=uvdrag, tg=tg)

        # -- PBL (:1799-1819) --------------------------------------------
        if self.cfg.physics.ibltyp == 1:
            tp3 = tb3 * (atms["ps2d"] / pb3) ** c.rovcp
            # kmxpbl: highest allowed PBL level (p > 600 hPa, mkslice
            # Main/mod_slice.F90:342-352)
            above = pb3 > 60000.0
            first_above = jnp.argmax(above.astype(jnp.int32), axis=0)
            any_above = jnp.any(above, axis=0)
            kmx = jnp.where(any_above,
                            jnp.maximum(first_above - 1, 0), kz - 2)
            rhox2d = atms["ps2d"] / (c.rgas * tb3[kz - 1])
            mo = self.idynamic == 3     # MOLOCH: cross winds, uncoupled
            out = holtbl(
                tp3, tb3, pb3, pf3, qvb3, qcb3,
                atms["ubx3"], atms["vbx3"],
                atms["ubx3"] if mo else atms["ubd3"],
                atms["vbx3"] if mo else atms["vbd3"],
                za, dzq, rhox2d, uvdrag, hfx, qfx, tg,
                core.coriol, cpl,
                jnp.ones_like(cpl) if mo else cross2dot(psb),
                kmx, dt, ricr=self.ricr,
                cross2dot_fn=None if mo else cross2dot,
                m_di=None if mo else core.m_di, m_ci=core.m_ci,
                mesh=getattr(core, "mesh", None))
            hout = out
            tphy = tphy + out.tten
            qvphy = qvphy + out.qvten
            qcphy = qcphy + out.qcten
            if mo:
                utenx = utenx + out.uten
                vtenx = vtenx + out.vten
            else:
                uphy = uphy + out.uten
                vphy = vphy + out.vten
        elif self.cfg.physics.ibltyp == 2:
            # UW TCM (uwtcm, Main/pbllib/mod_pbl_uwtcm.F90:137):
            # prognostic-TKE moist turbulence. TKE comes from the
            # advected b-level state; the physics TKE tendency goes
            # back through sfupd["_tkephy"] for the dycore forecast.
            from .uw_dispatch import run_uwtcm
            out = run_uwtcm(self, core, atms, s, dt)
            tphy = tphy + out["tten"] * cpl[None] * m_ci
            qvphy = qvphy + out["qvten"] * cpl[None] * m_ci
            qcphy = qcphy + out["qcten"] * cpl[None] * m_ci
            if core.nqx == 5:
                qiphy = qiphy + out["qiten"] * cpl[None] * m_ci
            utenx = utenx + out["uten"]
            vtenx = vtenx + out["vten"]
            sfupd["_tkephy"] = out["tketen"]
        elif self.cfg.physics.ibltyp == 4:
            # MYJ (myjpbl, Main/pbllib/mod_pbl_myj.F90:177): level-2.5
            # TKE kept as per-layer persistent state (atms%tkepbl), not
            # advected by the dycore.
            from .uw_dispatch import run_myj
            out = run_myj(self, core, atms, s, flags, dt)
            tphy = tphy + out["tten"] * cpl[None] * m_ci
            qvphy = qvphy + out["qvten"] * cpl[None] * m_ci
            qcphy = qcphy + out["qcten"] * cpl[None] * m_ci
            if core.nqx == 5:
                qiphy = qiphy + out["qiten"] * cpl[None] * m_ci
            utenx = utenx + out["uten"]
            vtenx = vtenx + out["vten"]
            sfupd["tke_a"] = out["tke_a"]
            sfupd["pbl0"] = out["pbl0"]
        elif self.cfg.physics.ibltyp == 3:
            # GFS Hong-Pan PBL (pbl_gfs, Main/pbllib/mod_pbl_gfs.F90:98)
            from .pbl.gfs import moninq
            iy, jx = tb3.shape[1], tb3.shape[2]
            ncol = iy * jx
            flipc = lambda a: jnp.flip(a, axis=0).reshape(kz, ncol).T
            unflip = lambda a: jnp.flip(a.T.reshape(kz, iy, jx), axis=0)
            ps2 = atms["ps2d"].reshape(ncol)
            ta = tb3[kz - 1].reshape(ncol)
            qa = qvb3[kz - 1].reshape(ncol)
            ua = atms["ubx3"][kz - 1].reshape(ncol)
            va = atms["vbx3"][kz - 1].reshape(ncol)
            pa = pb3[kz - 1].reshape(ncol)
            spd1 = jnp.sqrt(ua ** 2 + va ** 2)
            rrhox = c.rgas * ta * (1.0 + c.ep1 * qa) / pa
            cpm = c.cpd * (1.0 + 0.8 * qa)
            heat = hfx.reshape(ncol) / cpm * rrhox    # (:128)
            evap = qfx.reshape(ncol) * rrhox
            # stress = ustar² from the stored drag (uvdrag = ρ·Cd·V)
            stress = uvdrag.reshape(ncol) * spd1 * rrhox
            # surface bulk Richardson (BATS form, mod_ocn_bats.F90:47)
            zaa = za[kz - 1].reshape(ncol)
            tgc = tg.reshape(ncol)
            rbsoil = zaa * c.egrav * (1.0 - tgc / ta) \
                / (spd1 ** 2 + 0.01)
            prsl = flipc(pb3) * 1e-3                  # cb
            t1 = flipc(tb3)
            dz1 = flipc(dzq)
            z1 = flipc(za)
            # interface pressures/geopotentials (:156-179)
            delk = prsl / (c.rgas * c.regrav) * dz1 / t1
            prsi = jnp.concatenate(
                [ps2[:, None] * 1e-3,
                 ps2[:, None] * 1e-3 - jnp.cumsum(delk, axis=1)],
                axis=1)
            phii = jnp.concatenate(
                [jnp.zeros((ncol, 1), t1.dtype),
                 (z1[:, 1:] - z1[:, :1]) * c.egrav,
                 ((z1[:, -1] - z1[:, 0]) * c.egrav
                  + dz1[:, -1] * c.egrav)[:, None]], axis=1)
            phil = jnp.concatenate(
                [0.5 * (z1[:, 1:] + z1[:, :-1] - 2.0 * z1[:, :1])
                 * c.egrav,
                 (2.0 * phii[:, kz - 1] - 0.5
                  * (z1[:, -1] + z1[:, -2] - 2.0 * z1[:, 0])
                  * c.egrav)[:, None]], axis=1)
            prslk = (prsl * 1000.0 / c.stdp) ** c.rovcp
            psk = (ps2 / c.stdp) ** c.rovcp
            q1s = flipc(qvb3 / (1.0 + qvb3))
            qcs = flipc(qcb3 / (1.0 + qcb3))
            thr = flipc(s.heatrt) / prslk
            out = moninq(flipc(atms["ubx3"]), flipc(atms["vbx3"]),
                         t1, q1s, qcs, prsl, prsi, delk, prslk, psk,
                         phil, phii, thr, heat, evap, stress,
                         rbsoil, spd1, dt)
            tphy = tphy + unflip(out.tau) * cpl[None] * m_ci
            qvphy = qvphy + unflip(out.rtgq / (1.0 - q1s) ** 2) \
                * cpl[None] * m_ci
            qcphy = qcphy + unflip(out.rtgc / (1.0 - qcs) ** 2) \
                * cpl[None] * m_ci
            utenx = utenx + unflip(out.du)
            vtenx = vtenx + unflip(out.dv)

        # -- shallow convection (any icup<0; mod_tendency.F90:316) -------
        # runs on the TOTAL (dyn+phy) tendencies after everything else,
        # like the reference's post-summation call site — every step
        # (outside the syncro_cum alarm).
        if self.shallow and dyn is not None:
            from .cumulus.shallow import shallcu
            iy, jx = tb3.shape[1], tb3.shape[2]
            ncol = iy * jx
            flipc = lambda a: jnp.flip(a, axis=0).reshape(kz, ncol).T
            rcpl = (1.0 / cpl)[None]
            ttot = flipc((dyn["tdyn"] + tphy) * rcpl)
            qvtot = flipc((dyn["qvdyn"] + qvphy) * rcpl)
            out = shallcu(flipc(tb3), flipc(qvb3), ttot, qvtot,
                          flipc(pb3) * 0.01, atms["ps2d"].reshape(ncol)
                          * 0.01, (core.ht / c.egrav).reshape(ncol), dt)
            unflip = lambda a: jnp.flip(a.T.reshape(kz, iy, jx), axis=0)
            tphy = tphy + unflip(out.outts) * cpl[None] * m_ci
            qvphy = qvphy + unflip(out.outqs) * cpl[None] * m_ci

        # -- chemistry (tractend2 call site, mod_tendency.F90:1821) ------
        if self.chem is not None:
            zero_r = jnp.zeros_like(tb3)
            chiten_chem, cdiag = self.chem(
                core, atms, s, fcc, cu["cldfra"],
                mic_remrat if mic_remrat is not None else zero_r,
                mic_strappt if mic_strappt is not None else zero_r,
                cu["prate"] * m_ci, dt, ls_prate=precip)
            # tracer vertical turbulent mixing: the holtbl chi
            # tridiagonal block (mod_pbl_holtbl.F90:985-1095) with the
            # scalar diffusion coefficients; drydepv=0 when
            # ichdrdepo=1 (deposition applied in settling_tend)
            if self.cfg.physics.ibltyp == 1:
                from .pbl.holtslag import _tridiag_implicit
                rpsb3 = atms["rpsb"]
                chib3 = jnp.maximum(s.chi_b * rpsb3[None], 0.0)
                # one sweep pair for all tracers: the solver batches
                # over trailing dims, so put ntr after kz instead of
                # vmapping ntr separate 2·kz-step scans
                chip = _tridiag_implicit(
                    jnp.swapaxes(chib3, 0, 1),
                    hout.alphak[:, None], hout.betak_q[:, None],
                    dt, 0.0)
                chip = jnp.swapaxes(chip, 0, 1)
                chiten_chem = chiten_chem + (chip - chib3) / dt \
                    * cpl[None] * m_ci
            # Tiedtke internal convective tracer transport (ctracer,
            # mod_cu_tiedtke.F90:7549; lmftrac): impulse applied on
            # syncro_cum steps when icup=5 runs this step
            # Emanuel internal convective tracer transport (ftra,
            # mod_cu_em.F90:994-1150): impulse on syncro_cum steps
            if "_emftra" in cu:
                iy2, jx2 = tb3.shape[1], tb3.shape[2]
                ncol2 = iy2 * jx2
                ft3 = jnp.flip(cu["_emftra"], axis=1)   # top-down
                chiten_chem = chiten_chem + jnp.transpose(
                    ft3, (2, 1, 0)).reshape(self.chem.ntr, kz, iy2,
                                            jx2) * cpl[None] * m_ci
            if "_tdk" in cu:
                from .cumulus.tiedtke import ctracer
                iy2, jx2 = tb3.shape[1], tb3.shape[2]
                ncol2 = iy2 * jx2
                rpsb3 = atms["rpsb"]
                chi_u = jnp.maximum(s.chi_b * rpsb3[None], 0.0)
                qtrac = jnp.transpose(
                    chi_u.reshape(self.chem.ntr, kz, ncol2),
                    (2, 1, 0))
                ct = ctracer(qtrac, cu["_tdk"],
                             pf3.reshape(kz + 1, ncol2).T,
                             float(core.dtsec))
                chiten_chem = chiten_chem + jnp.transpose(
                    ct, (2, 1, 0)).reshape(self.chem.ntr, kz, iy2,
                                           jx2) * cpl[None] * m_ci
            sfupd["_chiten"] = chiten_chem
            # accumulate emission/deposition burdens (kg/m²)
            zf = jnp.zeros_like(cdiag.get(
                "emflx", s.chemdiag[0]))
            sfupd["chemdiag"] = jnp.stack([
                s.chemdiag[0] + cdiag.get("emflx", zf) * core.dtsec,
                s.chemdiag[1] + cdiag.get("ddflx", zf) * core.dtsec,
                s.chemdiag[2] + cdiag.get("wdflx", zf) * core.dtsec])

        # couple the accumulated cross-grid wind tendencies onto the
        # momentum grid (uvcross2dot ×p*_dot for the B-grid cores,
        # tenxtouvten for MOLOCH's C grid) — one staggering pass total
        du, dv = core.couple_uvten(utenx, vtenx, cpl)
        uphy = uphy + du
        vphy = vphy + dv

        cldfra_out = cldfra
        # stack hydrometeor tendencies on the species axis (qc[,qr,qi,qs])
        if core.nqx == 5:
            qhphy = jnp.stack([qcphy, qrphy, qiphy, qsphy])
        else:
            qhphy = qcphy[None]
        return (tphy, qvphy, qhphy, uphy, vphy, cldfra_out, heatrt, sfupd)
