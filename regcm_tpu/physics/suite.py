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


class PhysicsSuite:
    """Callable plugged into HydroCore (core.physics)."""

    def __init__(self, cfg, grid):
        self.cfg = cfg
        self.grid = grid
        self.ricr = 0.25      # ricr_lnd/ocn default (mod_params.F90:485)
        self.icup = cfg.physics.icup_lnd
        # shallow convection runs everywhere when any icup < 0
        # (mod_tendency.F90:316, shallcu has no land/ocean gating)
        self.shallow = (cfg.physics.icup_lnd < 0
                        or cfg.physics.icup_ocn < 0)
        if cfg.physics.icup_lnd == 1:
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

        tphy = jnp.zeros_like(tb3)
        qvphy = jnp.zeros_like(tb3)
        qcphy = jnp.zeros_like(tb3)
        # extra hydrometeor tendencies (5-species schemes, nqx=5)
        qrphy = jnp.zeros_like(tb3)
        qiphy = jnp.zeros_like(tb3)
        qsphy = jnp.zeros_like(tb3)
        uphy = jnp.zeros_like(s.u_a)
        vphy = jnp.zeros_like(s.v_a)
        sfupd: Dict[str, jax.Array] = {}

        # -- cumulus (mod_tendency.F90:1686; cu_interface :251-535) ------
        cldfra_cum = jnp.zeros_like(tb3)
        cldlwc_cum = jnp.zeros_like(tb3)
        if self.icup == 1 and dyn is not None:
            # Kuo (cupara): moisture-convergence triggered. The dycore
            # deferred qv vadv (mod_tendency.F90:1371-1373): convecting
            # columns get the Kuo tendencies, the rest the plain vadv
            # term (mod_cu_kuo.F90:270-282) — applied every step.
            qv_vadv = dyn["qv_vadv"]
            if flags.do_cum:
                from .cumulus.kuo import kuo
                tw, vq = self._kuo_tabs
                # k700: first 1-based level with p > 700 hPa
                hs = self.grid.hsigma
                import numpy as _np
                k700 = int(_np.argmax(hs * 95.0 + 5.0 > 70.0)) + 1
                # sca uses the COUPLED hadv-only tendency (cb kg/kg/s,
                # mod_cu_kuo.F90:96-106 "only horizontal advection")
                out = kuo(tb3, qvb3, pb3 * 1e-3, psb + core.ptop,
                          dyn["qvhadv"],
                          jnp.asarray(self.grid.sigma, tb3.dtype),
                          jnp.asarray(self.grid.hsigma, tb3.dtype),
                          jnp.asarray(self.grid.dsigma, tb3.dtype),
                          tw, vq, core.ptop, k700)
                am = out.active[None]
                tphy = tphy + out.tten * psb[None] * m_ci
                qvphy = qvphy + jnp.where(
                    am, out.qvten * psb[None], qv_vadv) * m_ci
                prate = out.prate * m_ci
                sfupd["rainc"] = s.rainc + prate * core.dtsec
            else:
                qvphy = qvphy + qv_vadv * m_ci
        elif self.icup == 2 and flags.do_cum:
            # Grell (FC80 closure; the large-scale-forced state uses the
            # unforced profile here — AS74 closure needs the dynamic
            # tendencies staged like m2c%tten, a later-round refinement)
            from .cumulus.grell import cup as grell_cup
            iy, jx = tb3.shape[1], tb3.shape[2]
            ncol = iy * jx
            flipc = lambda a: jnp.flip(a, axis=0).reshape(kz, ncol).T
            tn3 = tb3 + (dyn["tdyn"] * (1.0 / psb)[None] * dt
                         if dyn is not None else 0.0)
            qo3 = qvb3 + (dyn["qvdyn"] * (1.0 / psb)[None] * dt
                          if dyn is not None else 0.0)
            out = grell_cup(
                flipc(tb3), flipc(qvb3), flipc(tn3), flipc(qo3),
                flipc(pb3) * 0.01,
                atms["ps2d"].reshape(ncol) * 0.01,
                (core.ht / c.egrav).reshape(ncol),
                flipc(jnp.sqrt(atms["ubx3"] ** 2 + atms["vbx3"] ** 2)),
                dt, igcc=self.cfg.physics.igcc)
            unflip = lambda a: jnp.flip(a.T.reshape(kz, iy, jx), axis=0)
            tphy = tphy + unflip(out.outt) * psb[None] * m_ci
            qvphy = qvphy + unflip(out.outq) * psb[None] * m_ci
            prate = out.pratec.reshape(iy, jx) * m_ci
            sfupd["rainc"] = s.rainc + prate * core.dtsec
            cldfra_cum = unflip(out.cldfrc)
            cldlwc_cum = jnp.where(cldfra_cum > 0.0,
                                   0.3e-3 * 1000.0 * rho, 0.0)
        elif self.icup == 3 and flags.do_cum:
            # Betts-Miller (bmpara, Main/cumlib/mod_cu_bm.F90:134).
            # Arrays are already top-down; no flip needed.
            from .cumulus.betts_miller import (bmpara,
                                               model_cumulus_cloud,
                                               clwfromt)
            iy, jx = tb3.shape[1], tb3.shape[2]
            ncol = iy * jx
            colc = lambda a: a.reshape(kz, ncol).T
            out = bmpara(colc(tb3), colc(qvb3), colc(pb3),
                         pf3.reshape(kz + 1, ncol).T,
                         colc(za + (core.ht / c.egrav)[None]),
                         atms["ps2d"].reshape(ncol),
                         core.grid_lndocn.reshape(ncol),
                         s.cldefi.reshape(ncol), dt)
            uncol = lambda a: a.T.reshape(kz, iy, jx)
            tphy = tphy + uncol(out.tten) * psb[None] * m_ci
            qvphy = qvphy + uncol(out.qten) * psb[None] * m_ci
            prate = out.prate.reshape(iy, jx) * m_ci
            sfupd["rainc"] = s.rainc + prate * core.dtsec
            sfupd["cldefi"] = out.cldefi.reshape(iy, jx)
            # cucloud via model_cumulus_cloud (icup==3 path,
            # mod_cu_interface.F90:229)
            cldfra_cum = uncol(model_cumulus_cloud(
                out.kbot, out.ktop, kz, float(self.cfg.geo.ds)))
            cldlwc_cum = jnp.where(cldfra_cum > 0.001,
                                   clwfromt(tb3), 0.0)
        elif self.icup == 4 and flags.do_cum:
            iy, jx = tb3.shape[1], tb3.shape[2]
            ncol = iy * jx
            flipc = lambda a: jnp.flip(a, axis=0).reshape(kz, ncol).T
            qmix = qvb3                     # prognostic mixing ratio
            qspec = qmix / (1.0 + qmix)     # scheme wants spec. humidity
            qs_spec = atms["qsb3"] / (1.0 + atms["qsb3"])
            phflip = jnp.flip(pf3, axis=0).reshape(kz + 1, ncol).T
            out = cupeman(
                flipc(tb3), flipc(qspec), flipc(qs_spec),
                flipc(atms["ubx3"]), flipc(atms["vbx3"]),
                flipc(pb3) * 0.01, phflip * 0.01,
                s.cbmf.reshape(ncol), dt,
                jnp.where(core.grid_lndocn.reshape(ncol) > 0.5,
                          ELCRIT_LND, ELCRIT_OCN),
                jnp.full((ncol,), EPMAX, tb3.dtype),
                max(self.minorig - 1, 1))   # 0-based origin level
            unflip = lambda a: jnp.flip(
                a.T.reshape(kz, iy, jx), axis=0)
            cu_tten = unflip(out.ft)
            qspec2 = flipc(qspec)
            cu_qten = unflip(out.fq / (1.0 - qspec2) ** 2)
            cu_utenx = unflip(out.fu)
            cu_vtenx = unflip(out.fv)
            # couple (cu_interface :448-470): cross tendencies ×psb,
            # wind cross→dot ×psdotb
            tphy = tphy + cu_tten * psb[None] * m_ci
            qvphy = qvphy + cu_qten * psb[None] * m_ci
            psd = cross2dot(psb)
            uphy = uphy + cross2dot(cu_utenx) * psd[None] * core.m_di
            vphy = vphy + cross2dot(cu_vtenx) * psd[None] * core.m_di
            prate = out.precip.reshape(iy, jx) * m_ci
            sfupd["rainc"] = s.rainc + prate * core.dtsec
            sfupd["cbmf"] = out.cbmf.reshape(iy, jx) * m_ci
            cldfra_cum = unflip(out.cldfra)
            # convective in-cloud LWC (cucloud; cllwcv=0.3e-3 kg/kg,
            # subexparam) in g/m3
            cldlwc_cum = jnp.where(cldfra_cum > 0.0,
                                   0.3e-3 * 1000.0 * rho, 0.0)

        # -- cloud fraction + SUBEX (mod_tendency.F90:1715-1740) ---------
        from .cloud.fractions import cldfrac_dispatch
        fcc = cldfrac_dispatch(
            self.cfg.physics.icldfrac, tb3, pb3, qvb3, qcb3, rh,
            atms["qsb3"], core.rh0[None], atms["ps2d"],
            float(self.cfg.geo.ds))
        cldlwc, cldfra = combine_clouds(fcc, qcb3, rho, tb3,
                                        cldfra_cum, cldlwc_cum)
        if self.cfg.physics.ipptls == 1:
            out = subex(tb3, pb3, pf3, qvb3, qcb3, rh, rho, fcc, psb, dt,
                        core.qck1, core.cgul, core.cevap, core.caccr)
            tphy = tphy + out.tten * m_ci
            qvphy = qvphy + out.qvten * m_ci
            qcphy = qcphy + out.qcten * m_ci
            precip = out.precip * m_ci
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
            pfac = psb[None] / core.dtsec * m_ci
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
            rad = radiation(tb3, qvb3, pf3, pb3, cldfra, cldlwc,
                            coszrs, s.tg, alb, **self.ghg)
            heatrt = rad.heatrt * m_ci
            sfupd["swsfc"] = rad.swabs_sfc
            sfupd["lwsfc"] = rad.lwnet_sfc
            swabs = rad.swabs_sfc
            lwnet = rad.lwnet_sfc
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
            sf = surface_fluxes(
                atms["ubx3"][kz - 1], atms["vbx3"][kz - 1],
                tb3[kz - 1], qvb3[kz - 1], za[kz - 1],
                atms["ps2d"] / (c.rgas * tb3[kz - 1]),
                atms["ps2d"], s.tg, sst, core.grid_lndocn,
                swabs, lwnet, precip, self.cfg.time.dtsrf,
                iocnflx=self.cfg.physics.iocnflx)
            hfx, qfx, uvdrag, tg = sf.hfx, sf.qfx, sf.uvdrag, sf.tg
            if slab:
                # update_slabocean (mod_regcm_interface path,
                # mod_slabocean.F90:95): mixed-layer energy budget with
                # restoring toward the forcing SST (xtsb%b1 ≈ core.sst)
                from .surface.slab import update_slabocean
                sp = self.cfg.slaboc
                ocmask = core.grid_lndocn < 0.5
                sst_new, _ = update_slabocean(
                    tg, core.sst, ocmask, swabs, -lwnet, hfx, qfx,
                    self.cfg.time.dtsrf,
                    mixed_layer_depth=sp.mixed_layer_depth,
                    do_restore_sst=sp.do_restore_sst,
                    sst_restore_timescale=sp.sst_restore_timescale)
                tg = sst_new
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
            out = holtbl(
                tp3, tb3, pb3, pf3, qvb3, qcb3,
                atms["ubx3"], atms["vbx3"],
                atms["ubd3"], atms["vbd3"],
                za, dzq, rhox2d, uvdrag, hfx, qfx, tg,
                core.coriol, psb, cross2dot(psb),
                kmx, dt, ricr=self.ricr,
                cross2dot_fn=cross2dot, m_di=core.m_di, m_ci=core.m_ci)
            tphy = tphy + out.tten
            qvphy = qvphy + out.qvten
            qcphy = qcphy + out.qcten
            uphy = uphy + out.uten
            vphy = vphy + out.vten
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
            tphy = tphy + unflip(out.tau) * psb[None] * m_ci
            qvphy = qvphy + unflip(out.rtgq / (1.0 - q1s) ** 2) \
                * psb[None] * m_ci
            qcphy = qcphy + unflip(out.rtgc / (1.0 - qcs) ** 2) \
                * psb[None] * m_ci
            psd = cross2dot(psb)
            uphy = uphy + cross2dot(unflip(out.du)) * psd[None] \
                * core.m_di
            vphy = vphy + cross2dot(unflip(out.dv)) * psd[None] \
                * core.m_di

        # -- shallow convection (any icup<0; mod_tendency.F90:316) -------
        # runs on the TOTAL (dyn+phy) tendencies after everything else,
        # like the reference's post-summation call site.
        if self.shallow and dyn is not None and flags.do_cum:
            from .cumulus.shallow import shallcu
            iy, jx = tb3.shape[1], tb3.shape[2]
            ncol = iy * jx
            flipc = lambda a: jnp.flip(a, axis=0).reshape(kz, ncol).T
            rpsb = (1.0 / psb)[None]
            ttot = flipc((dyn["tdyn"] + tphy) * rpsb)
            qvtot = flipc((dyn["qvdyn"] + qvphy) * rpsb)
            out = shallcu(flipc(tb3), flipc(qvb3), ttot, qvtot,
                          flipc(pb3) * 0.01, atms["ps2d"].reshape(ncol)
                          * 0.01, (core.ht / c.egrav).reshape(ncol), dt)
            unflip = lambda a: jnp.flip(a.T.reshape(kz, iy, jx), axis=0)
            tphy = tphy + unflip(out.outts) * psb[None] * m_ci
            qvphy = qvphy + unflip(out.outqs) * psb[None] * m_ci

        cldfra_out = cldfra
        # stack hydrometeor tendencies on the species axis (qc[,qr,qi,qs])
        if core.nqx == 5:
            qhphy = jnp.stack([qcphy, qrphy, qiphy, qsphy])
        else:
            qhphy = qcphy[None]
        return (tphy, qvphy, qhphy, uphy, vphy, cldfra_out, heatrt, sfupd)
