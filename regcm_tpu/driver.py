"""Model driver: initialize → run → finalize.

Equivalent of ``Main/mod_regcm_interface.F90`` (RCM_initialize :59,
RCM_run :167, RCM_finalize :237) + the init path ``Main/mod_init.F90:76``.
The host loop owns calendars/alarms (timer system of
``Main/mpplib/mod_timer.F90``); each iteration calls the jitted pure step.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config.params import RegCMConfig
from .core.grid import ModelGrid, build_grid
from .core.state import HydroState, BdyState, StepFlags, IQV, IQC, zeros_hydro
from .dynamics.hydrostatic import HydroCore, fix_cross_pad
from .utils import constants as c
from .utils.calendar import Date
from .utils.vertical import sigma_levels


def chem_ntr(cfg) -> int:
    """Tracer count for the state (ntr of mod_che_indices; 0 when
    chemistry is off)."""
    if cfg.physics.ichem:
        from .chem.species import build_species
        return build_species(cfg.chem.chemsimtype).ntr
    return 0


def lake_layers(cfg) -> int:
    """Lake profile depth in state: ndpmax-capped 1 m layers when the
    Hostetler model is on (Share/mod_dynparam.F90:352 ndpmax=200; a
    100 m cap covers every Testing-corpus lake), else 1 dummy layer."""
    if cfg.physics.lakemod == 1:
        return int(cfg.physics.extras.get("lake_ndpmax", 100))
    return 1


def standard_atmosphere_state(grid: ModelGrid, cfg: RegCMConfig,
                              dtype=jnp.float64,
                              perturb: float = 0.0,
                              seed: int = 0) -> HydroState:
    """Cold start from a resting standard atmosphere (synthetic ICBC).

    Mirrors the structure of mod_init cold start: atm1 = atm2 = coupled
    initial fields. With flat terrain and no wind this is an exact rest
    state of the equations (PGF=0); optional white-noise T perturbation
    is used by the stability tests.
    """
    iy, jx, kz = grid.iy, grid.jx, grid.kz
    ptop = grid.ptop
    ps = np.full((iy, jx), 101.325 - ptop)  # p* (cb)
    # standard-atmosphere temperature at half levels
    p = grid.hsigma[:, None, None] * ps[None] + ptop      # cb
    fac = c.rgas * c.lrate * c.regrav
    t = c.stdt * (p / 101.325) ** fac
    z = (c.stdt - t) / c.lrate
    t = np.where(z > 10769.0, 218.15, t)
    if perturb > 0.0:
        rng = np.random.default_rng(seed)
        t = t + perturb * rng.standard_normal(t.shape) \
            * grid.m_cross_int[None]
    # 50% RH w.r.t. the model's own (Flatau) saturation so the resting
    # state is subsaturated everywhere (no spurious SUBEX condensation)
    from .utils.thermo import pfwsat as _pfwsat
    qv = np.maximum(0.5 * np.asarray(_pfwsat(jnp.asarray(t),
                                             jnp.asarray(p * 1000.0))),
                    c.minqq)
    qv = np.minimum(qv, 0.015)
    nqx = 5 if cfg.physics.ipptls in (2, 3) else 2
    s = zeros_hydro(kz, iy, jx, nqx=nqx, nlak=lake_layers(cfg),
                    ntr=chem_ntr(cfg),
                    nnsg=max(int(cfg.dim.nsg), 1) ** 2, dtype=dtype)
    psj = jnp.asarray(ps, dtype)
    tj = jnp.asarray(t * ps[None], dtype)
    qvj = jnp.asarray(qv * ps[None], dtype)
    qx = jnp.concatenate([qvj[None],
                          jnp.zeros((nqx - 1,) + qvj.shape, dtype)])
    tg = jnp.asarray(t[-1], dtype)
    s = s._replace(ps_a=psj, ps_b=psj, t_a=tj, t_b=tj,
                   qx_a=qx, qx_b=qx, tg=tg)
    return s


def nh_initial_state(core, perturb: float = 0.0, seed: int = 0
                     ) -> HydroState:
    """Cold start for the MM5 NH core (idynamic=2): T = reference
    atmosphere t0, pp = w = 0 (the nhinterp base-state contract —
    a perfect rest state of the NH equations)."""
    base = core.base
    g = core.grid
    iy, jx, kz = g.iy, g.jx, g.kz
    s = zeros_hydro(kz, iy, jx, nqx=core.nqx,
                    nlak=lake_layers(core.cfg), ntr=core.ntr,
                    dtype=core.dtype)
    ps = base.ps0
    t0 = np.asarray(base.t0)
    if perturb > 0.0:
        rng = np.random.default_rng(seed)
        t0 = t0 + perturb * rng.standard_normal(t0.shape) \
            * np.asarray(g.m_cross_int)[None]
    from .utils.thermo import pfwsat as _pfwsat
    qv = np.minimum(0.3 * np.asarray(_pfwsat(jnp.asarray(t0), base.pr0)),
                    0.01)
    tj = jnp.asarray(t0, core.dtype) * ps[None]
    qvj = jnp.asarray(qv, core.dtype) * ps[None]
    qx = jnp.concatenate(
        [qvj[None], jnp.zeros((core.nqx - 1,) + qvj.shape, core.dtype)])
    return s._replace(ps_a=ps, ps_b=ps, t_a=tj, t_b=tj,
                      qx_a=qx, qx_b=qx,
                      tg=jnp.asarray(t0[-1], core.dtype))


def moloch_bdy_from_state(s):
    """Fixed MOLOCH boundary values equal to the current state."""
    from .dynamics.moloch import MolochBdy
    z3 = jnp.zeros_like(s.t)
    return MolochBdy(pai0=s.pai, pait=z3, t0=s.t, tt=z3,
                     qv0=s.qx[0], qvt=z3, u0=s.u, ut=z3, v0=s.v, vt=z3)


class Model:
    """Top-level model object (RCM_initialize/run/finalize equivalent)."""

    def __init__(self, cfg: RegCMConfig, grid: Optional[ModelGrid] = None,
                 dtype=jnp.float64, physics=None,
                 initial_state: Optional[HydroState] = None,
                 bdy: Optional[BdyState] = None):
        if cfg.core.idynamic not in (1, 2, 3):
            raise ValueError(
                f"coreparam idynamic={cfg.core.idynamic} is invalid "
                "(1=hydrostatic, 2=MM5-NH, 3=MOLOCH)")
        self.cfg = cfg
        self.grid = grid or build_grid(cfg)
        # O'Brien (2010) ensemble perturbation (mod_ensemble.F90 via
        # mod_ncio.F90:176-940): multiplicative noise on topo at setup
        # and on every ICBC field read; enabled by ensemble_run
        self._perturb_rng = None
        pp = cfg.perturb
        if cfg.globdat.ensemble_run and any(
                getattr(pp, f"lperturb_{n}") for n in
                ("topo", "ts", "ps", "t", "q", "u", "v")):
            self._perturb_rng = np.random.default_rng(
                pp.extras.get("seed"))
            if pp.lperturb_topo and grid is None:
                from .utils.ensemble import randify
                import dataclasses as _dc
                # perturb the stored geopotential; the derived
                # diffusion topo factor keeps the unperturbed base
                # (the reference perturbs at file read and so rederives
                # it -- sub-0.1% effect on a background coefficient)
                ht2 = randify(self.grid.ht, pp.perturb_frac_topo,
                              self._perturb_rng)
                try:
                    self.grid = _dc.replace(self.grid, ht=ht2)
                except TypeError:
                    object.__setattr__(self.grid, "ht", ht2)
        if physics is False:        # explicit opt-out (dynamics only)
            physics = None
        elif physics is None:
            from .physics.suite import PhysicsSuite
            physics = PhysicsSuite(cfg, self.grid)
        self.dtype = dtype
        self.dtsec = cfg.dtsec
        self.idynamic = cfg.core.idynamic
        if self.idynamic == 3:
            from .dynamics.moloch import MolochCore
            self.core = MolochCore(self.grid, cfg, dtype=dtype,
                                   physics=physics)
            if initial_state is None:
                initial_state = self.core.initial_state()
            self.state = initial_state
            if bdy is None:
                bdy = moloch_bdy_from_state(self.state)
            stepfn = self.core.step
        else:
            self.core = HydroCore(self.grid, cfg, dtype=dtype,
                                  physics=physics)
            if initial_state is None:
                if cfg.core.idynamic == 2:
                    initial_state = nh_initial_state(self.core)
                else:
                    initial_state = standard_atmosphere_state(
                        self.grid, cfg, dtype)
            if cfg.core.idynamic == 2:
                self.state = initial_state
            else:
                self.state = self.core.init_split_storage(initial_state)
            if bdy is None:
                from .core.state import bdy_from_state
                bdy = bdy_from_state(self.state)
            stepfn = self.core.step_nh if cfg.core.idynamic == 2 \
                else self.core.step
        if getattr(physics, "land_scheme", "") == "bats1e":
            # initbats cold start: slmo soil water, Tg-initialized
            # leaf/subsoil temperatures (mod_bats_common.F90);
            # per-subcell tables when nsg>1
            from .physics.surface.bats import bats_init_state
            tg0 = np.asarray(self.state.tg)
            tg0 = np.where(tg0 > 100.0, tg0, 288.0)
            ss_np = physics.bats_ss_sub_np \
                if getattr(physics, "nnsg", 1) > 1 \
                else physics.bats_ss_np
            b0 = bats_init_state(ss_np, self.grid.lndocn, tg0)
            self.state = self.state._replace(
                bats=jnp.asarray(b0, dtype))
        if cfg.physics.lakemod == 1:
            # initlake (mod_ocn_lake.F90:96): cold-start lake profile
            from .physics.surface.lake import init_lake
            dh = np.asarray(self.grid.extras.get(
                "dhlake", np.zeros((self.grid.iy, self.grid.jx))))
            tg0 = np.asarray(self.state.tg)
            tg0 = np.where(tg0 > 100.0, tg0, 288.0)
            tlak0, _, _ = init_lake(dh, self.grid.xlat, tg0,
                                    lake_layers(cfg))
            self.state = self.state._replace(
                tlak=jnp.asarray(tlak0, dtype))
        self.bdy = bdy
        self.start_date = Date.from_int(cfg.restart.mdate1,
                                        cfg.globdat.calendar)
        self.date = self.start_date
        self.xbctime = 0.0
        self.nstep = 0
        self._step_jit = jax.jit(stepfn, static_argnames=("flags",))
        # tracer convective transport (cumtran, mod_tendency.F90:
        # 595-603): state rewrite on the syncro_cum alarm for columns
        # whose scheme does not transport internally (not Emanuel/
        # Tiedtke, mod_che_cumtran.F90:56-68)
        self._cumtran = None
        if (cfg.physics.ichem and chem_ntr(cfg) > 0
                and cfg.chem.ichcumtra == 1):
            from .chem.cumtran import cumtran
            land = np.asarray(self.grid.lndocn) > 0.5
            icup_col = np.where(land, abs(cfg.physics.icup_lnd),
                                abs(cfg.physics.icup_ocn))
            # Tiedtke (ctracer) and Emanuel (cupeman ftra) transport
            # tracers internally (mod_che_cumtran.F90:56-68); the
            # well-mixed fallback covers the other schemes
            dotran = ~np.isin(icup_col, (4, 5))
            if dotran.any():
                self._dotran = jnp.asarray(dotran)
                self._dsig = jnp.asarray(self.grid.dsigma, dtype)
                self._cumtran = jax.jit(cumtran)

    def step(self):
        """Advance one timestep (first step forward-Euler dt, then
        leapfrog 2dt: mod_tendency.F90:610-616; MOLOCH is always
        forward-in-time with dt)."""
        dt = self.dtsec if (self.nstep == 0 or self.idynamic == 3) \
            else 2.0 * self.dtsec
        flags = self._flags()
        from .utils.sun import coszrs as _coszrs
        sol = self._solar()
        if int(self.cfg.physics.ifixsolar) == 1:
            # no diurnal cycle: overhead sun everywhere (zenitm,
            # Main/mod_sun.F90:330-333)
            mu = jnp.ones((self.grid.iy, self.grid.jx), self.dtype)
        else:
            mu = jnp.asarray(_coszrs(self.date, self.grid.xlat,
                                     self.grid.xlon, decl=sol.declin),
                             self.dtype)
        # third slot: fractional month position for LAI-type monthly
        # climatology interpolation (mid-month nodes)
        mpos = self.date.month + (self.date.day - 15) / 30.0
        solar = jnp.asarray([sol.eccf, sol.solcon, mpos], self.dtype)
        self.state, diags = self._step_jit(
            self.state, self.bdy,
            jnp.asarray(self.xbctime, self.dtype),
            jnp.asarray(dt, self.dtype), flags, mu, solar)
        if self._cumtran is not None and flags.do_cum:
            s = self.state
            if self.idynamic == 3:
                (chib,) = self._cumtran((s.chi_b,), s.cuten[4],
                                        self._dsig, self._dotran)
                self.state = s._replace(chi_b=chib)
            else:
                chia, chib = self._cumtran(
                    (s.chi_a, s.chi_b), s.cuten[4], self._dsig,
                    self._dotran)
                self.state = s._replace(chi_a=chia, chi_b=chib)
        self.nstep += 1
        self.xbctime += self.dtsec
        self.date = self.date.add_seconds(self.dtsec)
        self.last_diags = diags
        return diags

    def _solar(self):
        """Daily-cached solar forcing (solar1 runs on the alarm_day
        cadence, Main/mod_sun.F90:318-326)."""
        from .utils.sun import solar_state
        key = (self.date.year, self.date.month, self.date.day)
        if getattr(self, "_solar_key", None) != key:
            ph = self.cfg.physics
            self._solar_val = solar_state(
                self.date, year_offset=int(ph.year_offset),
                ifixsolar=int(ph.ifixsolar),
                fixedsolarval=float(ph.fixedsolarval),
                isolconst=int(ph.isolconst))
            self._solar_key = key
        return self._solar_val

    def _flags(self) -> StepFlags:
        """Physics cadence flags (syncro_rad/srf alarms,
        Main/mpplib/mod_runparams.F90:51-75)."""
        tp = self.cfg.time
        elapsed = self.nstep * self.dtsec
        def hit(interval):
            if interval <= 0:
                return False
            return self.nstep == 0 or (elapsed % interval) < self.dtsec
        do_rad = hit(tp.dtrad_sec)
        return StepFlags(
            do_rad=do_rad,
            do_srf=hit(tp.dtsrf),
            # syncro_cum alarm (dtcum seconds, default 300;
            # Main/mod_params.F90:1001): cumulus tendencies are held in
            # state between calls
            do_cum=hit(max(tp.dtcum, self.dtsec)),
            first=(self.nstep == 0),
            # getabetot cadence (dtabem alarm,
            # Main/mod_rad_interface.F90:62-65): full LW absorptivity
            # refresh; intermediate dtrad calls reuse the state cache
            do_abem=do_rad and hit(tp.dtabem_sec),
        )

    def run(self, nsteps: int, log_every: int = 0):
        t0 = time.time()
        diags = None
        for n in range(nsteps):
            diags = self.step()
            if log_every and (n + 1) % log_every == 0:
                d = {k: float(v) for k, v in diags.items()
                     if jnp.ndim(v) == 0}
                print(f"step {self.nstep} {self.date}: "
                      + " ".join(f"{k}={v:.6g}" for k, v in d.items()))
        jax.block_until_ready(jax.tree_util.tree_leaves(self.state)[0])
        wall = time.time() - t0
        return diags, wall

    # ICBC-driven runs (init/bdyin/bdyval, Main/mod_init.F90 +
    # Main/mod_bdycod.F90:654) ------------------------------------------
    def _maybe_perturb(self, rec):
        """randify each enabled ICBC field on read
        (mod_ncio.F90:863-940)."""
        if self._perturb_rng is None:
            return rec
        from .utils.ensemble import randify
        pp = self.cfg.perturb
        out = dict(rec)
        for name, key in (("ts", "ts"), ("ps", "ps"), ("t", "t"),
                          ("q", "qv"), ("u", "u"), ("v", "v")):
            if getattr(pp, "lperturb_" + name) and key in out:
                out[key] = randify(
                    out[key], getattr(pp, "perturb_frac_" + name),
                    self._perturb_rng)
        return out

    def _icbc_to_state_fields(self, rec):
        """Couple an ICBC record into prognostic arrays."""
        rec = self._maybe_perturb(rec)
        from .dynamics import stencil
        from .dynamics.stencil import cross2dot
        ptop = self.grid.ptop
        with stencil.topology(getattr(self.core, "periodic_x", False),
                              getattr(self.core, "periodic_y", False)):
            ps = jnp.asarray(rec["ps"], self.dtype) / 1000.0 - ptop
            ps = fix_cross_pad(ps)
            psd = cross2dot(ps)
        t = jnp.asarray(rec["t"], self.dtype) * ps[None]
        qv = jnp.maximum(jnp.asarray(rec["qv"], self.dtype),
                         c.minqq) * ps[None]
        u = jnp.asarray(rec["u"], self.dtype) * psd[None]
        v = jnp.asarray(rec["v"], self.dtype) * psd[None]
        return ps, u, v, t, qv, jnp.asarray(rec["ts"], self.dtype)

    def _icbc_to_moloch_fields(self, rec):
        """ICBC sigma-level record → MOLOCH zita-level fields."""
        rec = self._maybe_perturb(rec)
        return self.core.fields_from_sigma(
            rec["ps"], rec["t"], rec["qv"], rec["u"], rec["v"],
            self.grid.sigma)

    def set_chem_bc(self, reader):
        """Attach a CHBC reader (chem_icbc output): lateral chem
        boundaries relax toward climatology instead of clean air
        (mod_che_bdyco.F90 chebdy/nudge_chi)."""
        self._chbc = reader
        if getattr(self, "bdy", None) is not None \
                and hasattr(self, "_icbc"):
            self.update_boundary()

    def _chbc_pair(self, d0, d1, ps0, ps1, dtbdy):
        """Coupled (chi0, chit) boundary pair from the CHBC reader."""
        reader = getattr(self, "_chbc", None)
        if reader is None or self.core.ntr == 0:
            return None, None
        c0, i0 = reader.record_at(d0)
        c1, i1 = reader.record_at(d1)
        chi0 = jnp.asarray(c0, self.dtype) * ps0[None, None]
        chi1 = jnp.asarray(c1, self.dtype) * ps1[None, None]
        return chi0, (chi1 - chi0) / dtbdy

    def init_from_icbc(self, reader):
        """Cold start from the ICBC record at mdate1 (mod_init cold)."""
        rec, _ = reader.record_at(self.date)
        if self.idynamic == 3:
            f = self._icbc_to_moloch_fields(rec)
            qx = self.state.qx.at[0].set(f["qv"]).at[1:].set(0.0)
            self.state = self.state._replace(
                u=f["u"], v=f["v"], pai=f["pai"], t=f["t"], qx=qx,
                tg=jnp.asarray(rec["ts"], self.dtype))
            self._icbc = reader
            self.update_boundary()
            return
        ps, u, v, t, qv, ts = self._icbc_to_state_fields(rec)
        qx = jnp.concatenate(
            [qv[None],
             jnp.zeros((self.core.nqx - 1,) + qv.shape, self.dtype)])
        self.state = self.state._replace(
            ps_a=ps, ps_b=ps, u_a=u, u_b=u, v_a=v, v_b=v,
            t_a=t, t_b=t, qx_a=qx, qx_b=qx, tg=ts)
        if self.cfg.core.idynamic == 1:
            self.state = self.core.init_split_storage(self.state)
        self._icbc = reader
        self.update_boundary()

    def update_boundary(self):
        """bdyin: load the bracketing ICBC records and form b0/bt
        (Main/mod_bdycod.F90:654 + bdyval time interpolation)."""
        reader = self._icbc
        rec0, i0 = reader.record_at(self.date)
        dtbdy = self.cfg.globdat.ibdyfrq * 3600.0
        d1 = self.date.add_seconds(dtbdy)
        rec1, i1 = reader.record_at(d1)
        if self.idynamic == 3:
            from .dynamics.moloch import MolochBdy
            f0 = self._icbc_to_moloch_fields(rec0)
            f1 = self._icbc_to_moloch_fields(rec1)
            rdt = 1.0 / (dtbdy if i1 != i0 else 1.0)
            self.bdy = MolochBdy(
                pai0=f0["pai"], pait=(f1["pai"] - f0["pai"]) * rdt,
                t0=f0["t"], tt=(f1["t"] - f0["t"]) * rdt,
                qv0=f0["qv"], qvt=(f1["qv"] - f0["qv"]) * rdt,
                u0=f0["u"], ut=(f1["u"] - f0["u"]) * rdt,
                v0=f0["v"], vt=(f1["v"] - f0["v"]) * rdt)
            self.xbctime = 0.0
            return
        ps0, u0, v0, t0, qv0, _ = self._icbc_to_state_fields(rec0)
        ps1, u1, v1, t1, qv1, _ = self._icbc_to_state_fields(rec1)
        if i1 == i0:      # end of file: hold boundary constant
            dtbdy = 1.0
        chi0, chit = self._chbc_pair(self.date, d1, ps0, ps1, dtbdy)
        self.bdy = BdyState(
            ps0=ps0, pst=(ps1 - ps0) / dtbdy,
            t0=t0, tt=(t1 - t0) / dtbdy,
            qv0=qv0, qvt=(qv1 - qv0) / dtbdy,
            u0=u0, ut=(u1 - u0) / dtbdy,
            v0=v0, vt=(v1 - v0) / dtbdy,
            chi0=chi0, chit=chit,
            qflb0=(self._som_value()
                   if getattr(self, "_som_qflx", None) is not None
                   else None))
        self.xbctime = 0.0

    def run_icbc(self, nsteps: int):
        """Step loop with the 6-hourly boundary-input alarm."""
        dtbdy = self.cfg.globdat.ibdyfrq * 3600.0
        for _ in range(nsteps):
            self.step()
            if hasattr(self, "_icbc") and self.xbctime >= dtbdy:
                self.update_boundary()

    # checkpoint/resume (mod_savefile equivalent; SURVEY §5.4) ----------
    def save_restart(self, path: str):
        from .io.restart import write_savefile
        write_savefile(path, jax.device_get(self.state), self.date,
                       self.nstep, self.xbctime,
                       bdy=jax.device_get(self.bdy))

    def load_restart(self, path: str):
        from .io.restart import read_savefile
        fields, date, nstep, xbctime, bdy_fields = read_savefile(path)
        cls = type(self.state)
        cur = self.state._asdict()
        # zero-size leaves (ntr=0 tracers) are absent from the SAV;
        # keep the model's zero template for them
        self.state = cls(**{
            k: (jnp.asarray(fields[k], self.dtype) if k in fields
                else cur[k]) for k in cls._fields})
        self.date = date
        self.nstep = nstep
        self.xbctime = xbctime
        if bdy_fields:
            # restore the live boundary pairs (SAV carries b0/bt +
            # xbctime, Main/mod_savefile.F90:46-48)
            bcls = type(self.bdy)
            kw = {k: (jnp.asarray(bdy_fields[k], self.dtype)
                      if k in bdy_fields else None)
                  for k in bcls._fields}
            self.bdy = bcls(**kw)

    def attach_icbc(self, reader):
        """Re-attach the ICBC input stream after a restart (the
        reference re-opens the boundary file by namelist at restart;
        the SAV already holds the current b0/bt pair + cursor, so no
        update is needed until the next ibdyfrq alarm)."""
        self._icbc = reader

    def attach_som(self, path: str):
        """Attach a SOM monthly q-flux file (open_som/read_som,
        Main/mod_ncio.F90:753-770,1130-1169): the slab ocean's
        ``do_qflux_adj`` heat-flux adjustment.  The 12 monthly qflx
        records are mid-month nodes; the month-interpolated value is
        refreshed into ``bdy.qflb0`` at every boundary alarm (the
        reference forms a qflb0/qflbt pair per month — same linear
        interpolation, sampled at the ibdyfrq cadence)."""
        from .io.ncio import read_nc
        d = read_nc(path)
        q = np.asarray(d["qflx"], dtype=np.float64)
        if q.shape[0] != 12:
            raise ValueError(
                f"SOM file {path}: expected 12 monthly qflx records, "
                f"got {q.shape[0]}")
        iy, jx = self.grid.iy, self.grid.jx
        if q.shape[-2:] != (iy, jx):
            # interior-extent file → edge-replicate to the full grid
            py = iy - q.shape[-2]
            px = jx - q.shape[-1]
            q = np.pad(q, ((0, 0), (0, py), (0, px)), mode="edge")
        self._som_qflx = jnp.asarray(q, self.dtype)
        if self.bdy is not None:
            self.bdy = self.bdy._replace(qflb0=self._som_value())

    def _som_value(self):
        """Mid-month linear interpolation of the monthly qflx
        (som_search month bracketing, mod_ncio.F90:1080-1128)."""
        d = self.date
        pos = d.month + (d.day - 15) / 30.0          # mid-month nodes
        m0 = int(np.floor(pos)) if pos >= 1 else 12
        w = pos - np.floor(pos)
        i0 = (m0 - 1) % 12
        i1 = m0 % 12
        return (1.0 - w) * self._som_qflx[i0] + w * self._som_qflx[i1]

    def open_output(self, outdir: Optional[str] = None,
                    append: bool = False,
                    backend: Optional[str] = None):
        """backend="zarr" selects the sharded Zarr-v2 store — the
        do_parallel_netcdf_out analogue (Share/mod_ncstream.F90:118),
        where every device shard writes its own chunk file and 3-D
        streams never funnel through a full-grid host buffer."""
        from .io.output import OutputStreams
        outdir = outdir or self.cfg.out.dirout
        backend = backend or getattr(self.cfg.out, "backend",
                                     "netcdf")
        self.streams = OutputStreams(
            self, outdir, self.cfg.terrain.domname, append=append,
            backend=backend)
        return self.streams

    def run_with_output(self, nsteps: int):
        """Run with output alarms (output(), Main/mod_output.F90:73).
        STS daily statistics accumulate every step and flush at each
        day boundary; LAK records follow the SRF alarm."""
        if not hasattr(self, "streams"):
            self.open_output()
        o = self.cfg.out
        atm_every = max(int(o.atmfrq * 3600.0 / self.dtsec), 1)
        srf_every = max(int(o.srffrq * 3600.0 / self.dtsec), 1)
        rad_every = max(int(o.radfrq * 3600.0 / self.dtsec), 1)
        che_every = max(int(o.chemfrq * 3600.0 / self.dtsec), 1)
        if self.streams.atm.nrec == 0:
            self.streams.write_atm()
            self.streams.write_srf()
            self.streams.write_rad()
            self.streams.write_lak()
            self.streams.write_che()
            self.streams.write_opt()
            self.streams.write_slaboc()
        for n in range(nsteps):
            self.step()
            self.streams.sts_accumulate()
            if self.nstep % atm_every == 0:
                self.streams.write_atm()
            if self.nstep % srf_every == 0:
                self.streams.write_srf()
                self.streams.write_lak()
                self.streams.write_sub()
            if self.nstep % rad_every == 0:
                self.streams.write_rad()
            if self.nstep % che_every == 0:
                self.streams.write_che()
                self.streams.write_opt()
            if self.nstep % srf_every == 0:
                self.streams.write_slaboc()

    # observability helpers
    def check_finite(self) -> bool:
        leaves = jax.tree_util.tree_leaves(self.state)
        return all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)

    def decoupled(self) -> Dict[str, np.ndarray]:
        """Physical-unit prognostics on the host. The decoupling math
        runs on device and the whole dict crosses in ONE batched
        jax.device_get — at flagship scale the per-variable
        np.asarray round-trips used to dominate the output alarm."""
        s = self.state
        if self.idynamic == 3:
            # MOLOCH prognostics are already physical; winds face→cross
            ux, vx = self.core.uvstag2x(s.u, s.v)
            atms = self.core.mkslice(s.t, s.pai, s.qx, s.u, s.v, s.w)
            return jax.device_get(dict(
                ps=atms["ps2d"] / 100.0,                  # hPa
                t=s.t, qv=s.qx[0], qc=s.qx[1],
                u=ux, v=vx, w=s.w))
        from .dynamics.stencil import cross2dot
        rps = 1.0 / s.ps_a
        rpsd = 1.0 / cross2dot(s.ps_a)
        return jax.device_get(dict(
            ps=(s.ps_a + self.grid.ptop) * 10.0,          # hPa
            t=s.t_a * rps[None],
            qv=s.qx_a[IQV] * rps[None],
            qc=s.qx_a[IQC] * rps[None],
            u=s.u_a * rpsd[None],
            v=s.v_a * rpsd[None],
        ))
