"""Physics scheme unit tests on synthetic columns."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcm_tpu.utils import constants as c
from regcm_tpu.utils.thermo import pfwsat
from regcm_tpu.physics.micro.subex import subex, subex_cldfrac, \
    combine_clouds
from regcm_tpu.physics.radiation.simple import radiation, surface_albedo
from regcm_tpu.physics.surface.fluxes import surface_fluxes
from regcm_tpu.physics.pbl.holtslag import holtbl


def _column(kz=18, ny=4, nx=4, rh=0.5, t0=288.15):
    """Standard-atmosphere test columns."""
    sigma = np.linspace(0.025, 0.995, kz)
    ps = 101325.0
    ph = sigma * (ps - 5000.0) + 5000.0
    pf = np.concatenate([[5000.0], 0.5 * (ph[1:] + ph[:-1]), [ps]])
    fac = c.rgas * c.lrate * c.regrav
    t = c.stdt * (ph / ps) ** fac
    t = np.maximum(t, 216.65)
    shape3 = (kz, ny, nx)
    t3 = np.broadcast_to(t[:, None, None], shape3).copy()
    ph3 = np.broadcast_to(ph[:, None, None], shape3).copy()
    pf3 = np.broadcast_to(pf[:, None, None], (kz + 1, ny, nx)).copy()
    qv = rh * np.asarray(pfwsat(jnp.asarray(t3), jnp.asarray(ph3)))
    rho = ph3 / (c.rgas * t3)
    return (jnp.asarray(t3), jnp.asarray(ph3), jnp.asarray(pf3),
            jnp.asarray(qv), jnp.asarray(rho))


def test_cldfrac_limits():
    t, ph, pf, qv, rho = _column(rh=1.005)
    qc = jnp.full_like(t, 1e-4)
    rh = jnp.full_like(t, 1.0)
    rh0 = jnp.full_like(t[0], 0.8)
    fcc = subex_cldfrac(t, ph, qv, qc, rh, rh0)
    assert float(fcc.max()) == 1.0
    # no cloud water → no cloud
    fcc0 = subex_cldfrac(t, ph, qv, jnp.zeros_like(qc), rh, rh0)
    assert float(fcc0.max()) == 0.0


def test_subex_rains_when_cloudy():
    t, ph, pf, qv, rho = _column(rh=0.99)
    qc = jnp.full_like(t, 5e-4)        # 0.5 g/kg cloud water everywhere
    fcc = jnp.full_like(t, 0.9)
    rh = jnp.full_like(t, 0.99)
    psb = jnp.full_like(t[0], 96.325)
    p2 = jnp.full_like(t[0], 1.0)
    out = subex(t, ph, pf, qv, qc, rh, rho, fcc, psb, 300.0,
                qck1=p2 * 0.25e-3, cgul=p2 * 0.4, cevap=p2 * 1e-3,
                caccr=p2 * 3.0)
    assert float(out.precip.min()) > 0.0           # it rains
    assert float(out.qcten.max()) <= 0.0           # cloud water removed
    # bounded by total cloud water path / dt (pptmax constraint)
    cwp = float(jnp.sum(qc * (pf[1:] - pf[:-1]) * c.regrav, axis=0)[0, 0])
    assert float(out.precip.max()) <= cwp / 300.0 + 1e-12


def test_subex_no_rain_clear():
    t, ph, pf, qv, rho = _column(rh=0.3)
    qc = jnp.zeros_like(t)
    fcc = jnp.zeros_like(t)
    rh = jnp.full_like(t, 0.3)
    psb = jnp.full_like(t[0], 96.325)
    p2 = jnp.ones_like(t[0])
    out = subex(t, ph, pf, qv, qc, rh, rho, fcc, psb, 300.0,
                qck1=p2 * 0.25e-3, cgul=p2 * 0.4, cevap=p2 * 1e-3,
                caccr=p2 * 3.0)
    assert float(jnp.abs(out.precip).max()) == 0.0


def test_radiation_sanity():
    t, ph, pf, qv, rho = _column(rh=0.5)
    cldfra = jnp.zeros_like(t)
    cldlwc = jnp.zeros_like(t)
    mu = jnp.full_like(t[0], 0.7)
    tg = jnp.full_like(t[0], 290.0)
    alb = jnp.full_like(t[0], 0.15)
    out = radiation(t, qv, pf, ph, cldfra, cldlwc, mu, tg, alb)
    # OLR in the right ballpark for a 288K surface with vapour greenhouse
    assert 150.0 < float(out.olr.mean()) < 320.0
    assert float(out.swabs_sfc.mean()) > 300.0     # strong sun, low albedo
    # clear-sky LW cooling of troposphere ~ 1-3 K/day
    cool = float(out.heatrt[12:].mean()) * 86400.0
    assert -6.0 < cool < 0.5
    # cloudy sky: surface SW reduced, OLR reduced
    cf = cldfra.at[10].set(0.95)
    lw = cldlwc.at[10].set(0.3)
    out2 = radiation(t, qv, pf, ph, cf, lw, mu, tg, alb)
    assert float(out2.swabs_sfc.mean()) < float(out.swabs_sfc.mean())
    assert float(out2.olr.mean()) < float(out.olr.mean())


def test_surface_fluxes_signs():
    ny = nx = 4
    f2 = lambda v: jnp.full((ny, nx), v)
    # warm ground, cool air → upward sensible heat
    out = surface_fluxes(f2(5.0), f2(0.0), f2(285.0), f2(0.008),
                         f2(50.0), f2(1.2), f2(101325.0), f2(295.0),
                         f2(290.0), f2(1.0), f2(400.0), f2(-60.0),
                         f2(0.0), 600.0)
    assert float(out.hfx.min()) > 0.0
    assert float(out.qfx.min()) >= 0.0
    assert float(out.uvdrag.min()) > 0.0
    # cold ground → downward (negative) sensible heat
    out2 = surface_fluxes(f2(5.0), f2(0.0), f2(285.0), f2(0.008),
                          f2(50.0), f2(1.2), f2(101325.0), f2(275.0),
                          f2(275.0), f2(1.0), f2(0.0), f2(-60.0),
                          f2(0.0), 600.0)
    assert float(out2.hfx.max()) < 0.0


def test_holtslag_mixes_unstable_profile():
    t, ph, pf, qv, rho = _column(rh=0.5)
    kz, ny, nx = t.shape
    ps2d = pf[-1]
    tp = t * (ps2d[None] / ph) ** c.rovcp
    # heights
    za = jnp.cumsum((pf[1:] - pf[:-1])[::-1] / (rho[::-1] * c.egrav),
                    axis=0)[::-1] - 0.5 * (pf[1:] - pf[:-1]) \
        / (rho * c.egrav)
    dzq = (pf[1:] - pf[:-1]) / (rho * c.egrav)
    ux = jnp.full_like(t, 5.0)
    vx = jnp.zeros_like(t)
    f2 = lambda v: jnp.full((ny, nx), v)
    kmx = jnp.full((ny, nx), 5, jnp.int32)
    out = holtbl(tp, t, ph, pf, qv, jnp.zeros_like(qv), ux, vx, ux, vx,
                 za, dzq, f2(1.2), f2(0.005), f2(150.0), f2(1e-5),
                 f2(300.0), f2(1e-4), f2(96.325), f2(96.325),
                 kmx, 300.0)
    # strong surface heating → deep PBL, warming of low levels
    assert float(out.zpbl.min()) > 100.0
    assert bool(jnp.all(jnp.isfinite(out.tten)))
    # heat flux warms the column (coupled tendency; near-surface +)
    assert float(out.tten[-1].mean()) > 0.0
    # column-integrated budgets close on the surface fluxes
    dp = pf[1:] - pf[:-1]
    colq = float(jnp.sum(out.qvten * dp * c.regrav, axis=0)[0, 0]) / 96.325
    assert colq == pytest.approx(1e-5, rel=1e-6)    # == qfx
    colt = float(jnp.sum(out.tten * dp * c.regrav * c.cpd,
                         axis=0)[0, 0]) / 96.325
    assert colt == pytest.approx(150.0, rel=0.05)   # ≈ hfx (+cg term)


def test_emanuel_convection():
    """Emanuel scheme: unstable moist column convects and conserves
    column enthalpy; dry column stays inactive
    (cupeman, Main/cumlib/mod_cu_em.F90:406)."""
    from regcm_tpu.physics.cumulus.emanuel import cupeman
    kz = 18
    sig = np.linspace(0.995, 0.025, kz)
    ps = 1013.0
    ph = np.concatenate([[ps], 0.5 * (sig[1:] + sig[:-1]) * (ps - 50)
                         + 50, [50.0]])
    p = sig * (ps - 50) + 50
    t = np.maximum(302.0 * (p / ps) ** 0.23, 200.0)
    ncol = 2
    t2 = np.tile(t, (ncol, 1))
    qs = np.asarray(pfwsat(jnp.asarray(t2), jnp.asarray(p[None] * 100)))
    q = qs.copy()
    q[0] = qs[0] * np.concatenate([[0.9] * 4, [0.7] * 6, [0.3] * 8])
    q[1] = qs[1] * 0.20
    q = q / (1 + q)
    qs_s = qs / (1 + qs)
    zero = np.zeros((ncol, kz))
    cbmf = jnp.zeros(ncol)
    for _ in range(8):      # let the quasi-equilibrium closure spin up
        out = cupeman(jnp.asarray(t2), jnp.asarray(q), jnp.asarray(qs_s),
                      jnp.asarray(zero), jnp.asarray(zero),
                      jnp.asarray(np.tile(p, (ncol, 1))),
                      jnp.asarray(np.tile(ph, (ncol, 1))), cbmf, 300.0,
                      jnp.full(ncol, 1.1e-3), jnp.full(ncol, 0.999), 2)
        cbmf = out.cbmf
    assert bool(out.active[0]) and not bool(out.active[1])
    assert float(out.precip[0]) * 86400.0 > 1.0      # it rains (mm/day)
    assert float(out.precip[1]) == 0.0
    # warming aloft in the cloud layer
    assert float(out.ft[0, 8:14].mean()) > 0.0
    # exact column enthalpy conservation (cupeman :1127-1140)
    dphl = ph[:-1] - ph[1:]
    cpn = c.cpd * (1 - q[0]) + c.cpv * q[0]
    lv = c.wlhv - (2500.0 - c.cpv) * (t2[0] - c.tzero)
    ent = np.sum((cpn * np.asarray(out.ft[0])
                  + lv * np.asarray(out.fq[0])) * dphl)
    assert abs(ent) < 1e-6
    assert bool(jnp.all(jnp.isfinite(out.ft)))


def test_grell_convection():
    """Grell scheme (cup, Main/cumlib/mod_cu_grell.F90:460): moist
    unstable column convects with the FC80 closure; dry column inactive."""
    from regcm_tpu.physics.cumulus.grell import cup
    kz = 18
    sig = np.linspace(0.995, 0.025, kz)
    psur = np.array([1013.0, 1013.0])
    p = sig[None] * (psur[:, None] - 50) + 50
    t = np.maximum(302.0 * (p / psur[:, None]) ** 0.23, 200.0)
    qs = np.asarray(pfwsat(jnp.asarray(t), jnp.asarray(p * 100)))
    q = qs.copy()
    q[0] = qs[0] * np.concatenate([[0.95] * 5, [0.8] * 5, [0.4] * 8])
    q[1] = qs[1] * 0.2
    vsp = np.tile(np.linspace(2, 15, kz), (2, 1))
    out = cup(jnp.asarray(t), jnp.asarray(q), jnp.asarray(t),
              jnp.asarray(q), jnp.asarray(p), jnp.asarray(psur),
              jnp.zeros(2), jnp.asarray(vsp), 300.0, igcc=2)
    assert bool(out.active[0]) and not bool(out.active[1])
    assert float(out.pratec[0]) * 86400.0 > 1.0
    assert float(out.pratec[1]) == 0.0
    # heating in cloud layer, bounded by htmax
    assert float(out.outt[0].max()) * 86400.0 > 1.0
    assert float(jnp.abs(out.outt[0]).max()) * 86400.0 <= 505.0
    assert bool(jnp.all(jnp.isfinite(out.outt)))


def test_cloud_fraction_schemes():
    """icldfrac scheme family (Main/cloudlib): all bounded in [0,1],
    zero without condensate, increasing with RH."""
    from regcm_tpu.physics.cloud.fractions import (
        xuran_cldfrac, gulisa_cldfrac, texeira_cldfrac,
        tompkins_cldfrac, echam5_cldfrac)
    t, ph, pf, qv, rho = _column(rh=0.9)
    qs = jnp.asarray(np.asarray(pfwsat(t, ph)))
    qc = jnp.full_like(t, 2e-4)
    rh_lo = jnp.full_like(t, 0.5)
    rh_hi = jnp.full_like(t, 0.95)
    ps2d = pf[-1]
    for name, lo, hi in (
            ("xuran", xuran_cldfrac(ph, qc, qv, qs, rh_lo),
             xuran_cldfrac(ph, qc, qv, qs, rh_hi)),
            ("texeira", texeira_cldfrac(qc, qs, rh_lo),
             texeira_cldfrac(qc, qs, rh_hi)),
            ("echam5", echam5_cldfrac(qc, rh_lo, ph, ps2d),
             echam5_cldfrac(qc, rh_hi, ph, ps2d)),
            ("tompkins", tompkins_cldfrac(qc, rh_lo, ph, ps2d),
             tompkins_cldfrac(qc, rh_hi, ph, ps2d))):
        assert float(lo.min()) >= 0.0 and float(hi.max()) <= 1.0, name
        assert float(hi.mean()) >= float(lo.mean()), name
        # no condensate → no cloud
        zero = jnp.zeros_like(qc)
        if name == "xuran":
            assert float(xuran_cldfrac(ph, zero, qv, qs, rh_hi).max()) == 0
    g = gulisa_cldfrac(qv, qs, qc, 60.0)
    assert float(g.min()) >= 0.0 and float(g.max()) <= 1.0


def test_kuo_convection():
    """Kuo scheme (cupara, Main/cumlib/mod_cu_kuo.F90): convects only
    with moisture convergence above qdcrit in an unstable column."""
    from regcm_tpu.physics.cumulus.kuo import kuo, build_kuo_tables
    from regcm_tpu.utils.vertical import sigma_levels
    kz = 18
    sf, sh, dsg = sigma_levels(kz)
    ptop = 5.0
    ny, nx = 3, 3
    ps = jnp.full((ny, nx), 96.325)      # p* cb
    p = jnp.asarray(sh)[:, None, None] * ps[None] + ptop
    t = 302.0 * (p / 101.325) ** 0.23
    t = jnp.maximum(t, 205.0)
    qs = np.asarray(pfwsat(t, p * 1000.0))
    qv = jnp.asarray(qs) * 0.85
    qadv = jnp.zeros((kz, ny, nx))
    # strong low-level moisture convergence in column (1,1) only
    qadv = qadv.at[12:, 1, 1].set(5e-6)
    tw, vq = build_kuo_tables(sf, sh, dsg, ptop)
    out = kuo(t, qv, p, ps + ptop, qadv, jnp.asarray(sf),
              jnp.asarray(sh), jnp.asarray(dsg),
              jnp.asarray(tw), jnp.asarray(vq), ptop, 7)
    assert bool(out.active[1, 1])
    assert not bool(out.active[0, 0])
    assert float(out.prate[1, 1]) > 0.0
    assert float(out.prate[0, 0]) == 0.0
    # heating positive in cloud, finite
    assert float(out.tten[:, 1, 1].max()) > 0.0
    assert bool(jnp.all(jnp.isfinite(out.tten)))


def test_ghg_scenarios():
    """Scenario concentrations (mod_ipcc_scenario.F90 cgas tables) and
    the calibrated broadband CO2 forcing (~3.7 W/m2 per doubling)."""
    import numpy as np
    import jax.numpy as jnp
    from regcm_tpu.physics.radiation.ghg import ghg_concentrations
    from regcm_tpu.physics.radiation.simple import radiation
    from regcm_tpu.utils.vertical import sigma_levels
    from regcm_tpu.utils.thermo import pfwsat
    # historical + scenario spread
    g1990 = ghg_concentrations("RCP4.5", 1990)
    assert 350.0 < g1990["co2ppm"] < 358.0
    g85 = ghg_concentrations("RCP8.5", 2100)
    g26 = ghg_concentrations("RCP2.6", 2100)
    assert g85["co2ppm"] > 900.0 > g26["co2ppm"]
    # CONST pins to ghg_year_const; SSP aliases map
    assert ghg_concentrations("CONST", 2050, 1950)["co2ppm"] == \
        ghg_concentrations("RCP4.5", 1950)["co2ppm"]
    assert ghg_concentrations("SSP585", 2100) == \
        ghg_concentrations("RCP8.5", 2100)
    # radiative response: OLR drops ~3.7 W/m2 per CO2 doubling
    kz = 23
    sf, sh, dsg = sigma_levels(kz)
    ps = 101325.0
    pf = sf[:, None, None] * (ps - 5000.0) + 5000.0 * np.ones((kz + 1, 3, 3))
    ph = sh[:, None, None] * (ps - 5000.0) + 5000.0 * np.ones((kz, 3, 3))
    t = np.maximum(288.0 - 6.5e-3 * 287.0 / 9.81 * 288.0
                   * np.log(ps / ph), 216.7)
    qv = 0.5 * np.asarray(pfwsat(jnp.asarray(t), jnp.asarray(ph)))
    z = jnp.zeros((kz, 3, 3))
    cz = jnp.full((3, 3), 0.5)
    tg = jnp.full((3, 3), 288.0)
    alb = jnp.full((3, 3), 0.1)
    f = lambda ppm: radiation(jnp.asarray(t), jnp.asarray(qv),
                              jnp.asarray(pf), jnp.asarray(ph),
                              z, z, cz, tg, alb, co2ppm=ppm)
    dolr = float(f(660.0).olr.mean() - f(330.0).olr.mean())
    assert -4.5 < dolr < -3.0


def test_coare3_fluxes():
    """COARE3 (mod_ocn_coare.F90): warm SST under cool air gives upward
    sensible+latent heat; fluxes scale with wind; outputs finite."""
    from regcm_tpu.physics.surface.coare import coare3
    ny = nx = 4
    f2 = lambda v: jnp.full((ny, nx), v)
    out = coare3(f2(6.0), f2(0.0), f2(290.0), f2(0.010), f2(40.0),
                 f2(101325.0), f2(290.2), f2(299.0), f2(600.0),
                 f2(200.0), f2(50.0), f2(1.2))
    assert np.all(np.isfinite(np.asarray(out.sent)))
    assert np.all(np.isfinite(np.asarray(out.evpr)))
    assert float(out.evpr.min()) > 0.0          # warm sea evaporates
    assert float(out.drag.min()) > 0.0
    assert 0.05 < float(out.ustar.mean()) < 1.5
    assert 3.0 < float(out.u10.mean()) < 9.0
    # stronger wind → larger evaporation and drag
    out2 = coare3(f2(12.0), f2(0.0), f2(290.0), f2(0.010), f2(40.0),
                  f2(101325.0), f2(290.2), f2(299.0), f2(600.0),
                  f2(200.0), f2(50.0), f2(1.2))
    assert float(out2.evpr.mean()) > float(out.evpr.mean())
    assert float(out2.ustar.mean()) > float(out.ustar.mean())
    # cold SST below the air dewpoint: no evaporation (condensation
    # clipped to zero, :346)
    out3 = coare3(f2(6.0), f2(0.0), f2(290.0), f2(0.008), f2(40.0),
                  f2(101325.0), f2(290.2), f2(283.0), f2(600.0),
                  f2(200.0), f2(50.0), f2(1.2))
    assert float(out3.evpr.max()) == 0.0


def test_slab_ocean():
    """Slab ocean (mod_slabocean.F90): SST warms under net heating,
    restoring pulls toward the forcing SST, land points untouched."""
    from regcm_tpu.physics.surface.slab import update_slabocean
    ny = nx = 4
    f2 = lambda v: jnp.full((ny, nx), v)
    ocmask = jnp.ones((ny, nx), bool).at[0, 0].set(False)
    sst = f2(290.0)
    # strong net heating, no restore difference (sstbc == sst)
    s1, q1 = update_slabocean(sst, sst, ocmask, f2(400.0), f2(60.0),
                              f2(20.0), f2(5e-5), 600.0)
    d = np.asarray(s1 - sst)
    assert d[1, 1] > 0.0
    assert d[0, 0] == 0.0                       # land unchanged
    # analytic check: dSST = dt*(fsw-flw-h-L*E)/mlcp
    mlcp = 50.0 * 4.0e6
    import regcm_tpu.utils.constants as cc
    expect = 600.0 * (400.0 - 60.0 - 20.0 - cc.wlhv * 5e-5) / mlcp
    assert abs(d[1, 1] - expect) < 1e-12
    # restoring toward warmer bc SST adds heating
    s2, q2 = update_slabocean(sst, f2(295.0), ocmask, f2(0.0), f2(0.0),
                              f2(0.0), f2(0.0), 600.0)
    assert float(np.asarray(s2)[1, 1]) > 290.0
    assert float(np.asarray(q2)[1, 1]) > 0.0


def test_shallow_convection():
    """Shallow scheme (mod_cu_shallow.F90): a conditionally unstable
    boundary layer being destabilized by forcing produces a positive
    mass flux, no precipitation, column-enthalpy-neutral T/q tendencies
    confined to the lower troposphere."""
    from regcm_tpu.physics.cumulus.shallow import shallcu
    kz = 18
    sig = np.array([0.025, 0.075, 0.13, 0.195, 0.27, 0.35, 0.425, 0.5,
                    0.57, 0.64, 0.71, 0.78, 0.845, 0.895, 0.93, 0.96,
                    0.98, 0.993])[::-1]      # bottom-up, dense low levels
    ps = 1000.0
    p = sig * (ps - 50.0) + 50.0
    # marine trade-cumulus-like: moist subcloud layer under a weak
    # inversion (cloud base at level 2), steep lapse above
    t = np.maximum(300.0 * (p / ps) ** 0.2857, 210.0)
    t[1] += 1.5
    t[2] += 2.0
    qs = np.asarray(pfwsat(jnp.asarray(t), jnp.asarray(p * 100.0)))
    rhprof = np.concatenate([[0.97, 0.9, 0.8, 0.75, 0.7],
                             [0.45] * 5, [0.3] * 8])
    q = qs * rhprof
    ncol = 2
    t2 = jnp.asarray(np.tile(t, (ncol, 1)))
    q2 = jnp.asarray(np.tile(q, (ncol, 1)))
    # column 0: surface moistening+warming forcing (destabilizing);
    # column 1: no forcing
    tten = np.zeros((ncol, kz)); qten = np.zeros((ncol, kz))
    tten[0, :3] = 3.0 / 3600.0           # 3 K/h near-surface heating
    qten[0, :4] = 2.0e-3 / 3600.0
    out = shallcu(t2, q2, jnp.asarray(tten), jnp.asarray(qten),
                  jnp.asarray(np.tile(p, (ncol, 1))),
                  jnp.full((ncol,), ps), jnp.zeros((ncol,)), 300.0)
    assert np.all(np.isfinite(np.asarray(out.outts)))
    assert np.all(np.isfinite(np.asarray(out.outqs)))
    assert float(out.xmb[0]) > 0.0        # forced column convects
    assert float(out.xmb[1]) == 0.0       # unforced column does not
    # tendencies vanish above 400 hPa (shallow depth cap)
    hi = p < 400.0
    assert float(np.abs(np.asarray(out.outts)[:, hi]).max()) == 0.0
    # moist static energy roughly redistributed (cpd·dT + L·dq ≈ 0
    # columnwise). Not exact: the reference zeroes della(kbeg)
    # (mod_cu_shallow.F90:653), dropping the cloud-base compensation.
    dp = np.gradient(p) * -1.0
    mse = np.sum((c.cpd * np.asarray(out.outts)[0]
                  + c.wlhv * np.asarray(out.outqs)[0]) * dp)
    scale = np.sum(np.abs(c.cpd * np.asarray(out.outts)[0]) * dp) + 1e-30
    assert abs(mse) / scale < 0.6


def test_betts_miller():
    """Betts-Miller (mod_cu_bm.F90): a moist conditionally unstable
    column deep-convects (rain, heating aloft / drying below, cldefi
    spun up); a dry column stays inactive."""
    from regcm_tpu.physics.cumulus.betts_miller import bmpara, AVGEFI
    kz = 18
    sig = np.array([0.025, 0.075, 0.13, 0.195, 0.27, 0.35, 0.425, 0.5,
                    0.57, 0.64, 0.71, 0.78, 0.845, 0.895, 0.93, 0.96,
                    0.98, 0.993])                 # top-down
    ps = 101300.0
    p = sig * (ps - 5000.0) + 5000.0
    pf = np.concatenate([[5000.0], 0.5 * (p[1:] + p[:-1]), [ps]])
    t = np.maximum(302.0 * (p / ps) ** 0.21, 200.0)
    qs = np.asarray(pfwsat(jnp.asarray(t), jnp.asarray(p)))
    ncol = 2
    t2 = np.tile(t, (ncol, 1))
    q2 = np.tile(qs * 0.85, (ncol, 1))
    q2[1] = qs * 0.15                              # dry column
    z = np.zeros(kz)
    z[-1] = 287.0 * t[-1] / 9.81 * np.log(ps / p[-1])
    for k in range(kz - 2, -1, -1):
        z[k] = z[k + 1] + 287.0 * 0.5 * (t[k] + t[k + 1]) / 9.81 \
            * np.log(p[k + 1] / p[k])
    out = bmpara(jnp.asarray(t2), jnp.asarray(q2),
                 jnp.asarray(np.tile(p, (ncol, 1))),
                 jnp.asarray(np.tile(pf, (ncol, 1))),
                 jnp.asarray(np.tile(z, (ncol, 1))),
                 jnp.full((ncol,), ps), jnp.zeros((ncol,)),
                 jnp.full((ncol,), AVGEFI), 150.0)
    tten = np.asarray(out.tten)
    qten = np.asarray(out.qten)
    assert np.all(np.isfinite(tten)) and np.all(np.isfinite(qten))
    assert float(out.prate[0]) > 0.0               # moist column rains
    assert float(out.prate[1]) == 0.0
    assert np.abs(tten[1]).max() == 0.0            # dry column untouched
    assert int(out.ktop[0]) < int(out.kbot[0]) - 2  # deep cloud
    # convective adjustment: warming aloft, cooling/drying at low levels
    assert tten[0, int(out.ktop[0])] > 0.0
    assert tten[0, -2] < 0.0
    assert qten[0, -2] < 0.0
    # efficiency memory spun up over ocean toward 1
    assert float(out.cldefi[0]) > AVGEFI


def test_gfs_pbl():
    """GFS moninq (mod_pbl_gfs.F90): surface heating mixes the column
    (implicit diffusion warms low levels, moistens upward); column
    budgets close on the surface fluxes; momentum is damped."""
    from regcm_tpu.physics.pbl.gfs import moninq
    kz = 18
    ncol = 4
    sig = np.array([0.025, 0.075, 0.13, 0.195, 0.27, 0.35, 0.425, 0.5,
                    0.57, 0.64, 0.71, 0.78, 0.845, 0.895, 0.93, 0.96,
                    0.98, 0.993])[::-1]       # bottom-up
    ps = 101325.0
    p = sig * (ps - 5000.0) + 5000.0
    pf = np.concatenate([[ps], 0.5 * (p[1:] + p[:-1]), [5000.0]])
    t = np.maximum(288.0 * (p / ps) ** 0.19, 216.0)
    dz = 287.0 * t / 9.81 * np.gradient(-np.log(p))
    z = np.cumsum(dz) - 0.5 * dz
    qs = np.asarray(pfwsat(jnp.asarray(t), jnp.asarray(p)))
    q = (qs * 0.5) / (1.0 + qs * 0.5)
    tile = lambda a: jnp.asarray(np.tile(a, (ncol, 1)))
    u = tile(np.full(kz, 8.0)); v = tile(np.zeros(kz))
    prsl = tile(p) * 1e-3
    delk = tile(np.abs(np.gradient(pf))[:-1]) * 1e-3
    prsi = tile(pf) * 1e-3
    phii = tile(np.concatenate([[0.0], np.cumsum(dz)])) * 9.81
    phil = tile(z) * 9.81
    prslk = (tile(p) / c.stdp) ** c.rovcp
    psk = jnp.full((ncol,), (ps / c.stdp) ** c.rovcp)
    thr = tile(np.zeros(kz))
    heat = jnp.full((ncol,), 0.15)            # K m/s upward
    evap = jnp.full((ncol,), 5e-5)
    stress = jnp.full((ncol,), 0.09)
    rbsoil = jnp.full((ncol,), -0.5)          # unstable
    spd1 = jnp.full((ncol,), 8.0)
    out = moninq(u, v, tile(t), tile(q), tile(np.zeros(kz)),
                 prsl, prsi, delk, prslk, psk, phil, phii, thr,
                 heat, evap, stress, rbsoil, spd1, 300.0)
    assert np.all(np.isfinite(np.asarray(out.tau)))
    assert float(out.tau[0, 0]) > 0.0          # surface heating warms
    assert float(out.rtgq[0, 0]) > 0.0         # evaporation moistens
    assert float(out.du[0, 0]) < 0.0           # drag slows the sfc wind
    assert float(out.hpbl[0]) > 50.0
    # column heat budget ≈ surface flux: Σ tau·del/g·cp/ps... in sigma
    # coordinates Σ tau·(del/Σdel)·(ps/g)·cpd == rho·cp·heat-ish; check
    # the integral matches beta-scaled input within 20%
    colh = float(jnp.sum(out.tau[0] * delk[0]) / jnp.sum(delk[0]))
    assert colh > 0.0
