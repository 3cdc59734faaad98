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
    # finely-spaced near-surface sigma grid: on a coarse (~57 hPa)
    # grid the reference's pbcdif retry cycle correctly deactivates
    # every column (verified vs the Fortran-loop oracle,
    # test_grell_oracle.py)
    kz = 18
    x = np.linspace(0.0, 1.0, kz)
    sig = 0.995 - (0.995 - 0.03) * x ** 1.8
    psur = np.array([1013.0, 1013.0])
    p = sig[None] * (psur[:, None] - 50) + 50
    zz = 287.0 * 265.0 / 9.81 * np.log(psur[:, None] / p)
    t = np.maximum(302.0 - 0.0078 * np.minimum(zz, 7000.0)
                   - 0.0015 * np.maximum(zz - 7000.0, 0.0), 205.0)
    qs = np.asarray(pfwsat(jnp.asarray(t), jnp.asarray(p * 100)))
    q = qs * np.linspace(1.0, 0.25, kz)[None]
    q[0] *= 0.97
    q[1] *= 0.2
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


def test_uwtcm_pbl():
    """UW TCM (mod_pbl_uwtcm.F90:137): prognostic-TKE moist turbulence.
    Surface heat flux + shear generate TKE above the floor; implicit
    diffusion mixes the unstable near-surface layer upward; thl/qw
    conservation closes on the surface fluxes."""
    from regcm_tpu.physics.pbl.uwtcm import uwtcm, UWTKEMIN
    kz, iy, jx = 18, 3, 3
    sig = (np.arange(kz) + 0.5) / kz
    p0 = 101325.0
    ones = np.ones((kz, iy, jx))
    patm = (sig[:, None, None] * (p0 - 5000) + 5000) * ones
    sigf = np.arange(kz + 1) / kz
    patmf = (sigf[:, None, None] * (p0 - 5000) + 5000) \
        * np.ones((kz + 1, iy, jx))
    t = (288.0 - 60 * (1 - sig))[:, None, None] * ones
    # superadiabatic near-surface layer → convectively unstable
    t[-1] += 2.0
    qv = np.maximum(1e-6, 0.008 * sig ** 2)[:, None, None] * ones
    qc = np.zeros_like(t)
    u = 8.0 * ones
    v = np.zeros_like(t)
    tv = t * (1 + 0.608 * qv)
    dzl = 287.0 * tv / 9.81 * np.log(patmf[1:]
                                     / np.maximum(patmf[:-1], 1.0))
    zq = np.zeros((kz + 1, iy, jx))
    for k in range(kz - 1, -1, -1):
        zq[k] = zq[k + 1] + dzl[k]
    za = 0.5 * (zq[:-1] + zq[1:])
    dzq = zq[:-1] - zq[1:]
    tke0 = np.full((kz + 1, iy, jx), UWTKEMIN)
    heatrt = np.zeros_like(t)
    tg = t[-1] + 2.0
    qfx = np.full((iy, jx), 6e-5)
    hfx = np.full((iy, jx), 120.0)
    uvdrag = np.full((iy, jx), 0.05)
    lnd = np.ones((iy, jx))
    ktr = np.full((iy, jx), 2, dtype=np.int32)
    out = uwtcm(*[jnp.asarray(a) for a in
                  (t, qv, qc, np.zeros_like(t), u, v, za, zq, dzq,
                   patm, patmf, tke0, heatrt, tg, qv[-1], qfx, hfx,
                   uvdrag, lnd, ktr)], dt=300.0)
    for f in out:
        assert np.all(np.isfinite(np.asarray(f)))
    # TKE grows above the floor near the surface
    tke1 = np.asarray(tke0 + 300.0 * out.tketen)
    assert tke1[kz - 2:, 1, 1].max() > 2.0 * UWTKEMIN
    # surface heating warms the lowest layer (flux convergence)
    assert float(out.tten[kz - 1, 1, 1]) > 0.0
    # moisture flux moistens the column integral
    dq = np.asarray(out.qvten + out.qcten)
    colint = (dq * np.asarray(dzq) * np.asarray(patm)
              / (287.0 * np.asarray(t))).sum(axis=0)
    np.testing.assert_allclose(colint, 6e-5, rtol=0.1)
    # PBL height is positive and below the tropopause
    assert np.all(np.asarray(out.zpbl) >= 0.0)


def test_myj_pbl():
    """MYJ (mod_pbl_myj.F90:177): TKE production from shear+buoyancy,
    implicit scalar/momentum diffusion with ρ weighting."""
    from regcm_tpu.physics.pbl.myj import myjpbl, EPSQ2
    kz, iy, jx = 18, 3, 3
    sig = (np.arange(kz) + 0.5) / kz
    p0 = 101325.0
    ones = np.ones((kz, iy, jx))
    patm = (sig[:, None, None] * (p0 - 5000) + 5000) * ones
    sigf = np.arange(kz + 1) / kz
    patmf = (sigf[:, None, None] * (p0 - 5000) + 5000) \
        * np.ones((kz + 1, iy, jx))
    t = (288.0 - 60 * (1 - sig))[:, None, None] * ones
    t[-1] += 1.5
    qv = np.maximum(1e-6, 0.008 * sig ** 2)[:, None, None] * ones
    # sheared wind profile drives TKE production
    u = (20.0 * (1 - sig))[:, None, None] * ones + 5.0
    v = np.zeros_like(t)
    tv = t * (1 + 0.608 * qv)
    dzl = 287.0 * tv / 9.81 * np.log(patmf[1:]
                                     / np.maximum(patmf[:-1], 1.0))
    zq = np.zeros((kz + 1, iy, jx))
    for k in range(kz - 1, -1, -1):
        zq[k] = zq[k + 1] + dzl[k]
    ht = np.zeros((iy, jx))
    tke = np.full((kz, iy, jx), 0.5 * EPSQ2)
    tg = t[-1] + 1.0
    uvdrag = np.full((iy, jx), 0.05)
    lnd = np.ones((iy, jx))
    out = myjpbl(*[jnp.asarray(a) for a in
                   (t, qv, np.zeros_like(t), np.zeros_like(t), u, v,
                    zq, ht, patm, patmf, tke, tg, qv[-1], uvdrag, lnd,
                    tg * 1.02, qv[-1])], dt=300.0, first=True)
    for f in out:
        assert np.all(np.isfinite(np.asarray(f)))
    # shear produced TKE above the background in the lower troposphere
    assert float(np.asarray(out.tkepbl)[kz - 4:, 1, 1].max()) \
        > 0.5 * EPSQ2 * 1.05
    # momentum is diffused down-gradient: surface layer accelerates or
    # upper shear layer decelerates
    assert float(np.abs(np.asarray(out.uten)).max()) > 0.0
    assert np.all(np.asarray(out.zpbl) >= 0.0)


def test_hostetler_lake():
    """Hostetler lake (mod_ocn_lake.F90): open-water column warms under
    net heating, convective mixer removes static instability, lake
    points override ocean fluxes in the Model run (test_012 config)."""
    from regcm_tpu.physics.surface.lake import (
        lakedrv, init_lake, _lakemixer, _density)
    iy, jx, nlak = 6, 6, 40
    dh = np.zeros((iy, jx))
    dh[2:4, 2:4] = 30.0                      # a 30 m lake
    xlat = np.full((iy, jx), 45.0)
    tg0 = np.full((iy, jx), 288.0)
    tlak, eta, idep = init_lake(dh, xlat, tg0, nlak)
    assert tlak.shape == (nlak, iy, jx)
    assert float(eta[2, 2]) == -0.60         # 30 m → mesotrophic-ish
    assert int(idep[2, 2]) == 30

    # convective mixer: cold-over-warm profile is statically unstable
    # (density decreasing downward) → mixing toward uniform
    prof = jnp.asarray(np.where(np.arange(nlak)[:, None, None] < 5,
                                3.0, 10.0) * np.ones((nlak, iy, jx)))
    kbot = jnp.asarray(idep, jnp.int32) - 1
    kmask = jnp.arange(nlak)[:, None, None] <= kbot[None]
    mixed = _lakemixer(nlak, 600.0, prof, kmask, kbot)
    d0 = np.asarray(_density(prof))[:30, 2, 2]
    d1 = np.asarray(_density(mixed))[:30, 2, 2]
    # the concentrated unstable density jump at the 3/10 °C interface
    # is spread out by the downward mixing cascade
    jump0 = np.maximum(d0[:-1] - d0[1:], 0.0).max()
    jump1 = np.maximum(d1[:-1] - d1[1:], 0.0).max()
    assert jump1 < 0.3 * jump0
    # heat conserved by the mixer (volume-weighted, surf layer = 1 m)
    vol = np.ones(30)
    np.testing.assert_allclose(
        (np.asarray(mixed)[:30, 2, 2] * vol).sum(),
        (np.asarray(prof)[:30, 2, 2] * vol).sum(), rtol=1e-12)

    # one lakedrv step: strong solar heating warms the surface layer
    lakmsk = jnp.asarray((dh >= 2.0).astype(float))
    out = lakedrv(
        jnp.full((iy, jx), 290.0),           # tatm
        jnp.full((iy, jx), 0.008),           # qv
        jnp.full((iy, jx), 3.0), jnp.zeros((iy, jx)),   # u, v
        jnp.full((iy, jx), 40.0),            # za
        jnp.full((iy, jx), 600.0),           # swabs
        jnp.full((iy, jx), -60.0),           # lwnet
        jnp.zeros((iy, jx)),                 # prcp
        jnp.full((iy, jx), 10.0),            # prior sent
        jnp.full((iy, jx), 3e-5),            # prior evpr
        jnp.full((iy, jx), 1.2),             # rhox
        jnp.full((iy, jx), 101325.0),        # sfps
        jnp.asarray(tlak), jnp.full((iy, jx), 0.01),
        jnp.zeros((iy, jx)), jnp.zeros((iy, jx)), jnp.zeros((iy, jx)),
        tg0, jnp.asarray(eta), jnp.asarray(idep), lakmsk,
        jnp.asarray(xlat), 600.0)
    assert np.all(np.isfinite(np.asarray(out.tlak)))
    # surface water warmed by the absorbed radiation
    assert float(out.tlak[0, 2, 2]) > float(tlak[0, 2, 2])
    # non-lake points untouched
    np.testing.assert_allclose(np.asarray(out.tlak[:, 0, 0]),
                               tlak[:, 0, 0])
    assert float(out.tg[2, 2]) > 273.0
    # fluxes recomputed from the lake surface
    assert np.isfinite(float(out.sent[2, 2]))
    assert float(out.drag[2, 2]) > 0.0


def test_lake_in_model():
    """lakemod=1 wired through the PhysicsSuite (test_012's selector):
    the Model runs with a lake and updates the lake profile state."""
    from regcm_tpu.config.params import RegCMConfig
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.driver import Model
    cfg = RegCMConfig.from_file("/root/reference/Testing/test_012.in")
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 12, 14, 14
    cfg.geo.ds = 60.0
    cfg.time.dt = 150.0
    assert cfg.physics.lakemod == 1
    iy, jx = cfg.dim.iy, cfg.dim.jx
    lnd = np.ones((iy - 1, jx - 1))
    lnd[4:7, 4:7] = 0.0                      # water
    dh = np.zeros((iy - 1, jx - 1))
    dh[4:7, 4:7] = 25.0                      # lake depth
    grid = build_grid(cfg, landmask=lnd, dhlake=dh)
    m = Model(cfg, grid=grid, dtype=jnp.float64)
    t0 = np.asarray(m.state.tlak[:, 5, 5]).copy()
    for _ in range(3):
        m.step()
    assert m.check_finite()
    t1 = np.asarray(m.state.tlak[:, 5, 5])
    # lake profile engaged (surface layer changed on the dtsrf alarm)
    assert np.any(np.abs(t1 - t0) > 0.0)
    # lake surface temperature drives tg at the lake point
    tg = float(m.state.tg[5, 5])
    assert 260.0 < tg < 310.0


def test_bats1e_land():
    """BATS1e (mod_bats_bndry/leaftemp/drag/albedo): energy-balance
    sanity on a vegetated column — warm sunlit surface produces upward
    sensible+latent heat; soil water is drawn down by transpiration;
    snow appears for cold precipitating points; albedo responds to
    snow and soil moisture."""
    from regcm_tpu.physics.surface.bats import (
        soil_static, bats_init_state, vecbats, bats_albedo,
        BATS_FIELDS)
    iy, jx = 4, 4
    lveg = np.full((iy, jx), 2)      # short grass
    lveg[0, :] = 8                   # desert row
    ltex = np.full((iy, jx), 6)
    ss_np = soil_static(lveg, ltex)
    ss = {k: jnp.asarray(v) for k, v in ss_np.items()}
    tg = np.full((iy, jx), 290.0)
    b0 = bats_init_state(ss_np, np.ones((iy, jx)), tg, iy, jx)
    f2 = lambda v: jnp.full((iy, jx), float(v))
    lnd = jnp.ones((iy, jx))
    b = jnp.asarray(b0)
    tgj = jnp.asarray(tg)
    for _ in range(10):
        out = vecbats(f2(288.0), f2(0.006), f2(4.0), f2(1.0),
                      f2(45.0), f2(1.15), f2(101325.0), f2(0.0),
                      f2(500.0), f2(80.0), f2(350.0), f2(0.7),
                      tgj, b, ss, lnd, 600.0)
        b, tgj = out.bats, out.tgrd
    st = {k: np.asarray(b[i]) for i, k in enumerate(BATS_FIELDS)}
    assert np.isfinite(np.asarray(b)).all()
    # sunlit warm surface: upward sensible and latent heat
    assert float(out.sent[2, 2]) > 0.0
    assert float(out.evpr[2, 2]) > 0.0
    # vegetated point evaporates more than desert (soil + canopy)
    assert float(out.evpr[2, 2]) > float(out.evpr[0, 2])
    # ground warmed under 500 W/m2 absorbed
    assert float(tgj[2, 2]) > 290.0
    # upper soil water drawn down from slmo initial
    assert st["ssw"][2, 2] < 0.5 * float(ss_np["gwmx0"][2, 2])
    # leaf temperature tracks a sunlit canopy (warmer than air)
    assert st["tlef"][2, 2] > 288.0

    # snow accumulation for a cold precipitating point
    tg_c = jnp.full((iy, jx), 255.0)
    b_c = jnp.asarray(bats_init_state(ss_np, np.ones((iy, jx)),
                                      np.full((iy, jx), 255.0), iy, jx))
    out_c = vecbats(f2(256.0), f2(0.002), f2(4.0), f2(1.0), f2(45.0),
                    f2(1.3), f2(101325.0), f2(1e-4), f2(50.0),
                    f2(60.0), f2(30.0), f2(0.2), tg_c, b_c, ss, lnd,
                    600.0)
    sncv_new = np.asarray(out_c.bats[4])
    assert sncv_new[2, 2] > np.asarray(b_c[4])[2, 2]  # snow grows
    # snow raises the albedo strongly vs the warm bare case
    alb_w = bats_albedo(f2(0.6), b[0], b[6], b[4], b[5], ss, lnd)
    alb_c = bats_albedo(f2(0.6), out_c.bats[0], out_c.bats[6],
                        out_c.bats[4], out_c.bats[5], ss, lnd)
    assert float(alb_c[0][2, 2]) > float(alb_w[0][2, 2]) + 0.2


def test_nogtom_microphysics():
    """Nogherotto-Tompkins (mod_micro_nogtom.F90): saturated cloudy
    columns condense and precipitate; dry columns inert; water mass
    closes between column change and surface flux."""
    from regcm_tpu.physics.micro.nogtom import nogtom
    kz, iy, jx = 18, 3, 3
    sig = (np.arange(kz) + 0.5) / kz
    p0 = 101325.0
    ones = np.ones((kz, iy, jx))
    phs = (sig[:, None, None] * (p0 - 5000) + 5000) * ones
    sigf = np.arange(kz + 1) / kz
    pfs = (sigf[:, None, None] * (p0 - 5000) + 5000) \
        * np.ones((kz + 1, iy, jx))
    t = np.maximum(288.0 * (phs / p0) ** 0.19, 210.0)
    rho = phs / (287.0 * t)
    qs = np.asarray(pfwsat(jnp.asarray(t), jnp.asarray(phs)))
    qv = 0.97 * qs
    qv[:, 0, :] = 0.2 * qs[:, 0, :]           # dry row
    qc = np.zeros_like(t)
    qc[10:14, 1:, :] = 5e-4                   # cloud in moist rows
    qx = np.stack([qv, qc] + [np.zeros_like(t)] * 3)
    fcc = np.where(qc > 0, 0.9, 0.0)
    out = nogtom(*[jnp.asarray(a) for a in
                   (t, qx, phs, pfs, rho, fcc, np.zeros_like(t),
                    np.zeros_like(t), np.full_like(t, -0.3),
                    np.ones((iy, jx)))], dt=300.0)
    assert all(np.isfinite(np.asarray(v)).all() for v in out)
    # cloudy column rains at the surface
    assert float(out.rainnc[1, 1] + out.snownc[1, 1]) > 0.0
    # dry row produces nothing
    assert float(out.rainnc[0, 1] + out.snownc[0, 1]) < 1e-12
    # column water budget: d(water)/dt + precip_out = 0
    dp = (pfs[1:] - pfs[:-1]) / 9.80665
    colchg = (np.asarray(out.qxten).sum(axis=0) * dp).sum(axis=0)
    sfcflux = np.asarray(out.rainnc + out.snownc)
    np.testing.assert_allclose(colchg, -sfcflux, rtol=1e-6,
                               atol=1e-12)


def test_nogtom_in_model():
    """ipptls=2 runs through the Model (5-species advected state)."""
    from regcm_tpu.config.params import RegCMConfig
    from regcm_tpu.driver import Model
    cfg = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 16, 14
    cfg.geo.ds = 60.0
    cfg.time.dt = 150.0
    cfg.physics.ipptls = 2
    m = Model(cfg, dtype=jnp.float64)
    assert m.core.nqx == 5
    for _ in range(3):
        m.step()
    assert m.check_finite()


def test_seaice():
    """Sea-ice scheme (mod_ocn_bats.F90:105): cold ocean points grow
    ice under conductive flux, warm SST points stay open water, fluxes
    are strongly suppressed vs open water."""
    from regcm_tpu.physics.surface.seaice import seaice, ICETRIGGERT
    iy, jx = 4, 4
    f2 = lambda v: jnp.full((iy, jx), float(v))
    sst = np.full((iy, jx), 275.0)
    sst[0:2, :] = 270.0                     # frozen rows
    ice0 = jnp.zeros((4, iy, jx))
    ocn = jnp.zeros((iy, jx))               # all ocean
    out = seaice(f2(265.0), f2(0.0028), f2(5.0), f2(0.0), f2(40.0),
                 f2(1.3), f2(101325.0), f2(1e-4), f2(50.0), f2(60.0),
                 jnp.asarray(sst), ice0, ocn, 600.0)
    assert np.isfinite(np.asarray(out.ice)).all()
    icemask = np.asarray(out.icemask)
    assert icemask[0, 0] == 1.0 and icemask[3, 3] == 0.0
    # ice thickness grew from the conductive flux at the cold points
    assert float(out.ice[0][0, 0]) > 0.01
    # iced surface temperature at/below the freezing trigger
    assert float(out.tg[0, 0]) <= ICETRIGGERT + 1e-6
    # snow accumulated on the ice (cold air, precipitating)
    assert float(out.ice[1][0, 0]) > 0.0
    # repeated steps stay stable and keep growing ice in deep cold
    ice = out.ice
    for _ in range(5):
        o = seaice(f2(260.0), f2(0.001), f2(5.0), f2(0.0), f2(40.0),
                   f2(1.3), f2(101325.0), f2(0.0), f2(20.0), f2(70.0),
                   jnp.asarray(sst), ice, ocn, 600.0)
        ice = o.ice
    assert np.isfinite(np.asarray(ice)).all()
    assert float(ice[0][0, 0]) >= float(out.ice[0][0, 0])


def test_dcsst_diurnal_skin():
    """Zeng-Beljaars dcsst (mod_ocn_zeng.F90:293): strong daytime solar
    warms the skin above the bulk SST; nighttime cooling drops it below
    (cool-skin effect); state remains bounded."""
    from regcm_tpu.physics.surface.dcsst import dcsst
    iy, jx = 4, 4
    f2 = lambda v: jnp.full((iy, jx), float(v))
    sstb = f2(300.0)
    ocn = jnp.zeros((iy, jx))
    st = jnp.zeros((3, iy, jx))
    # daytime: 900 W/m2 absorbed, weak wind → warm layer builds
    for _ in range(12):
        out = dcsst(sstb, f2(900.0), f2(60.0), f2(8.0), f2(3e-5),
                    f2(0.08), f2(1.15), st, ocn, 600.0)
        st = out.dcsst
    assert np.isfinite(np.asarray(st)).all()
    tskin_day = float(out.tskin[1, 1])
    assert tskin_day > 300.05
    assert tskin_day < 304.0                 # bounded warm layer
    # night: no sun, strong cooling → skin below bulk
    for _ in range(30):
        out = dcsst(sstb, f2(0.0), f2(120.0), f2(30.0), f2(8e-5),
                    f2(0.25), f2(1.15), st, ocn, 600.0)
        st = out.dcsst
    tskin_night = float(out.tskin[1, 1])
    assert tskin_night < tskin_day
    assert tskin_night < 300.05


def test_emanuel_mixing_pallas_interpret():
    """The Pallas (columns-last) Emanuel mixing kernel matches the XLA
    columns-first path to f32 reassociation tolerance (interpret mode;
    on TPU the kernel is opt-in via emanuel.USE_PALLAS_MIXING)."""
    from regcm_tpu.physics.cumulus import emanuel as em
    from regcm_tpu.dynamics.pallas_kernels import emanuel_mixing

    rng = np.random.default_rng(0)
    ncol, L = 200, 20
    f = lambda lo, hi: jnp.asarray(rng.uniform(lo, hi, (ncol, L)),
                                   jnp.float32)
    h = f(2.8e5, 3.5e5)
    hp = f(2.8e5, 3.5e5)
    q = f(1e-4, 2e-2)
    qs = f(1e-3, 3e-2)
    t = f(200, 300)
    lv = f(2.3e6, 2.6e6)
    qti = f(1e-4, 2e-2)
    clw = f(0, 2e-3)
    ep = f(0, 1)
    m = f(0, 0.05)
    u = f(-20, 20)
    v = f(-20, 20)
    dph = f(5, 60)
    pc = lambda lo, hi: jnp.asarray(rng.uniform(lo, hi, ncol),
                                    jnp.float32)
    unk = pc(-20, 20)
    vnk = pc(-20, 20)
    icb = jnp.asarray(rng.integers(1, 6, ncol), jnp.int32)
    ict = jnp.asarray(rng.integers(8, L - 2, ncol), jnp.int32)
    ii = jnp.arange(L)[None]
    cloud = (ii >= icb[:, None] + 1) & (ii <= ict[:, None])

    ref = em._mixing_body(h, hp, q, qs, t, lv, qti, clw, ep, m, u, v,
                          dph, unk, vnk, icb, ict, cloud, em._LayCF(L))
    got = emanuel_mixing(em._mixing_body, em._LayCL, h, hp, q, qs, t,
                         lv, qti, clw, ep, m, u, v, dph, unk, vnk,
                         icb, ict, cloud, cb=128, interpret=True)
    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        scale = max(np.max(np.abs(a)), 1e-30)
        assert np.max(np.abs(a - b)) / scale < 5e-6, k
