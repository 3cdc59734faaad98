"""Per-scheme column oracles for the big physics ports (VERDICT r2
item #5): NumPy f64 re-derivations FROM THE REFERENCE FORTRAN FORMULAS
(cited per test), in the same discipline as test_parity's dynamics
oracles.  Each test fails if the port's discretization drifts from the
reference's equations — not just if conservation breaks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ----------------------------------------------------------------------
# CCM3 SW: delta-Eddington layer solution
# ----------------------------------------------------------------------
def _np_delta_eddington(w, f, tau, g, mu):
    """Independent NumPy transcription of radded's layer solution
    (mod_rad_radiation.F90:2650-2685 + the el/taus/omgs/asys/xalpha/
    xgamma/f_u/f_n functions :4211-4290)."""
    ts = (1.0 - w * f) * tau                      # taus
    ws = (1.0 - f) * w / (1.0 - w * f)            # omgs
    gs = (g - f) / (1.0 - f)                      # asys
    lm = np.sqrt(3.0 * (1.0 - ws) * (1.0 - ws * gs))       # el
    # xalpha / xgamma / f_u
    alp = 0.75 * ws * mu * (1.0 + gs * (1.0 - ws)) \
        / (1.0 - lm * lm * mu * mu)
    gam = 0.5 * ws * (3.0 * gs * (1.0 - ws) * mu * mu + 1.0) \
        / (1.0 - lm * lm * mu * mu)
    ue = 1.5 * (1.0 - ws * gs) / lm
    extins = np.exp(-lm * ts)
    ne = (ue + 1.0) ** 2 / extins - (ue - 1.0) ** 2 * extins   # f_n
    rdif = (ue + 1.0) * (ue - 1.0) * (1.0 / extins - extins) / ne
    tdif = 4.0 * ue / ne
    explay = np.exp(-ts / mu)
    apg, amg = alp + gam, alp - gam
    rdir = amg * (tdif * explay - 1.0) + apg * rdif
    tdir = apg * tdif + (amg * rdif - (apg - 1.0)) * explay
    return (np.maximum(rdir, 0.0), np.maximum(rdif, 0.0),
            np.maximum(tdir, 0.0), np.maximum(tdif, 0.0), explay)


def test_sw_delta_eddington_oracle():
    from regcm_tpu.physics.radiation.ccm3.sw import _delta_eddington
    rng = np.random.default_rng(0)
    n = 200
    w = rng.uniform(0.1, 0.999999, n)
    f = rng.uniform(0.0, 0.7, n) * w          # f <= w scaled forward
    g = rng.uniform(0.05, 0.85, n)
    f = np.minimum(f, g * 0.99)               # physical: f = g² family
    tau = 10.0 ** rng.uniform(-4, 1.2, n)
    mu = rng.uniform(0.05, 1.0, n)
    ours = _delta_eddington(jnp.asarray(w), jnp.asarray(f),
                            jnp.asarray(tau), jnp.asarray(g),
                            jnp.asarray(mu))
    ref = _np_delta_eddington(w, f, tau, g, mu)
    for name, a, b in zip(("rdir", "rdif", "tdir", "tdif", "explay"),
                          ours, ref):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-10,
                                   atol=1e-10, err_msg=name)
    # physical sanity: conservative scattering layer reflects+transmits
    # ~everything (no absorption)
    wc = jnp.full((4,), 0.9999999)
    fc = jnp.full((4,), 0.4)
    gc = jnp.full((4,), 0.7)
    tc = jnp.asarray([0.1, 1.0, 5.0, 20.0])
    muc = jnp.full((4,), 0.6)
    rdir, rdif, tdir, tdif, expl = _delta_eddington(wc, fc, tc, gc, muc)
    absorb = 1.0 - np.asarray(rdir) - np.asarray(tdir)
    assert np.all(np.abs(absorb) < 5e-4)


# ----------------------------------------------------------------------
# CCM3 LW: stratospheric trace-gas profile (trcmix)
# ----------------------------------------------------------------------
def test_lw_trcmix_oracle():
    """NumPy transcription of mod_rad_tracer.F90:58-112 vs the port."""
    from regcm_tpu.physics.radiation.ccm3 import lw
    ncol, kz = 8, 18
    rng = np.random.default_rng(1)
    dlat = rng.uniform(0.0, 80.0, ncol)
    xptrop = (25000.0 - 15000.0 * np.cos(np.deg2rad(dlat)) ** 2) * 10.0
    pmid = np.linspace(1.0e3, 1.0e6, kz)[None, :] \
        * np.ones((ncol, 1))                       # dynes/cm²
    gas = dict(ch40=1.0e-6, n2o0=3.0e-7, cfc110=2.0e-10,
               cfc120=4.0e-10)
    n2o, ch4, c11, c12 = lw.trcmix(
        jnp.asarray(dlat), jnp.asarray(xptrop), jnp.asarray(pmid), gas)

    alat = np.abs(dlat)
    low = alat <= 45.0
    xn2o = np.where(low, 0.3478 + 0.00116 * alat,
                    0.4000 + 0.013333 * (alat - 45.0))
    xch4 = np.where(low, 0.2353, 0.2353 + 0.0225489 * (alat - 45.0))
    xc11 = np.where(low, 0.7273 + 0.00606 * alat,
                    1.00 + 0.013333 * (alat - 45.0))
    xc12 = np.where(low, 0.4000 + 0.00222 * alat,
                    0.50 + 0.024444 * (alat - 45.0))
    strat = pmid < xptrop[:, None]
    pr = pmid / xptrop[:, None]
    exp_n2o = np.where(strat, gas["n2o0"] * pr ** xn2o[:, None],
                       gas["n2o0"])
    exp_ch4 = np.where(strat, gas["ch40"] * pr ** xch4[:, None],
                       gas["ch40"])
    exp_c11 = np.where(strat, gas["cfc110"] * pr ** xc11[:, None],
                       gas["cfc110"])
    exp_c12 = np.where(strat, gas["cfc120"] * pr ** xc12[:, None],
                       gas["cfc120"])
    np.testing.assert_allclose(np.asarray(n2o), exp_n2o, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ch4), exp_ch4, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(c11), exp_c11, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(c12), exp_c12, rtol=1e-12)


# ----------------------------------------------------------------------
# BATS: two-band snow/zenith albedo
# ----------------------------------------------------------------------
def test_bats_albedo_oracle():
    """Snow-covered short-grass point vs the mod_bats_albedo.F90
    formulas (snal0/snal1 aging :150-170, zenith factor cff :158,
    soil-moisture albedo :95-105) re-derived in NumPy."""
    from regcm_tpu.physics.surface.bats import (bats_albedo,
                                                soil_static, _depth,
                                                fseas_fn, SNAL0, SNAL1)
    lveg = np.full((1, 1), 2)          # short grass
    ltex = np.full((1, 1), 6)
    ss_np = soil_static(lveg, ltex)
    ss = {k: jnp.asarray(v) for k, v in ss_np.items()}
    czen = jnp.full((1, 1), 0.5)
    tgbrd = jnp.full((1, 1), 268.0)
    ssw = jnp.asarray(0.5 * ss_np["gwmx0"])
    sncv = jnp.full((1, 1), 5.0)       # kg/m² snow
    snag = jnp.full((1, 1), 2.0)
    lnd = jnp.ones((1, 1))
    swdr, lwdr, swdf, lwdf = bats_albedo(czen, tgbrd, ssw, sncv, snag,
                                         ss, lnd)

    # --- independent NumPy from the Fortran formulas ---------------
    aseas = float(fseas_fn(tgbrd[0, 0]))
    lncl = ss_np["mfcv"][0, 0] - ss_np["seasf"][0, 0] * aseas
    age = 1.0 - 1.0 / (1.0 + 2.0)
    # depth/wt/scvk (mod_bats_drag.F90:181-204)
    densi = 0.01 / (1.0 + 3.0 * age)
    scrat = 5.0 * densi
    wt = 0.1 * scrat / ss_np["rough"][0, 0]
    wt = wt / (1.0 + wt)
    scvk = scrat / (0.1 + scrat)
    # soil albedo with moisture (albedo :95-105)
    wet = float(ssw[0, 0]) / ss_np["depuv"][0, 0]
    alwet = min(max(11.0 - 40.0 * wet, 0.0) * 0.01,
                ss_np["solour"][0, 0])
    albg = ss_np["solour"][0, 0] + alwet
    albgs, albgl = albg, 2.0 * albg
    # snow albedos with age + zenith (:150-170)
    dfalbs = SNAL0 * (1.0 - 0.2 * age)
    sl, sli = 2.0, 0.5
    cff = max((1.0 + sli) / (1.0 + 2.0 * sl * 0.5) - sli, 0.0)
    dralbs = dfalbs + 0.4 * cff * (1.0 - dfalbs)
    dfalbl = SNAL1 * (1.0 - 0.5 * age)
    dralbl = dfalbl + 0.4 * cff * (1.0 - dfalbl)
    albs = ss_np["albvgs"][0, 0]
    albl = ss_np["albvgl"][0, 0]
    exp_swdr = ((1.0 - lncl)
                * ((1.0 - scvk) * albgs + dralbs * scvk)
                + lncl * ((1.0 - wt) * albs + dralbs * wt))
    exp_lwdr = ((1.0 - lncl)
                * ((1.0 - scvk) * albgl + dralbl * scvk)
                + lncl * ((1.0 - wt) * albl + dralbl * wt))
    exp_swdf = ((1.0 - lncl)
                * ((1.0 - scvk) * albgs + dfalbs * scvk)
                + lncl * ((1.0 - wt) * albs + dfalbs * wt))
    np.testing.assert_allclose(float(swdr[0, 0]), exp_swdr, rtol=1e-12)
    np.testing.assert_allclose(float(lwdr[0, 0]), exp_lwdr, rtol=1e-12)
    np.testing.assert_allclose(float(swdf[0, 0]), exp_swdf, rtol=1e-12)


# ----------------------------------------------------------------------
# MYJ: level-2.5 TKE production/dissipation integration
# ----------------------------------------------------------------------
def test_myj_prodq2_oracle():
    """One-layer integration vs a NumPy transcription of the Fortran
    prodq2 two-iteration scheme (mod_pbl_myj.F90:655-779)."""
    from regcm_tpu.physics.pbl import myj as M
    kz = 5
    rng = np.random.default_rng(2)
    gm = rng.uniform(1e-6, 5e-4, (kz - 1, 1, 1))   # shear²
    gh = rng.uniform(-2e-4, 1e-5, (kz - 1, 1, 1))  # -buoyancy
    el = rng.uniform(5.0, 80.0, (kz - 1, 1, 1))
    q2 = rng.uniform(0.3, 4.0, (kz, 1, 1))
    ustar = np.full((1, 1), 0.4)
    dt = 60.0
    q2n, eln = M._prodq2(dt, jnp.asarray(ustar), jnp.asarray(gm),
                         jnp.asarray(gh), jnp.asarray(el),
                         jnp.asarray(q2))
    # NumPy re-derivation (only the turbulent branch)
    aequ = (M.AEQM * gm + M.AEQH * gh) * gh
    bequ = M.BEQM * gm + M.BEQH * gh
    eqol2 = -0.5 * bequ + np.sqrt(np.maximum(
        bequ * bequ * 0.25 - aequ, 0.0))
    anum = (M.ANMM * gm + M.ANMH * gh) * gh
    bnum = M.BNMM * gm + M.BNMH * gh
    aden = (M.ADNM * gm + M.ADNH * gh) * gh
    bden = M.BDNM * gm + M.BDNH * gh
    arhs = -(anum * bden - bnum * aden) * 2.0
    brhs = -anum * 4.0
    crhs = -bnum * 2.0
    dloq1 = el / np.sqrt(q2[:-1])
    el21 = 1.0 / eqol2
    el11 = np.sqrt(el21)
    rden1 = 1.0 / (aden * el21 ** 2 + bden * el21 + 1.0)
    rhsp1 = (arhs * el21 ** 2 * el11 + brhs * el21 * el11
             + crhs * el11) * rden1 * rden1
    el12 = np.maximum(el11 + (dloq1 - el11) * np.exp(rhsp1 * dt),
                      M.EPS1)
    el22 = el12 * el12
    rden2 = 1.0 / (aden * el22 ** 2 + bden * el22 + 1.0)
    rhs2 = -(anum * el22 ** 2 + bnum * el22) * rden2 + M.RB1
    rhsp2 = (arhs * el22 ** 2 * el12 + brhs * el22 * el12
             + crhs * el12) * rden2 * rden2
    rhst2 = rhs2 / rhsp2
    el13 = np.maximum(el12 - rhst2 + (rhst2 + dloq1 - el12)
                      * np.exp(rhsp2 * dt), M.EPS1)
    q2exp = np.maximum(el * el / (el13 * el13), M.EPSQ2)
    turb = ~(((gm + gh * gh) <= M.EPSTRB)
             | ((gh >= M.EPSGH) & (gm / gh <= M.REQU))
             | (eqol2 <= M.EPS2))
    got = np.asarray(q2n)[:kz - 1]
    np.testing.assert_allclose(got[turb], q2exp[turb], rtol=1e-9)
    # surface boundary condition q2(kz) = b1^(2/3)·u*²
    np.testing.assert_allclose(
        float(np.asarray(q2n)[kz - 1, 0, 0]),
        max(M.B1 ** (2.0 / 3.0) * 0.4 * 0.4, M.EPSQ2), rtol=1e-12)


# ----------------------------------------------------------------------
# UW TCM: moist buoyancy frequency reduces to g/θv·dθv/dz unsaturated
# ----------------------------------------------------------------------
def test_uwtcm_n2_oracle():
    """For unsaturated air the UW scheme's interfacial N² must equal
    the dry formula g·dθv/dz/θv (mod_pbl_uwtcm.F90 nsquared
    derivation; thl→θ, qw→qv when no condensate)."""
    from regcm_tpu.physics.pbl.uwtcm import _n2
    from regcm_tpu.utils import constants as c
    kz = 10
    z = np.linspace(3000.0, 100.0, kz)             # half levels, m
    theta = 300.0 + 0.004 * z                      # stable profile
    p0 = 101325.0
    pres = p0 * (1.0 - 2.25577e-5 * z) ** 5.25588
    qv = np.full(kz, 2.0e-3)                       # very subsaturated
    # (kz+1) interface grids: interior interfaces 1..kz-1
    presfl = np.concatenate([[pres[0] - 500.0],
                             0.5 * (pres[1:] + pres[:-1]),
                             [pres[-1] + 500.0]])
    exnerfl = (presfl / p0) ** (c.rgas / c.cpd)
    zfl = np.concatenate([[z[0] + 100.0],
                          0.5 * (z[1:] + z[:-1]), [0.0]])
    rdza = np.concatenate([[1.0], 1.0 / (z[:-1] - z[1:]), [1.0]])
    shape = lambda a: jnp.asarray(a[:, None, None])
    nsq, _ = _n2(shape(theta), shape(qv), shape(exnerfl),
                 shape(1.0 / exnerfl), shape(presfl), shape(rdza),
                 shape(qv))
    thv = theta * (1.0 + c.ep1 * qv)
    thvfl = 0.5 * (thv[1:] + thv[:-1])
    n2_dry = c.egrav * (thv[:-1] - thv[1:]) \
        * (1.0 / (z[:-1] - z[1:])) / thvfl
    np.testing.assert_allclose(np.asarray(nsq)[1:kz, 0, 0], n2_dry,
                               rtol=0.02)


# ----------------------------------------------------------------------
# Nogherotto-Tompkins: Sundqvist warm-rain autoconversion rate
# ----------------------------------------------------------------------
def test_nogtom_autoconversion_oracle():
    """Single warm cloudy layer, tiny dt: the rain production must
    match the explicit Sundqvist rate  ccover·(rkconv·dt)·
    (1−exp(−(ql_incld/xlcrit)²))  (mod_micro_nogtom.F90:1378-1402 +
    sundqvist internal) to implicit-solver accuracy."""
    from regcm_tpu.physics.micro import nogtom as N
    kz = 6
    dt = 2.0
    t = np.full(kz, 290.0)
    p = np.linspace(60000.0, 98000.0, kz)
    pf = np.concatenate([[55000.0],
                         0.5 * (p[1:] + p[:-1]), [101000.0]])
    rho = p / (287.0 * t)
    # fully saturated so cloud erosion/condensation stay inactive and
    # warm autoconversion is the only liquid sink
    from regcm_tpu.utils.thermo import pfwsat as _pfwsat
    qv = np.asarray(_pfwsat(jnp.asarray(t), jnp.asarray(p)))
    qc = np.zeros(kz)
    k0 = 2
    qc[k0] = 8.0e-4
    cf = np.zeros(kz)
    cf[k0] = 0.5
    sh = lambda a: jnp.asarray(a[:, None, None])
    qx5 = jnp.stack([sh(qv), sh(qc), sh(np.zeros(kz)),
                     sh(np.zeros(kz)), sh(np.zeros(kz))])
    out = N.nogtom(sh(t), qx5, sh(p),
                   jnp.asarray(pf[:, None, None]), sh(rho), sh(cf),
                   sh(np.zeros(kz)), sh(np.zeros(kz)),
                   sh(np.zeros(kz)), jnp.ones((1, 1)), dt)
    # rainaut is an IMPLICIT transfer coefficient multiplying ql in the
    # per-step solve (qsimp(iqqr,iqql) += rainaut, sundqvist internal):
    # column rain production ≈ rainaut·qc·Δp/g up to the implicit
    # coupling with same-step condensation/accretion (factor ~2)
    ql_incld = qc[k0] / cf[k0]
    alpha1 = min(N.RKCONV * dt, ql_incld)
    coeff = cf[k0] * alpha1 * (1.0 - np.exp(-(ql_incld
                                              / N.RCLCRIT_LAND) ** 2))
    dpg = (pf[1:] - pf[:-1]) / 9.80665
    col_qr = float((np.asarray(out.qxten[2][:, 0, 0]) * dpg).sum()) * dt
    produced = col_qr + float(out.rainnc[0, 0]) * dt
    expected = coeff * qc[k0] * dpg[k0]
    assert produced > 0.5 * expected, (produced, expected)
    assert produced < 3.0 * expected, (produced, expected)
