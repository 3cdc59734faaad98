"""Tiedtke mass-flux cumulus (icup=5 / iconv=4 ntiedtke,
Main/cumlib/mod_cu_tiedtke.F90:4508): column behavior on a
conditionally unstable sounding, budget contracts, and the Model-level
icup=5 wiring with detrained-condensate staging."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regcm_tpu.physics.cumulus.tiedtke import ntiedtke
from regcm_tpu.utils import constants as c

NK = 18
NP = 4


@pytest.fixture(scope="module")
def sounding():
    """Tropical-ish columns: moist unstable BL (cols 0,1,3), dry
    column 2. Returns the full ntiedtke argument tuple."""
    sig = (np.arange(NK) + 0.5) / NK
    ps, ptop = 100500.0, 5000.0
    ph = ptop + sig * (ps - ptop)
    pf = ptop + np.arange(NK + 1) / NK * (ps - ptop)
    t = np.zeros((NP, NK))
    for k in range(NK):
        z = 287.0 * 260.0 / 9.81 * np.log(ps / ph[k])
        t[:, k] = np.maximum(302.0 - 6.5e-3 * z, 200.0)
    qsat = 0.622 * 610.78 * np.exp(
        17.27 * (t - 273.15) / (t - 35.86)) / ph[None, :]
    rh = np.interp(sig, [0.0, 0.5, 0.8, 1.0], [0.1, 0.4, 0.85, 0.92])
    q = qsat * rh[None, :]
    q[2] = qsat[2] * 0.15
    u = np.full((NP, NK), 3.0) + np.linspace(8.0, 0.0, NK)[None, :]
    v = np.full((NP, NK), -1.0) - np.linspace(4.0, 0.0, NK)[None, :]
    za = np.zeros((NP, NK))
    zf = np.zeros((NP, NK + 1))
    for k in range(NK - 1, -1, -1):
        tv = t[:, k] * (1 + 0.608 * q[:, k])
        zf[:, k] = zf[:, k + 1] + 287.0 * tv / 9.81 \
            * np.log(pf[k + 1] / pf[k])
        za[:, k] = 0.5 * (zf[:, k] + zf[:, k + 1])
    qhfl = np.zeros((NP, NK + 1))
    qhfl[:, NK] = -8e-5
    ahfs = np.zeros((NP, NK + 1))
    ahfs[:, NK] = -120.0
    ldland = np.array([True, True, False, True])
    j = jnp.asarray
    return (j(t), j(q), j(u), j(v), j(np.zeros((NP, NK))), j(qhfl),
            j(ahfs), j(np.broadcast_to(ph, (NP, NK))),
            j(np.broadcast_to(pf, (NP, NK + 1))), j(za * c.egrav),
            j(zf * c.egrav), j(np.full((NP, NK), 2e-8)),
            j(np.zeros((NP, NK))), j(ldland)), ph, pf


def test_tiedtke_column_deep(sounding):
    args, ph, pf = sounding
    out = ntiedtke(*args, dtcum=60.0, dx=25000.0, pref=ph.copy())
    kt = np.asarray(out.ktype)
    # moist columns convect deep, the dry column stays quiet
    assert (kt[[0, 1, 3]] == 1).all()
    assert kt[2] == 0
    assert float(np.abs(np.asarray(out.tten)[2]).max()) == 0.0
    # cloud spans a deep layer (>200 hPa) and rains
    kc, kb = np.asarray(out.kctop), np.asarray(out.kcbot)
    assert (pf[kb[0]] - pf[kc[0]]) >= 2.0e4
    prate = np.asarray(out.prate)
    assert (prate[[0, 1, 3]] > 1e-5).all()       # kg/m²/s (not ×1e-3)
    # convective cloud fraction within Xu-Krueger bounds
    cf = np.asarray(out.cldfra)
    assert 0.0 <= cf.max() <= 0.6
    assert cf[0, kc[0]:kb[0] + 1].max() > 0.05
    # momentum transport active under shear, bounded
    assert float(np.abs(np.asarray(out.uten)).max()) > 1e-6
    assert float(np.abs(np.asarray(out.uten)).max()) < 0.05
    for name in out._fields:
        assert np.isfinite(np.asarray(getattr(out, name))).all(), name


def test_tiedtke_budget_contracts(sounding):
    """Column water contract of dtdqc (:6600-6625): the implicit
    solve conserves ∫dq over the solver span, and total water change
    balances surface precipitation up to the documented
    downdraft-evaporation bookkeeping (|resid| << drying)."""
    args, ph, pf = sounding
    out = ntiedtke(*args, dtcum=60.0, dx=25000.0, pref=ph.copy())
    dp = (pf[1:] - pf[:-1]) / c.egrav
    qint = (np.asarray(out.qten + out.lten + out.iten)
            * dp[None]).sum(1)
    prate = np.asarray(out.prate)
    for n in (0, 1, 3):
        assert prate[n] > 0
        resid = qint[n] + prate[n]
        # residual bounded by the DD evaporation share of the rain
        assert abs(resid) < 0.6 * abs(qint[n])
    # deep heating: column-integrated T tendency is positive
    tint = (np.asarray(out.tten) * dp[None]).sum(1)
    assert (tint[[0, 1, 3]] > 0).all()


def test_tiedtke_jit_scan_compile(sounding):
    """The scan-based formulation stays jittable with a bounded
    program (the reference's O(nk²) level loops are lax.scans) and
    matches the eager result."""
    args, ph, pf = sounding
    f = jax.jit(lambda *a: ntiedtke(*a, dtcum=60.0, dx=25000.0,
                                    pref=ph.copy()))
    outj = f(*args)
    oute = ntiedtke(*args, dtcum=60.0, dx=25000.0, pref=ph.copy())
    for name in outj._fields:
        a = np.asarray(getattr(outj, name)).astype(float)
        b = np.asarray(getattr(oute, name)).astype(float)
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12,
                                   err_msg=name)


def test_model_icup5(tmp_path):
    """Model-level icup=5: Tiedtke runs on the dtcum alarm inside the
    full suite, detrained condensate reaches the qc tendency (cuten
    slots 6-8), and the state stays finite."""
    from regcm_tpu.config.params import RegCMConfig
    from regcm_tpu.driver import Model, standard_atmosphere_state
    from regcm_tpu.core.grid import build_grid

    cfg = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 12, 16, 14
    cfg.physics.icup_lnd = 5
    cfg.physics.icup_ocn = 5
    grid = build_grid(cfg)
    s = standard_atmosphere_state(grid, cfg, perturb=0.5, seed=11)
    m = Model(cfg, grid=grid, initial_state=s)
    assert m.state.cuten.shape[0] == 9
    for _ in range(3):
        m.step()
    dec = m.decoupled()
    for name in ("t", "qv", "ps"):
        assert np.isfinite(np.asarray(dec[name])).all(), name
    assert float(np.asarray(dec["t"]).min()) > 150.0
    assert float(np.asarray(dec["t"]).max()) < 330.0


def test_ctracer_transport(sounding):
    """Internal convective tracer transport (ctracer :7549): mass
    conserved by the implicit solve, BL tracer moved upward in
    convecting columns, untouched in quiet ones."""
    from regcm_tpu.physics.cumulus.tiedtke import ctracer
    args, ph, pf = sounding
    out = ntiedtke(*args, dtcum=60.0, dx=25000.0, pref=ph.copy())
    ntr = 2
    qtrac = np.zeros((NP, NK, ntr))
    qtrac[:, -4:, 0] = 1.0e-6          # BL-concentrated tracer
    qtrac[:, :, 1] = 5.0e-7            # uniform tracer
    ct = np.asarray(ctracer(jnp.asarray(qtrac), out,
                            args[8], 60.0))
    dp = (pf[1:] - pf[:-1]) / c.egrav
    # quiet column: zero tendency
    assert np.abs(ct[2]).max() == 0.0
    for n in (0, 1, 3):
        # column mass conserved by the implicit transport operator
        m = (ct[n, :, 0] * dp).sum()
        scale = (qtrac[n, :, 0] * dp).sum() / 60.0
        assert abs(m) < 5e-3 * scale
        # BL tracer lofted: some tendency above the boundary layer
        assert ct[n, :-6, 0].max() > 0.0
        # BL source levels are depleted
        assert ct[n, -4:, 0].min() < 0.0
        # positivity guard: no tracer driven below ~0 in one impulse
        assert (qtrac[n, :, 0] + ct[n, :, 0] * 60.0).min() > -1e-12
    assert np.isfinite(ct).all()
