"""CB6r2 gas-phase mechanism tests: rate-constant oracles vs the
reference formulas (mod_cb6_Rates.F90 helpers + mod_cb6_Main constant
block), ODE function/Jacobian exactness, the box-model solver vs scipy
BDF, and the chemsimtype='CB6' model run.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcm_tpu.chem import _cb6_mech_data as M
from regcm_tpu.chem.cb6 import fun, jac, integrate, fixed_species, NVAR

NML = "/root/reference/Testing/test_011.in"
needs_ref = pytest.mark.skipif(not os.path.exists(NML),
                               reason="reference Testing corpus absent")


def _jv(day=True):
    """Representative midday clear-sky magnitudes for the 28 CB6
    channels (photolysis pass-through values for the oracles)."""
    vals = dict(NDOX=8.0e-3, O33P=4.4e-4, O31D=3.0e-5, HPOX=7.0e-6,
                NTOXa=2.0e-2, NTOXb=1.6e-1, DNPOb=3.0e-5, HONO=1.8e-3,
                NTRC=6.0e-7, PNA=5.0e-6, PACN=8.0e-7, PANX=8.0e-7,
                MEPX=5.5e-6, RPOX=5.5e-6, NTR=1.2e-6, FORM=3.0e-5,
                AALD=5.0e-6, ALDX=6.0e-6, GLYD=5.0e-6, GLY=8.0e-5,
                MEGY=1.0e-4, KET=5.0e-7, ACET=5.0e-7, ISPD=2.5e-6,
                HPLD=2.7e-5, CRON=6.0e-5, XOPN=1.5e-5, ROPN=1.5e-5)
    if not day:
        vals = {k: 0.0 for k in vals}
    return vals


def _box_state(ppb=None):
    """Polluted-boundary-layer initial state, molec/cm³ (CB6 names)."""
    Mair = 2.46e19
    base = {"NMOX": 5.0, "NDOX": 10.0, "OZN": 50.0, "CMON": 200.0,
            "FORM": 5.0, "ETHA": 2.0, "SDIO": 5.0, "ISPR": 1.0,
            "ALKA": 20.0, "ETHE": 1.0, "OLE": 1.0, "TOLN": 1.0,
            "XYLN": 0.5, "AALD": 1.0, "HPOX": 1.0, "NTRC": 1.0,
            "BENZ": 0.5, "PRPA": 2.0, "ACET": 1.0, "MEOH": 2.0}
    if ppb:
        base.update(ppb)
    var = np.zeros(NVAR)
    for k, v in base.items():
        var[M.SPECIES.index(k)] = v * 1.0e-9 * Mair
    wtr = 3.9e17                  # ~50% RH at 298 K
    fix = np.asarray(fixed_species(jnp.asarray(Mair),
                                   jnp.asarray(wtr)))
    return var, fix, Mair


def _np_fun(rconst, fix):
    """Pure-NumPy RHS from the extracted tables (independent of the
    jax path) for the scipy reference integration."""
    S = np.asarray(M.STOICH)
    idx = np.asarray(M.REACT_IDX)

    def f(t, y):
        c = np.concatenate([y, fix, [1.0]])
        a = rconst * c[idx[:, 0]] * c[idx[:, 1]] * c[idx[:, 2]]
        return S @ a
    return f


class TestRates:
    def test_rconst_oracle(self):
        """Independent f64 re-evaluation of the reference rate-law
        helpers (gtdp0/gtde0/gtd/fall/spd/lihi,
        mod_cb6_Rates.F90:41-91) vs the generated update_rconst."""
        T, Mair = 288.0, 2.5e19
        rc = np.asarray(M.update_rconst(np.float64(T),
                                        np.float64(Mair), _jv()))
        gtdp0 = lambda a, ea: a * np.exp(ea / T)
        gtde0 = lambda a, t0, p0: a * (T / t0) ** p0
        # rconst(3) = gtdp0(1.40D-12,-1310): O3+NO
        np.testing.assert_allclose(rc[2], gtdp0(1.4e-12, -1310.0),
                                   rtol=1e-12)
        # rconst(16) = gtd(6.20D-14,298,2.6,945): O3+HO2-like
        np.testing.assert_allclose(
            rc[15], 6.2e-14 * (T / 298.0) ** 2.6 * np.exp(945.0 / T),
            rtol=1e-12)
        # rconst(17) = fall(gtde0(6.9e-31,300,-0.8), 2.6e-11, 1.13,
        # 0.5): OH+OH+M (M in molec/cm³, see tools/extract_cb6.py)
        k0 = gtde0(6.9e-31, 300.0, -0.8)
        ki = 2.6e-11
        g = 1.0 / (1.0 + (np.log10(k0 * Mair / ki) / 1.13) ** 2)
        exp17 = (k0 * Mair / (1.0 + k0 * Mair / ki)) * 0.5 ** g
        np.testing.assert_allclose(rc[16], exp17, rtol=1e-12)
        # rconst(19) = spd(gtdp0(2.2e-13,600), gtdp0(1.9e-33,980)):
        # HO2+HO2
        np.testing.assert_allclose(
            rc[18], gtdp0(2.2e-13, 600.0)
            + Mair * gtdp0(1.9e-33, 980.0), rtol=1e-12)
        # rconst(46) = lihi(kk1,kk2,kk3): OH+HNO3
        kk1 = gtdp0(2.4e-14, 460.0)
        kk2 = gtdp0(2.7e-17, 2199.0)
        kk3 = gtdp0(6.5e-34, 1335.0)
        np.testing.assert_allclose(
            rc[45], kk1 + kk3 * Mair / (1.0 + kk3 * Mair / kk2),
            rtol=1e-12)
        # self-references: rconst(62) = rconst(54)
        np.testing.assert_allclose(rc[61], rc[53], rtol=1e-15)
        # constants from the mod_cb6_Main block
        np.testing.assert_allclose(rc[10], 2.14e-10, rtol=1e-12)
        np.testing.assert_allclose(rc[214], 2.3e-5, rtol=1e-12)
        # photolysis pass-through: rconst(1)=jNDOX, 27=NTOXb, 28=NTOXa
        np.testing.assert_allclose(rc[0], 8.0e-3, rtol=1e-12)
        np.testing.assert_allclose(rc[26], 1.6e-1, rtol=1e-12)
        np.testing.assert_allclose(rc[27], 2.0e-2, rtol=1e-12)

    def test_inorganic_nitrogen_balance(self):
        """N-atom conservation over the pure inorganic NOx reactions
        (the carbon-bond organics are known lumped non-closures)."""
        natoms = {"NMOX": 1, "NDOX": 1, "NTOX": 1, "DNPO": 2,
                  "HONO": 1, "NTRC": 1, "PNA": 1}
        nvec = np.zeros(NVAR)
        for k, v in natoms.items():
            nvec[M.SPECIES.index(k)] = v
        resid = nvec @ np.asarray(M.STOICH)
        # reactions 1-6, 24-30, 35-46 are the inorganic NOy cycle
        inorganic = [0, 1, 2, 3, 4, 5, 23, 24, 25, 26, 27, 28, 29,
                     34, 35, 36, 37, 38, 39, 42, 43, 44, 45]
        np.testing.assert_allclose(resid[inorganic], 0.0, atol=1e-12)


class TestFunJac:
    def test_jacobian_exact(self):
        var, fix, Mair = _box_state()
        rc = np.asarray(M.update_rconst(np.float64(298.0),
                                        np.float64(Mair), _jv()))
        v = jnp.asarray(var)[None]
        f = jnp.asarray(fix)[None]
        r = jnp.asarray(rc)[None]
        j_analytic = jac(v, f, r)[0]
        j_ad = jax.jacfwd(lambda y: fun(y[None], f, r)[0])(
            jnp.asarray(var))
        np.testing.assert_allclose(np.asarray(j_analytic),
                                   np.asarray(j_ad), rtol=1e-10,
                                   atol=1e-12)

    def test_fun_matches_numpy(self):
        var, fix, Mair = _box_state()
        rc = np.asarray(M.update_rconst(np.float64(298.0),
                                        np.float64(Mair), _jv()))
        expect = _np_fun(rc, fix)(0.0, var)
        got = np.asarray(fun(jnp.asarray(var)[None],
                             jnp.asarray(fix)[None],
                             jnp.asarray(rc)[None])[0])
        np.testing.assert_allclose(got, expect, rtol=1e-12)


@pytest.mark.slow
class TestSolver:
    def test_box_vs_scipy_bdf(self):
        """900 s daytime box integration vs scipy BDF at rtol 1e-8:
        the production tolerances (rtol=atol=0.1, mod_cb6_Main
        :103-105) agree to <5% on every major species, rtol=0.01 to
        <2%, and the error converges as the tolerance shrinks."""
        from scipy.integrate import solve_ivp
        var, fix, Mair = _box_state()
        rc = np.asarray(M.update_rconst(np.float64(298.0),
                                        np.float64(Mair), _jv()))
        ref = solve_ivp(_np_fun(rc, fix), (0.0, 900.0), var,
                        method="BDF", rtol=1e-8, atol=1e-2).y[:, -1]
        v0 = jnp.asarray(var)[None]
        fx = jnp.asarray(fix)[None]
        rcj = jnp.asarray(rc)[None]
        loose = np.asarray(integrate(v0, fx, rcj, 900.0)[0])
        tight = np.asarray(integrate(v0, fx, rcj, 900.0, rtol=0.01,
                                     atol=1e3, max_steps=300)[0])
        major = ["OZN", "NMOX", "NDOX", "CMON", "FORM", "SDIO",
                 "PACN", "NTRC", "HPOX", "ISPR", "HOX", "HO2"]
        worst_l = worst_t = 0.0
        for name in major:
            i = M.SPECIES.index(name)
            if ref[i] < 1e6:
                continue
            rl = abs(loose[i] - ref[i]) / ref[i]
            rt = abs(tight[i] - ref[i]) / ref[i]
            assert rl < 0.05, (name, loose[i], ref[i], rl)
            assert rt < 0.02, (name, tight[i], ref[i], rt)
            worst_l, worst_t = max(worst_l, rl), max(worst_t, rt)
        assert worst_t < worst_l

    def test_day_night_direction(self):
        var, fix, Mair = _box_state()
        rc_d = np.asarray(M.update_rconst(np.float64(298.0),
                                          np.float64(Mair), _jv()))
        rc_n = np.asarray(M.update_rconst(np.float64(298.0),
                                          np.float64(Mair),
                                          _jv(day=False)))
        v0 = jnp.asarray(var)[None]
        fx = jnp.asarray(fix)[None]
        day = np.asarray(integrate(v0, fx, jnp.asarray(rc_d)[None],
                                   900.0)[0])
        night = np.asarray(integrate(v0, fx, jnp.asarray(rc_n)[None],
                                     900.0)[0])
        ioh = M.SPECIES.index("HOX")
        ino = M.SPECIES.index("NMOX")
        assert day[ioh] > 1e5
        assert night[ioh] < day[ioh] * 0.1
        assert night[ino] < var[M.SPECIES.index("NMOX")]
        assert np.isfinite(day).all() and (day >= 0.0).all()


@needs_ref
@pytest.mark.slow
class TestModelCB6:
    def test_cb6_model_runs(self):
        """chemsimtype='CB6' (51 tracers) builds on the test_011 grid
        and runs steps with active photochemistry."""
        from regcm_tpu.config.params import RegCMConfig
        from regcm_tpu.core.grid import build_grid
        from regcm_tpu.driver import Model
        cfg = RegCMConfig.from_file(NML)
        cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 10, 12, 14
        cfg.chem.chemsimtype = "CB6"
        cfg.restart.mdate1 = 1990060112       # midday photochemistry
        grid = build_grid(cfg)
        m = Model(cfg, grid=grid, dtype=jnp.float64)
        spec = m.core.physics.chem.spec
        io3 = spec.names.index("OZN")
        ino2 = spec.names.index("NDOX")
        ico = spec.names.index("CMON")
        chi = m.state.chi_b
        ps = m.state.ps_b[None]
        mmr = lambda ppb, mw: ppb * 1e-9 * mw / 28.97
        chi = chi.at[io3].set(mmr(50.0, 48.0) * ps)
        chi = chi.at[ino2].set(mmr(10.0, 46.0) * ps)
        chi = chi.at[ico].set(mmr(200.0, 28.0) * ps)
        m.state = m.state._replace(chi_a=chi, chi_b=chi)
        o3_0 = float(jnp.max(m.state.chi_a[io3]))
        for _ in range(2):
            m.step()
        s = m.state
        assert bool(jnp.isfinite(s.chi_a).all())
        assert float(s.chi_a.min()) > -1e-12
        assert float(jnp.max(jnp.abs(s.chi_a[io3]))) != o3_0
