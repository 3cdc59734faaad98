"""Preprocessing/postprocessing chain tests."""
import os

import numpy as np
import pytest

from regcm_tpu.config.params import RegCMConfig
from regcm_tpu.preproc.terrain import (write_domain, synthetic_topo,
                                       build_grid_from_domain, smoothing)
from regcm_tpu.preproc.icbc import (generate_synthetic_icbc, ICBCReader,
                                    synthetic_fields)
from regcm_tpu.io.ncio import read_nc
from regcm_tpu.utils.calendar import Date


@pytest.fixture(scope="module")
def cfg():
    c = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    c.dim.iy, c.dim.jx = 20, 28
    c.globdat.gdate2 = 1990060200
    return c


def test_terrain_domain_roundtrip(cfg, tmp_path):
    topo, lnd, mask = synthetic_topo(cfg, kind="gauss", height=1000.0)
    p = str(tmp_path / "t_DOMAIN000.nc")
    write_domain(cfg, p, topo, lnd, mask)
    d = read_nc(p)
    assert d["topo"].shape == (cfg.dim.iy - 1, cfg.dim.jx - 1)
    assert d["topo"].max() > 500.0                 # smoothed but tall
    assert set(d) >= {"xlat", "xlon", "xmap", "dmap", "coriol", "mask",
                      "sigma", "ps0", "ts0", "landuse"}
    # pressure decreases with altitude
    assert d["ps0"].min() < 101325.0
    g = build_grid_from_domain(cfg, p)
    assert g.ht.max() > 0.0


def test_smoothing_reduces_roughness(cfg):
    topo, _, _ = synthetic_topo(cfg, kind="random", height=1000.0, seed=3)
    sm = smoothing(topo, 2)
    assert np.abs(np.diff(sm, axis=1)).mean() \
        < np.abs(np.diff(topo, axis=1)).mean()


def test_icbc_generation_and_reading(cfg, tmp_path):
    topo, _, _ = synthetic_topo(cfg, kind="flat")
    p = str(tmp_path / "t_ICBC.nc")
    generate_synthetic_icbc(cfg, topo, p, jet=15.0)
    r = ICBCReader(p)
    # 1990-06-01 .. 06-02 at 6h = 5 records
    assert r.nrec() == 5
    rec, idx = r.record_at(Date.from_int(1990060112))
    assert idx == 2
    assert rec["t"].shape == (cfg.dim.kz, cfg.dim.iy, cfg.dim.jx)
    assert 15.0 == pytest.approx(float(rec["u"].max()), rel=0.05)
    assert rec["ps"].mean() > 90000.0


def test_sigma2p(cfg, tmp_path):
    """ATM output → pressure levels (sigma2p, PostProc/sigma2p.F90)."""
    import jax
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.driver import Model, standard_atmosphere_state
    from regcm_tpu.postproc.sigma2p import sigma2p
    grid = build_grid(cfg)
    m = Model(cfg, grid=grid, physics=False,
              initial_state=standard_atmosphere_state(grid, cfg))
    m.open_output(str(tmp_path))
    m.run_with_output(2)
    m.streams.close()
    atm = [f for f in os.listdir(tmp_path) if "ATM" in f][0]
    out = sigma2p(str(tmp_path / atm), str(tmp_path / "plev.nc"))
    d = read_nc(out)
    assert d["ta"].shape[1] == 14                  # plev count
    # 500 hPa temperature of std atmosphere ≈ 252 K
    i500 = list(d["plev"]).index(500.0)
    t500 = d["ta"][0, i500, 5:-5, 5:-5].mean()
    assert 245.0 < t500 < 260.0


def test_icbc_driven_model_run(cfg, tmp_path):
    """terrain → icbc → ICBC-driven model: the reference's full
    preprocessing pipeline (SURVEY §3.4) in one test."""
    from regcm_tpu.driver import Model
    topo, lnd, mask = synthetic_topo(cfg, kind="gauss", height=500.0)
    dom = str(tmp_path / "d_DOMAIN000.nc")
    write_domain(cfg, dom, topo, lnd, mask)
    icbc = str(tmp_path / "d_ICBC.nc")
    generate_synthetic_icbc(cfg, topo, icbc, jet=8.0)
    grid = build_grid_from_domain(cfg, dom)
    m = Model(cfg, grid=grid)
    m.init_from_icbc(ICBCReader(icbc))
    m.run_icbc(20)
    assert m.check_finite()
    dec = m.decoupled()
    assert np.abs(dec["u"]).max() < 40.0
    assert 850.0 < dec["ps"][:-1, :-1].min() < 1050.0


def test_sigma2z(cfg, tmp_path):
    """ATM output → height levels (sigma2z, PostProc/sigma2z.F90):
    hydrostatic heights via htsig + linear-in-z interpolation."""
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.driver import Model, standard_atmosphere_state
    from regcm_tpu.postproc.sigma2z import sigma2z, ZLEVS
    grid = build_grid(cfg)
    m = Model(cfg, grid=grid, physics=False,
              initial_state=standard_atmosphere_state(grid, cfg))
    m.open_output(str(tmp_path))
    m.run_with_output(2)
    m.streams.close()
    atm = [f for f in os.listdir(tmp_path) if "ATM" in f][0]
    out = sigma2z(str(tmp_path / atm), str(tmp_path / "zlev.nc"))
    d = read_nc(out)
    assert d["ta"].shape[1] == len(ZLEVS)
    # standard atmosphere: T(2 km) ≈ 288 − 6.5·2 ≈ 275 K
    i2k = list(d["zlev"]).index(2000.0)
    t2k = d["ta"][0, i2k, 5:-5, 5:-5].mean()
    assert 268.0 < t2k < 282.0
    # temperature decreases with height across the stack
    i10k = list(d["zlev"]).index(10000.0)
    assert d["ta"][0, i10k].mean() < d["ta"][0, i2k].mean()


def _write_era5_fixture(root, year=1990, month=6):
    """Synthetic ERA5-layout monthly archive (standard atmosphere +
    zonal jet) for the reader test."""
    from regcm_tpu.io.ncio import NCWriter
    from regcm_tpu.utils import constants as c
    d = os.path.join(root, "ERA5", f"{year:04d}")
    os.makedirs(d, exist_ok=True)
    lats = np.arange(70.0, 9.9, -1.5)        # decreasing like ERA5
    lons = np.arange(-20.0, 60.1, 1.5)
    lev = np.array([100., 200., 300., 400., 500., 600., 700., 775.,
                    850., 925., 1000.])      # hPa
    nt = 9                                    # 6-hourly records
    ref1900 = Date(1900, 1, 1)
    t0 = (Date(year, month, 1) - ref1900) / 3600.0
    times = t0 + 6.0 * np.arange(nt)
    p3 = lev[:, None, None] * 100.0
    tfld = np.maximum(288.0 * (p3 / 101325.0) ** 0.19, 210.0) \
        * np.ones((len(lev), len(lats), len(lons)))
    zfld = (c.rgas * 255.0 / c.egrav
            * np.log(101325.0 / p3)) * np.ones_like(tfld) * c.egrav
    qfld = np.minimum(0.6 * 0.622 * 610.0
                      * np.exp(17.67 * (tfld - 273.15)
                               / (tfld - 29.65)) / p3, 0.02)
    ufld = 15.0 * np.exp(-((lats[None, :, None] - 40.0) / 10.0) ** 2) \
        * (1.0 - lev[:, None, None] / 1100.0) * np.ones_like(tfld)
    vfld = np.zeros_like(tfld)
    for var, fld in (("geop", zfld), ("t", tfld), ("q", qfld),
                     ("u", ufld), ("v", vfld)):
        w = NCWriter(os.path.join(d, f"{var}_{year}_{month:02d}.nc"),
                     dims={"level": len(lev), "latitude": len(lats),
                           "longitude": len(lons)})
        w.def_static("latitude", ("latitude",), lats)
        w.def_static("longitude", ("longitude",), lons)
        w.def_static("level", ("level",), lev)
        key = {"geop": "z"}.get(var, var)
        w.def_time_var(key, ("level", "latitude", "longitude"))
        for n in range(nt):
            w.write_record(times[n] , {key: fld})
        w.close()


def test_era5_icbc_pipeline(cfg, tmp_path):
    """ERA5 archive → icbc → ICBC-driven model run (mod_era5.F90
    equivalent on a synthetic fixture in the exact ERA5 file layout)."""
    import copy
    import jax.numpy as jnp
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.driver import Model
    from regcm_tpu.preproc.era5 import (ERA5Source, era5_fields,
                                        generate_era5_icbc)
    from regcm_tpu.preproc.terrain import synthetic_topo
    cfg = copy.deepcopy(cfg)
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 18, 14
    cfg.geo.ds = 60.0
    cfg.geo.clat, cfg.geo.clon = 40.0, 15.0
    cfg.time.dt = 150.0
    cfg.restart.mdate0 = cfg.restart.mdate1 = 1990060100
    cfg.globdat.gdate1, cfg.globdat.gdate2 = 1990060100, 1990060200
    _write_era5_fixture(str(tmp_path))
    grid = build_grid(cfg)
    src = ERA5Source(str(tmp_path))
    topo, _, _ = synthetic_topo(cfg)
    topo_gp = np.pad(topo, ((0, 1), (0, 1)), mode="edge") * 9.80665
    f = era5_fields(cfg, grid, topo_gp, src, Date(1990, 6, 1))
    assert np.isfinite(f["t"]).all() and np.isfinite(f["ps"]).all()
    assert 200.0 < f["t"].min() and f["t"].max() < 320.0
    assert 60000.0 < f["ps"].min() and f["ps"].max() < 106000.0
    assert f["u"].max() > 5.0          # the jet survived interpolation
    # full pipeline: write ICBC and run the model on it
    path = str(tmp_path / "era5_icbc.nc")
    generate_era5_icbc(cfg, grid, topo_gp, str(tmp_path), path)
    from regcm_tpu.preproc.icbc import ICBCReader
    m = Model(cfg, grid=grid, dtype=jnp.float64, physics=False)
    m.init_from_icbc(ICBCReader(path, cfg.globdat.calendar))
    m.run_icbc(3)
    assert m.check_finite()


def test_sst_program(cfg, tmp_path):
    """sst program (PreProc/ICBC/sst.F90): global dataset → model-grid
    SST series; analytic fallback; bilinear ocean interpolation."""
    import copy
    from regcm_tpu.preproc.sst import (generate_sst, read_sst,
                                       SSTSource, bilinear_global)
    cfg = copy.deepcopy(cfg)
    cfg.dim.iy, cfg.dim.jx = 12, 14
    cfg.globdat.gdate1, cfg.globdat.gdate2 = 1990060100, 1990060200
    # global OISST-style source file
    from regcm_tpu.io.ncio import NCWriter
    lats = np.arange(-88.0, 88.1, 2.0)
    lons = np.arange(0.0, 359.9, 2.0)
    sst = 300.0 - 25.0 * np.sin(np.deg2rad(np.abs(lats)))[:, None] ** 2 \
        * np.ones((len(lats), len(lons)))
    gpath = str(tmp_path / "oisst.nc")
    w = NCWriter(gpath, dims={"lat": len(lats), "lon": len(lons)})
    w.def_static("lat", ("lat",), lats)
    w.def_static("lon", ("lon",), lons)
    w.def_time_var("sst", ("lat", "lon"), "K")
    w.write_record(((Date(1990, 6, 1) - Date(1949, 12, 1)) / 3600.0),
                   {"sst": sst})
    w.close()
    out = str(tmp_path / "dom_SST.nc")
    generate_sst(cfg, out, SSTSource(gpath))
    s = read_sst(out, Date(1990, 6, 1, 12))
    assert s.shape == (cfg.dim.iy, cfg.dim.jx)
    assert np.isfinite(s).all()
    assert 270.0 < s.mean() < 305.0
    # bilinear sanity: recover a linear field exactly (interior)
    f = lats[:, None] * 0.5 + np.zeros((len(lats), len(lons)))
    got = bilinear_global(f, lats, lons,
                          np.array([[10.0, 33.0]]),
                          np.array([[40.0, 100.0]]))
    np.testing.assert_allclose(got, [[5.0, 16.5]], atol=1e-6)


def test_terrain_tile_reader(tmp_path):
    """Windowed tile reader + interpolators (Share/mod_rdldtr.F90,
    mod_intldtr.F90): mosaic assembly, bilinear recovery of a smooth
    field, bin-majority landuse, isolated-lake filter."""
    from regcm_tpu.preproc.rdldtr import (
        read_tiled_window, interp_bilinear, interp_majority,
        filter1plakes, write_tile_fixture)
    d = str(tmp_path / "tiles")
    fn = lambda la, lo: 100.0 + 10.0 * la + 2.0 * lo
    write_tile_fixture(d, "z", fn, lat0=30.0, lon0=0.0, ntile=2,
                       tilesize=10.0, res=0.25)
    gf = read_tiled_window(d, "z", 33.0, 46.0, 3.0, 16.0)
    # window excludes non-overlapping parts but covers the request
    assert gf.lats()[0] <= 33.0 + 0.5
    assert gf.lats()[-1] >= 45.9
    xlat = np.array([[35.3, 41.7], [38.1, 44.2]])
    xlon = np.array([[5.2, 12.9], [7.7, 15.1]])
    z = interp_bilinear(gf, xlat, xlon)
    np.testing.assert_allclose(z, fn(xlat, xlon), rtol=1e-6)
    # categorical majority
    lu = lambda la, lo: np.where(lo < 10.0, 2.0, 15.0) \
        * np.ones(np.broadcast_shapes(la.shape, lo.shape))
    write_tile_fixture(str(tmp_path / "lu"), "landuse", lu, lat0=30.0,
                       lon0=0.0, ntile=2, tilesize=10.0, res=0.25)
    gl = read_tiled_window(str(tmp_path / "lu"), "landuse",
                           33.0, 46.0, 3.0, 16.0)
    cats = interp_majority(gl, xlat, xlon, ncat=22)
    assert cats[0, 0] == 2 and cats[0, 1] == 15
    # isolated lake removal
    lnd = np.full((8, 8), 2)
    lnd[4, 4] = 14                       # lone lake point
    lnd[0:3, 0:3] = 14                   # real lake
    out = filter1plakes(lnd)
    assert out[4, 4] == 2
    assert (out[0:3, 0:3] == 14).all()


def test_crm_idealized_icbc(cfg, tmp_path):
    """CRM generators (PreProc/CRM): TOGA-like uniform sounding +
    BL perturbations drive a doubly-periodic run."""
    import copy
    import jax.numpy as jnp
    from regcm_tpu.driver import Model
    from regcm_tpu.preproc.crm import generate_crm_icbc, toga_sounding
    from regcm_tpu.preproc.icbc import ICBCReader
    cfg = copy.deepcopy(cfg)
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 16, 16, 14
    # hydrostatic-core CRM test: keep dx in the hydrostatic validity
    # range so the split-explicit gravity-wave substeps are stable
    # (a 3-4 km CRM belongs to the MOLOCH core)
    cfg.geo.ds = 25.0
    cfg.geo.i_crm = 1
    cfg.time.dt = 60.0
    cfg.physics.ipptls = 0
    p = np.linspace(10000.0, 101325.0, 30)
    t, qv = toga_sounding(p)
    assert t[-1] > 299.0 and t[0] < 210.0      # tropical + tropopause
    assert 0.015 < qv[-1] < 0.023              # moist boundary layer
    path = str(tmp_path / "crm_icbc.nc")
    generate_crm_icbc(cfg, path)
    m = Model(cfg, dtype=jnp.float64, physics=False)
    m.init_from_icbc(ICBCReader(path, cfg.globdat.calendar))
    m.run_icbc(4)
    assert m.check_finite()


def _write_ein_fixture(root, year=1990):
    """Synthetic ERA-Interim-layout yearly archive (air/hgt/rhum/uwnd/
    vwnd per synoptic hour) for the EIN15 reader test
    (PreProc/ICBC/mod_ein.F90 file layout)."""
    from regcm_tpu.io.ncio import NCWriter
    from regcm_tpu.utils import constants as c
    d = os.path.join(root, "EIN15", f"{year:04d}")
    os.makedirs(d, exist_ok=True)
    lats = np.arange(75.0, 4.9, -1.5)
    lons = np.arange(-25.0, 65.1, 1.5)
    lev = np.array([100., 200., 300., 400., 500., 600., 700., 775.,
                    850., 925., 1000.])
    ref1900 = Date(1900, 1, 1)
    p3 = lev[:, None, None] * 100.0
    tfld = np.maximum(288.0 * (p3 / 101325.0) ** 0.19, 210.0) \
        * np.ones((len(lev), len(lats), len(lons)))
    zfld = (c.rgas * 255.0 / c.egrav
            * np.log(101325.0 / p3)) * np.ones_like(tfld)   # heights m
    rhfld = 60.0 * np.ones_like(tfld)                       # percent
    ufld = 15.0 * np.exp(-((lats[None, :, None] - 40.0) / 10.0) ** 2) \
        * (1.0 - lev[:, None, None] / 1100.0) * np.ones_like(tfld)
    vfld = np.zeros_like(tfld)
    for hh in (0, 6, 12, 18):
        t0 = (Date(year, 6, 1, hh) - ref1900) / 3600.0
        times = t0 + 24.0 * np.arange(3)
        for var, fld in (("air", tfld), ("hgt", zfld),
                         ("rhum", rhfld), ("uwnd", ufld),
                         ("vwnd", vfld)):
            w = NCWriter(os.path.join(d, f"{var}.{year}.{hh:02d}.nc"),
                         dims={"level": len(lev), "lat": len(lats),
                               "lon": len(lons)})
            w.def_static("lat", ("lat",), lats)
            w.def_static("lon", ("lon",), lons)
            w.def_static("level", ("level",), lev)
            w.def_time_var(var, ("level", "lat", "lon"))
            for n in range(len(times)):
                w.write_record(times[n], {var: fld})
            w.close()


def test_ein_icbc_pipeline(cfg, tmp_path):
    """ERA-Interim archive → icbc → ICBC-driven run (mod_ein.F90
    equivalent on a synthetic fixture in the exact EIN15 layout,
    incl. the rh→mixing-ratio conversion)."""
    import copy
    import jax.numpy as jnp
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.driver import Model
    from regcm_tpu.preproc.ein import (EINSource, ein_fields,
                                       generate_ein_icbc)
    from regcm_tpu.preproc.terrain import synthetic_topo
    cfg = copy.deepcopy(cfg)
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 18, 14
    cfg.geo.ds = 60.0
    cfg.geo.clat, cfg.geo.clon = 40.0, 15.0
    cfg.time.dt = 150.0
    cfg.restart.mdate0 = cfg.restart.mdate1 = 1990060100
    cfg.globdat.gdate1, cfg.globdat.gdate2 = 1990060100, 1990060200
    _write_ein_fixture(str(tmp_path))
    grid = build_grid(cfg)
    src = EINSource(str(tmp_path))
    topo, _, _ = synthetic_topo(cfg)
    topo_gp = np.pad(topo, ((0, 1), (0, 1)), mode="edge") * 9.80665
    f = ein_fields(cfg, grid, topo_gp, src, Date(1990, 6, 1))
    assert np.isfinite(f["t"]).all() and np.isfinite(f["ps"]).all()
    assert 200.0 < f["t"].min() and f["t"].max() < 320.0
    assert f["u"].max() > 5.0
    assert 1e-4 < f["qv"].max() < 0.03     # rh→mr conversion sane
    path = str(tmp_path / "ein_icbc.nc")
    generate_ein_icbc(cfg, grid, topo_gp, str(tmp_path), path)
    from regcm_tpu.preproc.icbc import ICBCReader
    m = Model(cfg, grid=grid, dtype=jnp.float64, physics=False)
    m.init_from_icbc(ICBCReader(path, cfg.globdat.calendar))
    m.run_icbc(3)
    assert m.check_finite()


def test_self_nesting_pipeline(cfg, tmp_path):
    """Self-nesting (mod_nest.F90:823): a coarse regcm_tpu run's ATM
    output drives a fine nested domain end-to-end."""
    import copy
    import jax.numpy as jnp
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.driver import Model
    from regcm_tpu.preproc.nest import (NestSource, nest_fields,
                                        generate_nest_icbc)
    # --- coarse parent run with output ------------------------------
    ccfg = copy.deepcopy(cfg)
    ccfg.dim.iy, ccfg.dim.jx, ccfg.dim.kz = 16, 20, 14
    ccfg.geo.ds = 90.0
    ccfg.geo.clat, ccfg.geo.clon = 42.0, 12.0
    ccfg.time.dt = 240.0
    ccfg.out.atmfrq = 0.2                  # a record every 3 steps
    mc = Model(ccfg, dtype=jnp.float64)
    mc.open_output(str(tmp_path / "coarse"))
    mc.run_with_output(6)
    mc.streams.close()
    import glob
    atm = glob.glob(str(tmp_path / "coarse" / "*ATM*"))[0]

    # --- fine nested domain -----------------------------------------
    fcfg = copy.deepcopy(cfg)
    fcfg.dim.iy, fcfg.dim.jx, fcfg.dim.kz = 14, 16, 14
    fcfg.geo.ds = 30.0
    fcfg.geo.clat, fcfg.geo.clon = 42.0, 12.0
    fcfg.time.dt = 120.0
    fcfg.globdat.ibdyfrq = 1
    fcfg.globdat.gdate1 = fcfg.restart.mdate1 = ccfg.restart.mdate1
    fcfg.globdat.gdate2 = ccfg.restart.mdate1 + 2   # +2 hours
    from regcm_tpu.preproc.terrain import synthetic_topo
    ftopo, _, _ = synthetic_topo(fcfg)
    ftopo = np.pad(ftopo, ((0, 1), (0, 1)), mode="edge")
    fgrid = build_grid(fcfg)
    src = NestSource(atm)
    from regcm_tpu.utils.calendar import Date as _D
    f = nest_fields(fcfg, fgrid, ftopo, src,
                    _D.from_int(fcfg.globdat.gdate1))
    assert np.isfinite(f["t"]).all() and np.isfinite(f["ps"]).all()
    assert 200.0 < f["t"].min() and f["t"].max() < 320.0
    assert 55000.0 < f["ps"].min() and f["ps"].max() < 107000.0
    path = str(tmp_path / "nest_icbc.nc")
    generate_nest_icbc(fcfg, fgrid, ftopo, atm, path)
    from regcm_tpu.preproc.icbc import ICBCReader
    mf = Model(fcfg, grid=fgrid, dtype=jnp.float64, physics=False)
    mf.init_from_icbc(ICBCReader(path, fcfg.globdat.calendar))
    mf.run_icbc(3)
    assert mf.check_finite()


def test_ensemble_perturbation(cfg, tmp_path):
    """randify ensemble ICBC perturbation (Share/mod_ensemble.F90 via
    mod_ncio.F90:863-940): multiplicative, bounded by the requested
    fraction, off unless ensemble_run, reproducible via seed."""
    import copy
    from regcm_tpu.driver import Model
    topo, _, _ = synthetic_topo(cfg, kind="flat")
    icbc = str(tmp_path / "e_ICBC.nc")
    generate_synthetic_icbc(cfg, topo, icbc, jet=8.0)

    def state_t(c):
        m = Model(c)
        m.init_from_icbc(ICBCReader(icbc))
        return np.asarray(m.state.t_b), np.asarray(m.state.u_b)

    base_t, base_u = state_t(copy.deepcopy(cfg))
    cfg2 = copy.deepcopy(cfg)
    cfg2.globdat.ensemble_run = True
    cfg2.perturb.lperturb_t = True
    cfg2.perturb.lperturb_u = True
    cfg2.perturb.perturb_frac_t = 0.002
    cfg2.perturb.perturb_frac_u = 0.1
    cfg2.perturb.extras["seed"] = 7
    t1, u1 = state_t(cfg2)
    assert np.any(t1 != base_t)
    assert np.any(u1 != base_u)
    # multiplicative bound: |dT|/T <= frac on the raw (uncoupled) read;
    # coupling by ps preserves the relative bound
    rel = np.abs(t1 - base_t) / np.maximum(np.abs(base_t), 1e-30)
    assert float(rel.max()) <= 0.002 + 1e-12
    # same seed → same member; different seed → different member
    t1b, _ = state_t(copy.deepcopy(cfg2))
    np.testing.assert_array_equal(t1, t1b)
    cfg3 = copy.deepcopy(cfg2)
    cfg3.perturb.extras["seed"] = 8
    t2, _ = state_t(cfg3)
    assert np.any(t2 != t1)
    # ensemble_run off → perturbparam ignored (mod_dynparam.F90:711)
    cfg4 = copy.deepcopy(cfg2)
    cfg4.globdat.ensemble_run = False
    t4, _ = state_t(cfg4)
    np.testing.assert_array_equal(t4, base_t)


def test_chem_icbc_climatology(tmp_path):
    """chem_icbc climatic BCs (PreProc/ICBC/mod_ch_icbc_clim.F90): a
    DUST run relaxes its inflow boundaries toward non-clean
    climatological air instead of zero."""
    import copy
    import jax.numpy as jnp
    from regcm_tpu.preproc.chem_icbc import (generate_chem_icbc,
                                             CHBCReader, climatic_chi)
    from regcm_tpu.chem.species import build_species
    from regcm_tpu.driver import Model
    from regcm_tpu.utils.vertical import sigma_levels

    c2 = RegCMConfig.from_file("/root/reference/Testing/test_008.in")
    c2.dim.iy, c2.dim.jx = 20, 28
    c2.globdat.gdate1 = 1990060100
    c2.globdat.gdate2 = 1990060200
    c2.restart.mdate1 = 1990060100
    c2.restart.mdate2 = 1990060200

    # generator sanity: dust decays upward, month cycle is smooth
    spec = build_species(c2.chem.chemsimtype)
    _, sh, _ = sigma_levels(c2.dim.kz, c2.dim.dsmax, c2.dim.dsmin)
    lat = np.linspace(-60, 60, 7)[:, None] * np.ones((1, 3))
    jan = climatic_chi(spec, sh, lat, 1)
    jul = climatic_chi(spec, sh, lat, 7)
    assert jan.shape == (spec.ntr, c2.dim.kz, 7, 3)
    assert (jan[0, -1] >= jan[0, 0]).all()        # more dust near sfc
    assert np.any(jan != jul)                      # seasonal cycle
    assert jan.max() > 0.0

    topo, _, _ = synthetic_topo(c2, kind="flat")
    icbc = str(tmp_path / "c_ICBC.nc")
    generate_synthetic_icbc(c2, topo, icbc, jet=6.0)
    chbc = str(tmp_path / "c_CHBC.nc")
    generate_chem_icbc(c2, chbc)
    r = CHBCReader(chbc)
    assert r.nrec() == 5
    rec, _ = r.record_at(Date.from_int(1990060112))
    assert rec.shape[0] == spec.ntr and rec.max() > 0.0

    def run(with_chbc):
        m = Model(copy.deepcopy(c2))
        m.init_from_icbc(ICBCReader(icbc))
        if with_chbc:
            m.set_chem_bc(CHBCReader(chbc))
        m.run_icbc(6)
        assert m.check_finite()
        return np.asarray(m.state.chi_b)

    chi_bc = run(True)
    chi_clean = run(False)
    # the CHBC-relaxed run carries climatological dust in from the
    # boundary ring; the clean run only has local emission
    edge_bc = np.abs(chi_bc[:, -1, :2, :]).max()
    edge_clean = np.abs(chi_clean[:, -1, :2, :]).max()
    assert edge_bc > edge_clean
    assert chi_bc.max() > 1e-12


# ---------------------------------------------------------------------------
# NNRP (NCEP/NCAR reanalysis) reader — mod_ncep.F90 equivalent
# ---------------------------------------------------------------------------

def _write_nnrp_fixture(root, year=1990):
    """Synthetic CDC-layout yearly archive: packed int16 variables with
    scale/offset, levels hPa DECREASING from 1000, rhum only on the
    lowest 8 levels (the NNRP1 quirk, mod_ncep.F90:430)."""
    from scipy.io import netcdf_file
    from regcm_tpu.utils import constants as c
    d = os.path.join(root, "NNRP1", f"{year:04d}")
    os.makedirs(d, exist_ok=True)
    lats = np.arange(70.0, 9.9, -2.5)
    lons = np.arange(-20.0, 60.1, 2.5)
    lev = np.array([1000., 925., 850., 700., 600., 500., 400., 300.,
                    250., 200., 100.])           # decreasing (CDC)
    nt = 9
    ref = Date(1800, 1, 1)
    t0 = (Date(year, 6, 1) - ref) / 3600.0
    times = t0 + 6.0 * np.arange(nt)
    p3 = lev[:, None, None] * 100.0
    tfld = np.maximum(288.0 * (p3 / 101325.0) ** 0.19, 210.0) \
        * np.ones((len(lev), len(lats), len(lons)))
    zfld = (c.rgas * 255.0 / c.egrav) * np.log(101325.0 / p3) \
        * np.ones_like(tfld)
    ufld = 12.0 * np.exp(-((lats[None, :, None] - 40.0) / 10.0) ** 2) \
        * (1.0 - lev[:, None, None] / 1100.0) * np.ones_like(tfld)
    vfld = np.zeros_like(tfld)
    rhfld = np.clip(80.0 - 40.0 * (1.0 - lev[:8, None, None] / 1000.0),
                    5.0, 95.0) * np.ones((8, len(lats), len(lons)))

    def pack(path, name, fld, flev):
        f = netcdf_file(path, "w")
        f.createDimension("time", None)
        f.createDimension("level", len(flev))
        f.createDimension("lat", len(lats))
        f.createDimension("lon", len(lons))
        for nm, vals in (("level", flev), ("lat", lats), ("lon", lons)):
            v = f.createVariable(nm, "f", (nm,))
            v[:] = vals.astype(np.float32)
        tv = f.createVariable("time", "d", ("time",))
        tv[:] = times
        scale = (fld.max() - fld.min() + 1e-6) / 60000.0
        off = 0.5 * (fld.max() + fld.min())
        pv = f.createVariable(name, "h", ("time", "level", "lat",
                                          "lon"))
        pv.scale_factor = scale
        pv.add_offset = off
        packed = np.round((fld - off) / scale).astype(np.int16)
        for n in range(nt):
            pv[n] = packed
        f.close()

    pack(os.path.join(d, f"air.{year}.nc"), "air", tfld, lev)
    pack(os.path.join(d, f"hgt.{year}.nc"), "hgt", zfld, lev)
    pack(os.path.join(d, f"rhum.{year}.nc"), "rhum", rhfld, lev[:8])
    pack(os.path.join(d, f"uwnd.{year}.nc"), "uwnd", ufld, lev)
    pack(os.path.join(d, f"vwnd.{year}.nc"), "vwnd", vfld, lev)


def test_nnrp_icbc_pipeline(cfg, tmp_path):
    """NNRP archive → icbc → ICBC-driven model run (mod_ncep.F90
    equivalent on a packed-int16 fixture in the CDC file layout)."""
    import copy
    import jax.numpy as jnp
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.driver import Model
    from regcm_tpu.preproc.ncep import (NCEPSource, ncep_fields,
                                        generate_ncep_icbc)
    from regcm_tpu.preproc.terrain import synthetic_topo
    cfg = copy.deepcopy(cfg)
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 18, 14
    cfg.geo.ds = 60.0
    cfg.geo.clat, cfg.geo.clon = 40.0, 15.0
    cfg.time.dt = 150.0
    cfg.restart.mdate0 = cfg.restart.mdate1 = 1990060100
    cfg.globdat.gdate1, cfg.globdat.gdate2 = 1990060100, 1990060200
    _write_nnrp_fixture(str(tmp_path))
    grid = build_grid(cfg)
    src = NCEPSource(str(tmp_path), "NNRP1")
    topo, _, _ = synthetic_topo(cfg)
    topo_gp = np.pad(topo, ((0, 1), (0, 1)), mode="edge") * 9.80665
    f = ncep_fields(cfg, grid, topo_gp, src, Date(1990, 6, 1))
    assert np.isfinite(f["t"]).all() and np.isfinite(f["ps"]).all()
    assert 200.0 < f["t"].min() and f["t"].max() < 320.0
    assert 60000.0 < f["ps"].min() and f["ps"].max() < 106000.0
    assert f["u"].max() > 4.0
    assert f["qv"].max() > 1e-3          # rhum -> mixing ratio worked
    path = str(tmp_path / "nnrp_icbc.nc")
    generate_ncep_icbc(cfg, grid, topo_gp, str(tmp_path), path,
                       dattyp="NNRP1")
    from regcm_tpu.preproc.icbc import ICBCReader
    m = Model(cfg, grid=grid, dtype=jnp.float64, physics=False)
    m.init_from_icbc(ICBCReader(path, cfg.globdat.calendar))
    m.run_icbc(3)


# ---------------------------------------------------------------------------
# CMIP5 6hrLev GCM readers — mod_gn6hnc + mpiesm/hadgem helpers
# ---------------------------------------------------------------------------

def _hybrid_profile(nlev):
    """ap/b hybrid coefficients spanning ~10 hPa .. surface."""
    x = (np.arange(nlev) + 0.5) / nlev          # 0=top, 1=bottom
    bk = np.clip((x - 0.2) / 0.8, 0.0, 1.0) ** 1.4
    ak = 1.0e3 + (1.0 - bk) * x * 3.0e4
    return ak, bk


def _gcm_atmos(ak, bk, lats, lons):
    from regcm_tpu.utils import constants as c
    ps = 101325.0 * np.ones((len(lats), len(lons)))
    p3 = ak[:, None, None] + bk[:, None, None] * ps[None]
    t = np.maximum(288.0 * (p3 / 101325.0) ** 0.19, 210.0)
    es = 610.0 * np.exp(17.67 * (t - 273.15) / (t - 29.65))
    q = np.clip(0.6 * 0.622 * es / p3, 1e-7, 0.02)
    u = 10.0 * np.exp(-((lats[None, :, None] - 40.0) / 12.0) ** 2) \
        * (1.0 - bk[:, None, None] * 0.6) * np.ones_like(t)
    v = np.zeros_like(t)
    return ps, t, q, u, v


def _write_mpiesm_fixture(root, year=1990, month=6, nt=9):
    """MPI-ESM-MR 6hrLev monthly per-variable layout
    (mod_mpiesm_helper.F90:96-130): ap/b hybrid + aps + geosp in the
    ta file."""
    from regcm_tpu.io.ncio import NCWriter
    lats = np.arange(15.0, 66.0, 2.5)
    lons = np.arange(-15.0, 56.0, 2.5)
    nlev = 12
    ak, bk = _hybrid_profile(nlev)
    ps, t, q, u, v = _gcm_atmos(ak, bk, lats, lons)
    zs = 200.0 * np.exp(-((lats[:, None] - 45.0) / 8.0) ** 2) \
        * np.ones((len(lats), len(lons)))
    base = f"_6hrLev_MPI-ESM-MR_historical_r1i1p1_"
    y2, m2 = (year, month + 1) if month < 12 else (year + 1, 1)
    d1 = f"{year:04d}{month:02d}0100" + "00"
    d2 = f"{y2:04d}{m2:02d}0100" + "00"
    for var, fld in (("ta", t), ("hus", q), ("ua", u), ("va", v)):
        d = os.path.join(root, "MPI-ESM-MR", "RF", var)
        os.makedirs(d, exist_ok=True)
        w = NCWriter(os.path.join(d, f"{var}{base}{d1}-{d2}.nc"),
                     dims={"lev": nlev, "lat": len(lats),
                           "lon": len(lons)})
        w.def_static("lat", ("lat",), lats)
        w.def_static("lon", ("lon",), lons)
        w.def_static("ap", ("lev",), ak)
        w.def_static("b", ("lev",), bk)
        if var == "ta":
            w.def_static("geosp", ("lat", "lon"), zs * 9.80665)
            w.def_time_var("aps", ("lat", "lon"))
        w.def_time_var(var, ("lev", "lat", "lon"))
        for n in range(nt):
            rec = {var: fld}
            if var == "ta":
                rec["aps"] = ps
            w.write_record(6.0 * n, rec)
        w.close()


def test_mpiesm_icbc_pipeline(cfg, tmp_path):
    """MPI-ESM-MR archive → icbc → ICBC-driven model run."""
    import copy
    import jax.numpy as jnp
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.driver import Model
    from regcm_tpu.preproc.gcm import (GCMSource, gcm_fields,
                                       generate_gcm_icbc)
    from regcm_tpu.preproc.terrain import synthetic_topo
    cfg = copy.deepcopy(cfg)
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 18, 14
    cfg.geo.ds = 60.0
    cfg.geo.clat, cfg.geo.clon = 40.0, 15.0
    cfg.time.dt = 150.0
    cfg.restart.mdate0 = cfg.restart.mdate1 = 1990060100
    cfg.globdat.gdate1, cfg.globdat.gdate2 = 1990060100, 1990060200
    cfg.globdat.dattyp = "MP_RF"
    _write_mpiesm_fixture(str(tmp_path))
    grid = build_grid(cfg)
    src = GCMSource(str(tmp_path), "MP_RF")
    topo, _, _ = synthetic_topo(cfg)
    topo_gp = np.pad(topo, ((0, 1), (0, 1)), mode="edge") * 9.80665
    f = gcm_fields(cfg, grid, topo_gp, src, Date(1990, 6, 1))
    assert np.isfinite(f["t"]).all() and np.isfinite(f["ps"]).all()
    assert 200.0 < f["t"].min() and f["t"].max() < 320.0
    assert 60000.0 < f["ps"].min() and f["ps"].max() < 106000.0
    assert f["u"].max() > 3.0
    path = str(tmp_path / "mpiesm_icbc.nc")
    generate_gcm_icbc(cfg, grid, topo_gp, str(tmp_path), path,
                      "MP_RF")
    from regcm_tpu.preproc.icbc import ICBCReader
    m = Model(cfg, grid=grid, dtype=jnp.float64, physics=False)
    m.init_from_icbc(ICBCReader(path, cfg.globdat.calendar))
    m.run_icbc(3)


def _write_hadgem_fixture(root):
    """HadGEM2-ES 6hrLev layout (mod_hadgem_helper.F90): quarterly
    atmospheric files from Jun 1 06, Dec->Dec yearly ps file, 360-day
    calendar; 'orog' rides the ta file; lev/b used as ak+bk*ps."""
    from regcm_tpu.io.ncio import NCWriter
    lats = np.arange(15.0, 66.0, 2.5)
    lons = np.arange(-15.0, 56.0, 2.5)
    nlev = 10
    ak, bk = _hybrid_profile(nlev)
    ps, t, q, u, v = _gcm_atmos(ak, bk, lats, lons)
    zs = 150.0 * np.exp(-((lats[:, None] - 45.0) / 9.0) ** 2) \
        * np.ones((len(lats), len(lons)))
    base = "_6hrLev_HadGEM2-ES_historical_r1i1p1_"
    # atmospheric quarter Jun 1 06 -> Sep 1 00; write 8 records
    for var, fld in (("ta", t), ("hus", q), ("ua", u), ("va", v)):
        d = os.path.join(root, "HadGEM2-ES", "RF", var)
        os.makedirs(d, exist_ok=True)
        w = NCWriter(os.path.join(
            d, f"{var}{base}1990060106-1990090100.nc"),
            dims={"lev": nlev, "lat": len(lats), "lon": len(lons)})
        w.def_static("lat", ("lat",), lats)
        w.def_static("lon", ("lon",), lons)
        w.def_static("lev", ("lev",), ak)
        w.def_static("b", ("lev",), bk)
        if var == "ta":
            w.def_static("orog", ("lat", "lon"), zs)
        w.def_time_var(var, ("lev", "lat", "lon"))
        for n in range(8):
            w.write_record(6.0 * n, {var: fld})
        w.close()
    # ps: Dec 2 1989 06 -> Dec 2 1990 00 (360-day arithmetic)
    d = os.path.join(root, "HadGEM2-ES", "RF", "ps")
    os.makedirs(d, exist_ok=True)
    start = Date(1989, 12, 2, 6, calendar="360_day")
    tgt = Date(1990, 6, 1, 6, calendar="360_day")
    hh0 = (tgt - start) / 3600.0
    w = NCWriter(os.path.join(
        d, f"ps{base}1989120206-1990120200.nc"),
        dims={"lat": len(lats), "lon": len(lons)})
    w.def_static("lat", ("lat",), lats)
    w.def_static("lon", ("lon",), lons)
    w.def_time_var("ps", ("lat", "lon"))
    # first record at file start (offset 0) then records around the
    # target date so nearest-offset resolution lands exactly
    for off in [0.0, hh0, hh0 + 6.0, hh0 + 12.0, hh0 + 18.0]:
        w.write_record(off, {"ps": ps})
    w.close()


def test_hadgem_icbc_fields(cfg, tmp_path):
    """HadGEM2-ES archive → gcm_fields on the 360-day calendar."""
    import copy
    from regcm_tpu.core.grid import build_grid
    from regcm_tpu.preproc.gcm import GCMSource, gcm_fields
    from regcm_tpu.preproc.terrain import synthetic_topo
    cfg = copy.deepcopy(cfg)
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 18, 14
    cfg.geo.ds = 60.0
    cfg.geo.clat, cfg.geo.clon = 40.0, 15.0
    cfg.globdat.calendar = "360_day"
    _write_hadgem_fixture(str(tmp_path))
    grid = build_grid(cfg)
    src = GCMSource(str(tmp_path), "HA_RF")
    topo, _, _ = synthetic_topo(cfg)
    topo_gp = np.pad(topo, ((0, 1), (0, 1)), mode="edge") * 9.80665
    f = gcm_fields(cfg, grid, topo_gp, src,
                   Date(1990, 6, 1, 6, calendar="360_day"))
    assert np.isfinite(f["t"]).all() and np.isfinite(f["ps"]).all()
    assert 200.0 < f["t"].min() and f["t"].max() < 320.0
    assert 60000.0 < f["ps"].min() and f["ps"].max() < 106000.0
    assert f["u"].max() > 3.0
    assert f["qv"].max() > 1e-3


def test_gcm_unknown_dattyp_refused():
    from regcm_tpu.preproc.gcm import GCMSource
    import pytest as _pt
    with _pt.raises(ValueError, match="not ported"):
        GCMSource("/tmp", "CA_RF")


def test_clmbc_forcing_generator(tmp_path):
    """clmbc equivalent (PreProc/ICBC/clmbc.F90): hourly CLM forcing
    records (pr/ssr/strd/clt + statics) over the namelist window; the
    synthetic fallback's solar forcing must follow the diurnal cycle."""
    import copy
    from regcm_tpu.config.params import RegCMConfig
    from regcm_tpu.preproc.clmbc import generate_clmbc
    from regcm_tpu.io.ncio import read_nc
    cfg = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    cfg = copy.deepcopy(cfg)
    cfg.dim.iy, cfg.dim.jx = 12, 16
    cfg.globdat.gdate1, cfg.globdat.gdate2 = 1990060100, 1990060123
    out = generate_clmbc(cfg, str(tmp_path / "clmbc.nc"))
    d = read_nc(out)
    assert d["pr"].shape == (24, 12, 16)
    for v in ("pr", "ssr", "strd", "clt", "xlat", "topo", "mask"):
        assert np.isfinite(d[v]).all(), v
    assert d["pr"].min() >= 0.0
    # diurnal solar cycle: ssr peaks in local day, zero at local night
    ssr = d["ssr"]
    assert ssr.max() > 300.0
    assert ssr.min() == 0.0
    # longwave magnitude physical
    assert 100.0 < d["strd"].mean() < 500.0
    assert 0.0 <= d["clt"].min() and d["clt"].max() <= 1.0
