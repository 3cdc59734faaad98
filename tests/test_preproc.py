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
