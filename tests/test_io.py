"""I/O tests: NetCDF output streams and bit-exact restart."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regcm_tpu.config.params import RegCMConfig
from regcm_tpu.core.grid import build_grid
from regcm_tpu.driver import Model, standard_atmosphere_state
from regcm_tpu.io.ncio import read_nc


@pytest.fixture(scope="module")
def cfg():
    c = RegCMConfig.from_file("/root/reference/Testing/test_001.in")
    c.dim.iy, c.dim.jx = 16, 24
    return c


def _model(cfg, tmpdir):
    grid = build_grid(cfg)
    s = standard_atmosphere_state(grid, cfg, perturb=0.3, seed=7)
    m = Model(cfg, grid=grid, initial_state=s)
    return m


def test_output_streams(cfg, tmp_path):
    m = _model(cfg, tmp_path)
    m.open_output(str(tmp_path))
    m.run_with_output(4)
    m.streams.close()
    files = sorted(os.listdir(tmp_path))
    assert any("ATM" in f for f in files)
    assert any("SRF" in f for f in files)
    assert any("RAD" in f for f in files)
    atm = read_nc(str(tmp_path / [f for f in files if "ATM" in f][0]))
    assert atm["ta"].shape[1:] == (cfg.dim.kz, cfg.dim.iy - 1,
                                   cfg.dim.jx - 1)
    assert atm["ta"].shape[0] >= 1
    assert 150.0 < np.nanmean(atm["ta"]) < 300.0
    assert 900.0 < np.nanmean(atm["ps"]) < 1100.0
    assert atm["xlat"].shape == (cfg.dim.iy - 1, cfg.dim.jx - 1)
    srf = read_nc(str(tmp_path / [f for f in files if "SRF" in f][0]))
    assert 200.0 < np.nanmean(srf["ts"]) < 320.0


def test_restart_bit_exact(cfg, tmp_path):
    """Restarted run reproduces the uninterrupted run bit-for-bit
    (contract of Main/mod_savefile.F90 + BuildBot monthly chains)."""
    sav = str(tmp_path / "test_SAV.nc")
    # run A: 8 steps straight
    ma = _model(cfg, tmp_path)
    bdy = ma.bdy
    for _ in range(4):
        ma.step()
    ma.save_restart(sav)
    for _ in range(4):
        ma.step()
    # run B: restart from step 4
    mb = _model(cfg, tmp_path)
    mb.bdy = bdy
    mb.load_restart(sav)
    assert mb.nstep == 4
    for _ in range(4):
        mb.step()
    for name in ma.state._fields:
        a = np.asarray(getattr(ma.state, name))
        b = np.asarray(getattr(mb.state, name))
        np.testing.assert_array_equal(a, b, err_msg=name)
    assert ma.date == mb.date
