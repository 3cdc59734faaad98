"""nnsg subgrid surface tests (nsg>1): per-subcell BATS batching +
flux averaging (mod_lm_interface rdnnsg) + the SUB output stream."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from regcm_tpu.config.params import RegCMConfig
from regcm_tpu.core.grid import build_grid
from regcm_tpu.driver import Model
from regcm_tpu.io.ncio import read_nc

NML = "/root/reference/Testing/test_001.in"
needs_ref = pytest.mark.skipif(not os.path.exists(NML),
                               reason="reference Testing corpus absent")


def _sub_model(tmp_path):
    cfg = RegCMConfig.from_file(NML)
    cfg.dim.iy, cfg.dim.jx, cfg.dim.kz = 14, 18, 14
    cfg.dim.nsg = 2                 # nnsg = 4 subcells per cell
    grid = build_grid(cfg)
    # heterogeneous subgrid landuse: forest / short grass / desert /
    # (coarse class) per subcell over land
    lveg = np.asarray(grid.extras.get(
        "lveg", np.where(np.asarray(grid.lndocn) > 0.5, 2, 15)))
    lvs = np.stack([np.where(lveg != 15, 5, 15),     # deciduous forest
                    np.where(lveg != 15, 2, 15),     # short grass
                    np.where(lveg != 15, 8, 15),     # desert
                    lveg])
    grid.extras["lveg_sub"] = lvs
    return Model(cfg, grid=grid, dtype=jnp.float64)


@needs_ref
def test_subgrid_state_and_fluxes(tmp_path):
    m = _sub_model(tmp_path)
    assert m.core.physics.nnsg == 4
    assert m.state.bats.shape[:2] == (10, 4)
    for _ in range(6):
        m.step()
    assert m.check_finite()
    b = np.asarray(m.state.bats)
    land = np.asarray(m.core.physics.lnd_sub) > 0.5
    land_all = land.all(axis=0)
    # heterogeneous landuse must produce per-subcell divergence of the
    # surface state (different roughness/veg cover → different tgbrd)
    tg_sub = b[0]
    spread = tg_sub.max(axis=0) - tg_sub.min(axis=0)
    assert float(spread[land_all].max()) > 1.0e-4, \
        "subcells evolved identically despite different landuse"
    # coarse fluxes finite and bounded
    assert float(np.abs(np.asarray(m.state.hfx)).max()) < 1000.0


@needs_ref
def test_subgrid_sub_stream(tmp_path):
    m = _sub_model(tmp_path)
    m.open_output(str(tmp_path))
    m.run_with_output(3)
    m.streams.close()
    files = sorted(os.listdir(tmp_path))
    subf = [f for f in files if "SUB" in f]
    assert subf, f"no SUB file written: {files}"
    d = read_nc(str(tmp_path / subf[0]))
    assert d["tg_sub"].shape[1] == 4          # nnsg axis
    assert np.isfinite(d["tg_sub"]).all()


@needs_ref
def test_subgrid_refusals():
    cfg = RegCMConfig.from_file(NML)
    cfg.dim.nsg = 2
    cfg.core.idynamic = 3
    with pytest.raises(ValueError, match="nsg"):
        Model(cfg, dtype=jnp.float64)
