"""Slab (mixed-layer) ocean model (islab_ocean=1).

Jax port of ``Main/mod_slabocean.F90`` (``update_slabocean`` :95-163):
prognostic SST from the mixed-layer energy budget
``C_ml dSST/dt = FSW − FLW − H − L·E + Qflux``, with either an SST
restoring term toward the boundary-condition SST (``do_restore_sst``,
``qflux_sst = (SSTbc − SST)·C_ml/τ``) or a prescribed climatological
q-flux adjustment (``do_qflux_adj``). ``C_ml = mixed_layer_depth·4e6``
J/m²/K (:77). Dense masked update over ocean points (no gather).
"""
from __future__ import annotations

import jax.numpy as jnp

from ...utils import constants as c


def update_slabocean(sst, sstbc, ocmask, fsw, flw_up, hfx, qfx, dtocean,
                     mixed_layer_depth=50.0, do_restore_sst=True,
                     sst_restore_timescale=5.0, qflux_adj=0.0):
    """Advance the prognostic SST one surface step.

    sst: current prognostic SST (K); sstbc: boundary/forcing SST used by
    the restoring term (``xtsb%b1``); ocmask: ocean-point mask (bool);
    fsw: net surface SW (+down, W/m2); flw_up: net surface LW cooling
    (+up, W/m2, reference ``flw``); hfx/qfx: sensible flux (W/m2) and
    evaporation (kg/m2/s), + upward; dtocean: surface timestep (s).

    Returns (sst_new, qflux_sst) — the restoring flux is accumulated by
    the caller for the monthly q-flux diagnostic (fill_slaboc_outvars).
    """
    mlcp = mixed_layer_depth * 4.0e6
    if do_restore_sst:
        qflux_sst = (sstbc - sst) * mlcp / (sst_restore_timescale * 86400.0)
    else:
        qflux_sst = jnp.zeros_like(sst)
    hflx = fsw - flw_up - hfx - c.wlhv * qfx
    net_hflx = hflx + qflux_adj + qflux_sst
    sst_new = jnp.where(ocmask, sst + dtocean * net_hflx / mlcp, sst)
    return sst_new, jnp.where(ocmask, qflux_sst, 0.0)
