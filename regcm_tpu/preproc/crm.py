"""CRM idealized initial/boundary conditions (the ``PreProc/CRM``
Python generators: ``initialize_domain.py``, ``initialize_icbc.py``,
``toga_icbcs.py``).

For doubly-periodic CRM runs (i_crm=1) the "boundary" file only seeds
the initial state: a horizontally-uniform tropical sounding (an
analytic TOGA-COARE-like temperature/humidity profile standing in for
the reference's tabulated IFA v2.1 sounding) plus optional white-noise
boundary-layer perturbations to break symmetry, written in the same
ICBC schema the model ingests."""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..config.params import RegCMConfig
from ..utils import constants as c
from ..utils.calendar import Date
from ..utils.vertical import sigma_levels
from .icbc import ICBCWriter


def toga_sounding(p_pa: np.ndarray):
    """Analytic fit to the TOGA-COARE IFA mean sounding: warm moist
    tropical troposphere (SST ~302.5 K, ~80%% boundary-layer RH,
    moist-adiabat-like lapse, 100 hPa cold-point tropopause)."""
    p = np.asarray(p_pa)
    t_sfc = 300.5
    # temperature: moist-pseudoadiabat-ish power law to the tropopause
    t = t_sfc * (p / 101325.0) ** 0.155
    t = np.maximum(t, 195.0)
    # relative humidity profile: 80% at the surface → 30% at 300 hPa
    rh = np.clip(0.80 - 0.5 * (101325.0 - p) / 71325.0, 0.15, 0.85)
    from ..utils.thermo import pfwsat
    import jax.numpy as jnp
    qv = rh * np.asarray(pfwsat(jnp.asarray(t), jnp.asarray(p)))
    return t, np.minimum(qv, 0.022)


def crm_fields(cfg: RegCMConfig, seed: int = 0,
               perturb: float = 0.1) -> Dict[str, np.ndarray]:
    """Uniform-sounding CRM state on the model grid with boundary-layer
    noise (initialize_icbc + toga_icbcs)."""
    iy, jx, kz = cfg.dim.iy, cfg.dim.jx, cfg.dim.kz
    _, sh, _ = sigma_levels(kz, cfg.dim.dsmax, cfg.dim.dsmin)
    ptop = cfg.ptop_cb * 1000.0
    ps0 = 101325.0
    p = sh * (ps0 - ptop) + ptop
    t1, qv1 = toga_sounding(p)
    ones = np.ones((kz, iy, jx))
    t = t1[:, None, None] * ones
    qv = qv1[:, None, None] * ones
    if perturb > 0.0:
        rng = np.random.default_rng(seed)
        blz = sh > 0.8
        t = t + perturb * rng.standard_normal(t.shape) \
            * blz[:, None, None]
    ps = np.full((iy, jx), ps0)
    ts = np.full((iy, jx), 302.5)        # TOGA-COARE warm pool SST
    return dict(u=np.zeros_like(t), v=np.zeros_like(t), t=t, qv=qv,
                ps=ps, ts=ts)


def generate_crm_icbc(cfg: RegCMConfig, path: str, seed: int = 0,
                      perturb: float = 0.1) -> str:
    """Write the CRM ICBC series (constant in time — the doubly
    periodic run has no lateral forcing)."""
    w = ICBCWriter(path, cfg)
    f = crm_fields(cfg, seed=seed, perturb=perturb)
    d = Date.from_int(cfg.globdat.gdate1, cfg.globdat.calendar)
    d1 = Date.from_int(cfg.globdat.gdate2, cfg.globdat.calendar)
    while d <= d1:
        w.append(d, f)
        d = d.add_hours(cfg.globdat.ibdyfrq)
    w.close()
    return path
