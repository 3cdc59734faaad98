"""Dense-grid dispatch glue for the TKE PBL schemes (UW TCM / MYJ).

Maps the PhysicsSuite slice dict onto the column-scheme inputs, the way
``mod_pbl_interface.F90:100-185`` stages ``mod_2_pbl`` for the reference
schemes. Kept separate from suite.py to keep the orchestration readable.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import constants as c


def _ptrop_index(pb3, xlat):
    """Tropopause level index: largest k with p < ptrop(lat)
    (mod_slice.F90:330-340; ptrop map from mod_init.F90:936)."""
    ptrop = 250.0e2 - 150.0e2 * jnp.cos(xlat * (np.pi / 180.0)) ** 2
    cnt = jnp.sum((pb3 < ptrop[None]).astype(jnp.int32), axis=0)
    return jnp.maximum(cnt - 1, 1)


def run_uwtcm(suite, core, atms, s, dt):
    from .pbl.uwtcm import uwtcm, UWParams
    kz = core.kz
    ex = suite.cfg.physics.extras
    p = UWParams(atwo=float(ex.get("atwo", 15.0)),
                 rstbl=float(ex.get("rstbl", 1.5)),
                 czero=float(ex.get("czero", 5.869)),
                 nuk=float(ex.get("nuk", 5.0)))
    qib3 = atms["qhb3"][2] if core.nqx == 5 \
        else jnp.zeros_like(atms["qcb3"])
    ktr = _ptrop_index(atms["pb3"], suite.xlat)
    out = uwtcm(
        atms["tb3"], atms["qvb3"], atms["qcb3"], qib3,
        atms["ubx3"], atms["vbx3"], atms["za"], atms["zq"],
        atms["dzq"], atms["pb3"], atms["pf3"], s.tke_b,
        s.heatrt, s.tg, atms["qvb3"][kz - 1], s.qfx, s.hfx,
        s.uvdrag, core.grid_lndocn, ktr, dt, p=p,
        diffuse_ice=(core.nqx == 5))
    return dict(tten=out.tten, qvten=out.qvten, qcten=out.qcten,
                qiten=out.qiten, uten=out.uten, vten=out.vten,
                tketen=out.tketen)


def run_myj(suite, core, atms, s, flags, dt):
    from .pbl.myj import myjpbl
    kz = core.kz
    qib3 = atms["qhb3"][2] if core.nqx == 5 \
        else jnp.zeros_like(atms["qcb3"])
    out = myjpbl(
        atms["tb3"], atms["qvb3"], atms["qcb3"], qib3,
        atms["ubx3"], atms["vbx3"], atms["zq"], core.ht,
        atms["pb3"], atms["pf3"], s.tke_a[:kz], s.tg,
        atms["qvb3"][kz - 1], s.uvdrag, core.grid_lndocn,
        s.pbl0[0], s.pbl0[1], dt,
        five_species=(core.nqx == 5), first=flags.first)
    tke_a = s.tke_a.at[:kz].set(out.tkepbl)
    pbl0 = jnp.stack([out.thz0, out.qz0])
    return dict(tten=out.tten, qvten=out.qvten, qcten=out.qcten,
                qiten=out.qiten, uten=out.uten, vten=out.vten,
                tke_a=tke_a, pbl0=pbl0)
