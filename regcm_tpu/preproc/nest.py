"""Self-nesting: ICBC for a fine domain from coarse regcm_tpu output.

Re-implements ``PreProc/ICBC/mod_nest.F90`` (:823 ``get_nest``): the
coarse model's ATM stream (ua/va/ta/hus/ps on its sigma levels and
curvilinear projected grid) is interpolated to the fine grid —
horizontally with an inverse-distance weighted nearest-neighbour
interpolator (the reference's kd-tree ``h_interpolator``,
``Share/mod_kdinterp.F90``; here a scipy cKDTree over unit-sphere
chords), vertically sigma→sigma through pressure with the same
intlog/intlin rules as the dataset readers — and the fine surface
pressure is re-derived hydrostatically on the fine topography.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..config.params import RegCMConfig
from ..utils import constants as c
from ..utils.calendar import Date
from ..io.ncio import read_nc
from .era5 import _vertical_interp


def _sphere_xyz(lat, lon):
    la = np.deg2rad(np.asarray(lat, dtype=np.float64))
    lo = np.deg2rad(np.asarray(lon, dtype=np.float64))
    return np.stack([np.cos(la) * np.cos(lo),
                     np.cos(la) * np.sin(lo),
                     np.sin(la)], axis=-1)


class KDInterp:
    """Inverse-distance nearest-4 interpolation between curvilinear
    grids (h_interpolator_create/h_interpolate,
    Share/mod_kdinterp.F90)."""

    def __init__(self, src_lat, src_lon, dst_lat, dst_lon, k=4):
        from scipy.spatial import cKDTree
        pts = _sphere_xyz(src_lat, src_lon).reshape(-1, 3)
        self.tree = cKDTree(pts)
        q = _sphere_xyz(dst_lat, dst_lon).reshape(-1, 3)
        dist, self.idx = self.tree.query(q, k=k)
        w = 1.0 / np.maximum(dist, 1.0e-10) ** 2
        self.w = w / w.sum(axis=1, keepdims=True)
        self.dst_shape = np.asarray(dst_lat).shape

    def __call__(self, field):
        f = np.asarray(field, dtype=np.float64)
        lead = f.shape[:-2]
        flat = f.reshape(lead + (-1,))
        out = (flat[..., self.idx] * self.w).sum(axis=-1)
        return out.reshape(lead + self.dst_shape)


class NestSource:
    """Coarse-run ATM output stream as the nesting parent."""

    def __init__(self, atm_path: str, calendar: str = "gregorian"):
        self.d = read_nc(atm_path)
        self.calendar = calendar
        self.times = np.asarray(self.d["time"])    # hours since epoch
        self.sigma = np.asarray(self.d["sigma"])
        self.xlat = np.asarray(self.d["xlat"])
        self.xlon = np.asarray(self.d["xlon"])
        self.topo = np.asarray(self.d["topo"])     # m

    def record_at(self, date: Date):
        from ..io.output import _EPOCH
        h = (date - _EPOCH) / 3600.0
        i = int(np.argmin(np.abs(self.times - h)))
        g = lambda v: np.asarray(self.d[v][i], dtype=np.float64)
        return dict(u=g("ua"), v=g("va"), t=g("ta"), qv=g("hus"),
                    ps=g("ps") * 100.0)            # hPa → Pa


def nest_fields(cfg: RegCMConfig, grid, topo_fine: np.ndarray,
                src: NestSource, date: Date) -> Dict[str, np.ndarray]:
    """One fine-domain ICBC record from a coarse record
    (get_nest, PreProc/ICBC/mod_nest.F90:823)."""
    kz = cfg.dim.kz
    rec = src.record_at(date)
    hx = KDInterp(src.xlat, src.xlon, grid.xlat, grid.xlon)
    hd = KDInterp(src.xlat, src.xlon, grid.dlat, grid.dlon)

    tcf = hx(rec["t"])                   # (kzc, iyf, jxf) coarse sigma
    qcf = hx(rec["qv"])
    ucf = hd(rec["u"])
    vcf = hd(rec["v"])
    ps_c = hx(rec["ps"])                 # coarse ps on fine grid (Pa)
    zs_c = hx(src.topo)                  # coarse topo on fine grid (m)

    # fine surface pressure: hypsometric adjustment of the coarse ps
    # to the fine topography with the lowest-level temperature
    tlow = tcf[-1]
    ps = ps_c * np.exp(-c.egrav * (topo_fine - zs_c)
                       / (c.rgas * tlow))

    # source pressures: coarse sigma against the ADJUSTED fine ps
    # (mod_nest interpolates through pressure after the ps remap)
    from ..utils.vertical import sigma_levels
    ptop = cfg.ptop_cb * 1000.0
    kzc = tcf.shape[0]
    # coarse half-sigma from the parent stream
    shc = src.sigma
    pcoarse = shc[:, None, None] * (ps[None] - ptop) + ptop
    _, shf, _ = sigma_levels(kz, cfg.dim.dsmax, cfg.dim.dsmin)
    psig = shf[:, None, None] * (ps[None] - ptop) + ptop

    def vert(f, is_t):
        # per-column source pressures vary: do a column-wise interp in
        # log-p by looping over the small kz target (NumPy vector ops)
        lp = np.log(pcoarse)
        lq = np.log(psig)
        out = np.empty((kz,) + f.shape[1:])
        for k in range(kz):
            # bracketing indices per column
            idx = np.clip(np.sum(lp < lq[k][None], axis=0) - 1, 0,
                          kzc - 2)
            l0 = np.take_along_axis(lp, idx[None], axis=0)[0]
            l1 = np.take_along_axis(lp, idx[None] + 1, axis=0)[0]
            w = np.clip((lq[k] - l0) / np.maximum(l1 - l0, 1e-10),
                        0.0, 1.0)
            f0 = np.take_along_axis(f, idx[None], axis=0)[0]
            f1 = np.take_along_axis(f, idx[None] + 1, axis=0)[0]
            if not is_t:
                # intlin: weights in p rather than ln p
                p0 = np.exp(l0)
                p1 = np.exp(l1)
                w = np.clip((psig[k] - p0) / np.maximum(p1 - p0, 1.0),
                            0.0, 1.0)
            out[k] = (1.0 - w) * f0 + w * f1
        return out

    t = vert(tcf, True)
    qv = np.maximum(vert(qcf, False), c.minqq)
    u = vert(ucf, False)
    v = vert(vcf, False)
    return dict(u=u, v=v, t=t, qv=qv, ps=ps, ts=t[-1])


def generate_nest_icbc(cfg: RegCMConfig, grid, topo_fine: np.ndarray,
                       atm_path: str, path: str) -> str:
    """icbc main loop for dattyp='FNEST' (self-nesting)."""
    from .icbc import ICBCWriter
    src = NestSource(atm_path, cfg.globdat.calendar)
    w = ICBCWriter(path, cfg)
    d = Date.from_int(cfg.globdat.gdate1, cfg.globdat.calendar)
    d1 = Date.from_int(cfg.globdat.gdate2, cfg.globdat.calendar)
    while d <= d1:
        w.append(d, nest_fields(cfg, grid, topo_fine, src, d))
        d = d.add_hours(cfg.globdat.ibdyfrq)
    w.close()
    return path
