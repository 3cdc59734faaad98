"""Windowed global terrain-tile reader + interpolators.

Re-implements the machinery of ``Share/mod_rdldtr.F90`` (read_ncglob:
windowed reads of global 30s/2min topography+landuse tile archives)
and ``Share/mod_intldtr.F90`` (``interp``: bilinear / bin-majority for
categorical landuse, ``filter1plakes``) for the terrain preprocessor.

Tile layout: a directory of NetCDF tiles named ``tile_<lat0>_<lon0>.nc``
each covering ``tilesize``° × ``tilesize``° at resolution ``res``
(degrees) with a data variable (z/landuse/…) — the same windowing
strategy as the reference's GTOPO/GMTED/GLCC archives (only tiles
overlapping the domain window are opened). A single global file with
(lat, lon) coordinates is also accepted.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

from ..io.ncio import read_nc


class GlobalField:
    """A (windowed) global regular lat-lon field."""

    def __init__(self, data: np.ndarray, lat0: float, lon0: float,
                 res: float):
        self.data = data
        self.lat0 = lat0          # latitude of row 0 (southmost)
        self.lon0 = lon0
        self.res = res

    def lats(self):
        return self.lat0 + np.arange(self.data.shape[0]) * self.res

    def lons(self):
        return self.lon0 + np.arange(self.data.shape[1]) * self.res


def read_tiled_window(dirpath: str, varname: str,
                      latmin: float, latmax: float,
                      lonmin: float, lonmax: float) -> GlobalField:
    """Assemble the sub-window [latmin,latmax]×[lonmin,lonmax] from a
    tile directory (read_ncglob windowing, Share/mod_rdldtr.F90).

    Only tiles intersecting the window are read."""
    tiles = []
    pat = re.compile(r"tile_(-?\d+(?:\.\d+)?)_(-?\d+(?:\.\d+)?)\.nc$")
    for path in sorted(glob.glob(os.path.join(dirpath, "tile_*.nc"))):
        m = pat.search(os.path.basename(path))
        if not m:
            continue
        tiles.append((float(m.group(1)), float(m.group(2)), path))
    if not tiles:
        # fallback: single global file
        cand = sorted(glob.glob(os.path.join(dirpath, "*.nc")))
        if not cand:
            raise FileNotFoundError(f"no terrain tiles in {dirpath}")
        data = read_nc(cand[0])
        lat = np.asarray(data["lat"])
        lon = np.asarray(data["lon"])
        v = np.asarray(data[varname], dtype=np.float64)
        res = float(lat[1] - lat[0])
        i0 = max(int((latmin - lat[0]) / res) - 1, 0)
        i1 = min(int((latmax - lat[0]) / res) + 2, len(lat))
        j0 = max(int((lonmin - lon[0]) / res) - 1, 0)
        j1 = min(int((lonmax - lon[0]) / res) + 2, len(lon))
        return GlobalField(v[i0:i1, j0:j1], float(lat[i0]),
                           float(lon[j0]), res)

    # probe one tile for its grid
    first = read_nc(tiles[0][2])
    v0 = np.asarray(first[varname])
    nrow, ncol = v0.shape
    lat_t = first.get("lat")
    res = float(np.asarray(lat_t)[1] - np.asarray(lat_t)[0]) \
        if lat_t is not None else None
    if res is None:
        raise ValueError("tiles must carry a lat coordinate")
    tile_dlat = nrow * res
    tile_dlon = ncol * res

    sel = [(la, lo, p) for (la, lo, p) in tiles
           if (la < latmax and la + tile_dlat > latmin
               and lo < lonmax and lo + tile_dlon > lonmin)]
    if not sel:
        raise ValueError("window does not intersect any tile")
    las = sorted({la for la, _, _ in sel})
    los = sorted({lo for _, lo, _ in sel})
    mosaic = np.full((len(las) * nrow, len(los) * ncol), np.nan)
    for la, lo, p in sel:
        d = read_nc(p)
        vi = np.asarray(d[varname], dtype=np.float64)
        r = las.index(la) * nrow
        cidx = los.index(lo) * ncol
        mosaic[r:r + nrow, cidx:cidx + ncol] = vi
    gf = GlobalField(mosaic, las[0], los[0], res)
    # crop to window
    lats = gf.lats()
    lons = gf.lons()
    i0 = max(int(np.searchsorted(lats, latmin)) - 1, 0)
    i1 = min(int(np.searchsorted(lats, latmax)) + 2, len(lats))
    j0 = max(int(np.searchsorted(lons, lonmin)) - 1, 0)
    j1 = min(int(np.searchsorted(lons, lonmax)) + 2, len(lons))
    return GlobalField(mosaic[i0:i1, j0:j1], float(lats[i0]),
                       float(lons[j0]), res)


def interp_bilinear(gf: GlobalField, xlat: np.ndarray,
                    xlon: np.ndarray) -> np.ndarray:
    """Continuous-field interpolation (mod_intldtr interp itype 1)."""
    fi = np.clip((np.asarray(xlat) - gf.lat0) / gf.res, 0.0,
                 gf.data.shape[0] - 1.001)
    fj = np.clip((np.asarray(xlon) - gf.lon0) / gf.res, 0.0,
                 gf.data.shape[1] - 1.001)
    i0 = np.floor(fi).astype(int)
    j0 = np.floor(fj).astype(int)
    wi = fi - i0
    wj = fj - j0
    d = gf.data
    out = ((1 - wi) * (1 - wj) * d[i0, j0]
           + (1 - wi) * wj * d[i0, j0 + 1]
           + wi * (1 - wj) * d[i0 + 1, j0]
           + wi * wj * d[i0 + 1, j0 + 1])
    return out


def interp_majority(gf: GlobalField, xlat: np.ndarray,
                    xlon: np.ndarray, ncat: int,
                    radius_cells: int = 1) -> np.ndarray:
    """Bin-majority interpolation for categorical landuse
    (mod_intldtr interp itype 4/5): the modal class over the source
    cells within the target cell's neighborhood."""
    xlat = np.asarray(xlat)
    xlon = np.asarray(xlon)
    fi = np.clip(np.round((xlat - gf.lat0) / gf.res).astype(int),
                 0, gf.data.shape[0] - 1)
    fj = np.clip(np.round((xlon - gf.lon0) / gf.res).astype(int),
                 0, gf.data.shape[1] - 1)
    counts = np.zeros((ncat + 1,) + xlat.shape, dtype=np.int32)
    for di in range(-radius_cells, radius_cells + 1):
        for dj in range(-radius_cells, radius_cells + 1):
            ii = np.clip(fi + di, 0, gf.data.shape[0] - 1)
            jj = np.clip(fj + dj, 0, gf.data.shape[1] - 1)
            cat = np.clip(np.nan_to_num(gf.data[ii, jj]).astype(int),
                          0, ncat)
            np.put_along_axis(
                counts, cat[None], np.take_along_axis(
                    counts, cat[None], axis=0) + 1, axis=0)
    return counts.argmax(axis=0)


def filter1plakes(lnduse: np.ndarray, lake_cat: int = 14,
                  minlake: int = 2) -> np.ndarray:
    """Remove isolated single-point lakes (filter1plakes,
    Share/mod_intldtr.F90): a lake cell with fewer than `minlake` lake
    neighbors becomes the modal non-lake neighbor class."""
    out = np.asarray(lnduse).copy()
    iy, jx = out.shape
    lake = out == lake_cat
    nnb = np.zeros_like(out, dtype=int)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            sh = np.roll(np.roll(lake, di, axis=0), dj, axis=1)
            nnb += sh.astype(int)
    isolated = lake & (nnb < minlake)
    if not isolated.any():
        return out
    # replace with most common non-lake neighbor
    for i, j in zip(*np.where(isolated)):
        neigh = out[max(i - 1, 0):i + 2, max(j - 1, 0):j + 2].ravel()
        neigh = neigh[neigh != lake_cat]
        if neigh.size:
            vals, cnts = np.unique(neigh, return_counts=True)
            out[i, j] = vals[np.argmax(cnts)]
    return out


def write_tile_fixture(dirpath: str, varname: str, fn,
                       lat0: float, lon0: float, ntile: int = 2,
                       tilesize: float = 10.0, res: float = 0.1):
    """Write a small synthetic tile archive for tests: fn(lat, lon)
    evaluated on each tile grid."""
    from ..io.ncio import NCWriter
    os.makedirs(dirpath, exist_ok=True)
    n = int(round(tilesize / res))
    for it in range(ntile):
        for jt in range(ntile):
            la0 = lat0 + it * tilesize
            lo0 = lon0 + jt * tilesize
            la = la0 + np.arange(n) * res
            lo = lo0 + np.arange(n) * res
            vals = fn(la[:, None], lo[None, :])
            path = os.path.join(dirpath, f"tile_{la0:g}_{lo0:g}.nc")
            w = NCWriter(path, dims={"lat": n, "lon": n})
            w.def_static("lat", ("lat",), la, "degrees_north")
            w.def_static("lon", ("lon",), lo, "degrees_east")
            w.def_static(varname, ("lat", "lon"), vals)
            w.close()
