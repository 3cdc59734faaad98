"""CCM3 radiation driver — the ``colmod3``/``radctl`` equivalent.

Builds the column inputs from the physics slice (cloud particle sizes
``cldefr``, emissivity/effective cloud, ozone profile, trace-gas mixing
ratios), runs the SW delta-Eddington and LW absorptivity/emissivity
solvers, and returns MKS heating rates and surface/TOA fluxes.

References: ``Main/radlib/mod_rad_colmod3.F90:207-795`` (input prep,
rel/rei/fice, cloud emissivity), ``mod_rad_radiation.F90:879-1089``
(radctl), ``mod_rad_o3blk.F90:108-138`` (o3data profile).

Design notes (TPU): one dense batch over all columns; the absorptivity
tensors are recomputed at every radiation call (the reference caches
them on the slower ``dtabem`` alarm — here the full calc is cheap
enough on the MXU and keeps the step stateless).  For very large grids
the column batch can be chunked by the caller.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import tables as tb
from .sw import radcsw
from . import lw as lwmod

KABSL = 0.090361           # longwave liquid absorption coeff (m²/g)
REIMAX = 30.0
RIRNGE = 20.0
PIRNGE = 0.4
PICEMN = 0.4
MINUS10 = 263.15
MINUS30 = 243.15
CFTOTMAX = 1.0


class RadResult(NamedTuple):
    heatrt: jax.Array     # qrs+qrl (K/s), (kz, iy, jx)
    swabs_sfc: jax.Array  # fsns (W/m²)
    lwnet_sfc: jax.Array  # flwds - lw up? net downward LW = flwds - eps*sig*T^4 handled by caller; here flwds
    flwds: jax.Array      # surface downward LW (W/m²)
    flns: jax.Array       # surface net upward LW (W/m²)
    fsds: jax.Array       # surface downward SW (W/m²)
    solin: jax.Array      # TOA incident (W/m²)
    fsnt: jax.Array       # TOA net SW absorbed (W/m²)
    flnt: jax.Array       # TOA net LW outgoing (W/m²)
    fsntc: jax.Array
    flntc: jax.Array
    sols: jax.Array
    soll: jax.Array
    solsd: jax.Array
    solld: jax.Array
    totcf: jax.Array      # total cloud fraction (max-random)


def o3prof_interfaces(ps_pa, pf_pa):
    """Ozone vmr on model interfaces from the annual climatology
    (o3data → intlinprof; mod_rad_o3blk.F90:108-138): linear-in-p
    interpolation with end clamping."""
    o3ann, pp = tb.o3_annual_profile()       # (31,), Pa increasing? pp decreasing in table
    # table is ordered surface→top (955→0.6 hPa): make ascending
    o3r = jnp.asarray(o3ann[::-1].copy(), pf_pa.dtype)
    ppr = jnp.asarray(pp[::-1].copy(), pf_pa.dtype)
    def interp(p):
        i = jnp.clip(jnp.searchsorted(ppr, p) - 1, 0, 29)
        w = jnp.clip((p - ppr[i]) / (ppr[i + 1] - ppr[i]), 0.0, 1.0)
        return o3r[i] + w * (o3r[i + 1] - o3r[i])
    return interp(pf_pa)


def ccm3_radiation(tb3, qvb3, qcb3, qib3, pb3, pf3, rhb3, dzq,
                   cldfrc, cldlwc, coszrs, tg, lndocn, xlat,
                   aldirs, aldifs, aldirl, aldifl, albvs, albvl,
                   emiss, ghg, eccf=1.0, solcon=1367.0,
                   five_species=False, col_chunk=16384,
                   cache=None, want_cache=False,
                   aermmr=None, aertab=None):
    """Full CCM3 column radiation on a (kz, iy, jx) grid slice.

    cldlwc in g/m³ (in-cloud), dzq layer thickness (m), pb3/pf3 Pa,
    ghg: dict from tables.ghg_mmr. Returns ``(RadResult, cache_out)``
    in MKS with 3-D fields shaped like the model grid.

    col_chunk: when the grid has more columns than this, the batch is
    processed in lax.map chunks so the (ncol, kz+1, kz+1) absorptivity
    temporaries stay bounded in HBM (the reference bounds the same
    arrays by its per-rank patch size).

    cache/want_cache implement the reference's ``getabetot`` dtabem
    amortization (Main/mod_rad_interface.F90:62-65): when ``cache`` is
    given (dict abstot ((kz+1)², iy, jx), absnxt (4·kz, iy, jx),
    emstot (kz+1, iy, jx)) the expensive LW absorptivity/emissivity
    build (radems/radabs and the trace-gas path work) is skipped and
    the cached tensors feed radclw directly. ``want_cache=True``
    returns the freshly built tensors in that grid layout as
    ``cache_out`` (else None). The cache always holds the GAS-ONLY
    tensors; the aerosol modification below is applied per call.

    aermmr (ntr, kz, iy, jx) + aertab (chem.optics.AerosolOptics):
    aerosol direct effect (aeroppt external mixture into the SW
    delta-Eddington + the grey dust LW transmission applied to
    abstot/absnxt/emstot exactly as radclw does with aertrlw,
    mod_rad_radiation.F90:2007-2015).
    """
    kz, iy, jx = tb3.shape
    ncol = iy * jx
    if col_chunk and ncol > col_chunk:
        flat3 = lambda a: a.reshape(a.shape[0], ncol)
        flat2 = lambda a: a.reshape(ncol)
        nch = -(-ncol // col_chunk)
        pad = nch * col_chunk - ncol
        p3 = lambda a: jnp.pad(flat3(a), ((0, 0), (0, pad)),
                               mode="edge").T.reshape(
            nch, col_chunk, a.shape[0])
        p2 = lambda a: jnp.pad(flat2(a), (0, pad),
                               mode="edge").reshape(nch, col_chunk)
        args3 = [p3(a) for a in (tb3, qvb3, qcb3, qib3, pb3, pf3,
                                 rhb3, dzq, cldfrc, cldlwc)]
        args2 = [p2(a) for a in (coszrs, tg, lndocn, xlat, aldirs,
                                 aldifs, aldirl, aldifl, albvs, albvl,
                                 emiss)]
        ckeys = ("abstot", "absnxt", "emstot")
        argsc = tuple(p3(cache[k]) for k in ckeys) \
            if cache is not None else ()
        ntr_a = aermmr.shape[0] if aermmr is not None else 0
        argsa = (p3(aermmr.reshape(ntr_a * kz, iy, jx)),) \
            if aermmr is not None else ()

        def one(chunk_args):
            a3, a2, ac, aa = chunk_args
            # chunk columns → a (kzdim, chunk, 1) grid slice
            g3 = [x.T[:, :, None] for x in a3]
            g2 = [x[:, None] for x in a2]
            ch = dict(zip(ckeys, (x.T[:, :, None] for x in ac))) \
                if cache is not None else None
            am = aa[0].T.reshape(ntr_a, kz, col_chunk, 1) \
                if aermmr is not None else None
            return ccm3_radiation(*g3, *g2, ghg, eccf=eccf,
                                  solcon=solcon,
                                  five_species=five_species,
                                  col_chunk=0, cache=ch,
                                  want_cache=want_cache,
                                  aermmr=am, aertab=aertab)

        res, cch = jax.lax.map(one, (tuple(args3), tuple(args2),
                                     argsc, argsa))
        def un3(a):      # (nch, kzd, chunk, 1) → (kzd, iy, jx)
            kzd = a.shape[1]
            flat = jnp.moveaxis(a[..., 0], 1, 2).reshape(
                nch * col_chunk, kzd)[:ncol]
            return flat.T.reshape(kzd, iy, jx)
        un2 = lambda a: a.reshape(nch * col_chunk)[:ncol].reshape(
            iy, jx)
        out = RadResult(*(un3(f) if f.ndim == 4 else un2(f)
                          for f in res))
        cout = None if cch is None \
            else {k: un3(v) for k, v in cch.items()}
        return out, cout
    col = lambda a: a.reshape(kz, ncol).T          # (ncol, kz) top-down
    coli = lambda a: a.reshape(kz + 1, ncol).T
    c2 = lambda a: a.reshape(ncol)

    t = col(tb3)
    q = jnp.maximum(col(qvb3), 1.0e-9)
    ql = col(qcb3)
    qi = col(qib3) if five_species else jnp.zeros_like(ql)
    pmid = col(pb3) * 10.0                         # dynes/cm²
    pint = coli(pf3) * 10.0
    pmln = jnp.log(pmid)
    piln = jnp.log(pint)
    dz = col(dzq)
    ps = pint[:, -1]

    # cloud fraction with maximum-random overlap of adjacent layers
    # (colmod3 :528-551), masked outside [kmaxcld, kz-ncld]
    cfrc = col(cldfrc)
    clwp = col(cldlwc) * col(dzq)                  # g/m²
    kmaxcld = 2                                    # 0-based: Fortran 3
    kmincld = kz - 1 - 1                           # Fortran kz - ncld
    karr = jnp.arange(kz)[None, :]
    inwin = (karr >= kmaxcld) & (karr <= kmincld)
    clwp = jnp.where(inwin, clwp, 0.0)
    cfrc_km1 = jnp.concatenate([cfrc[:, :1], cfrc[:, :-1]], axis=1)
    cld = jnp.where((clwp > 0.0) & inwin,
                    jnp.minimum(cfrc_km1 + cfrc - cfrc_km1 * cfrc,
                                CFTOTMAX), 0.0)

    # cloud drop sizes (colmod3 :600-640)
    land = c2(lndocn) > 0.5
    rel = jnp.where(land[:, None], 8.5, 11.0) * jnp.ones_like(t)
    pnrml = pmid / ps[:, None]
    weight = jnp.clip((pnrml - PICEMN) / PIRNGE, 0.0, 1.0)
    rei = REIMAX - RIRNGE * weight
    if five_species:
        fice = jnp.where(qi > 1.0e-11, qi / (ql + qi), 0.0)
    else:
        fice = jnp.clip((MINUS10 - t) / 20.0, 0.0, 1.0)
    # cloud emissivity → effective cloud (colmod3 :700-712)
    kabsi = 0.005 + 1.0 / rei
    kabs = KABSL * (1.0 - fice) + kabsi * fice
    emis = 1.0 - jnp.exp(-jnp.minimum(1.66 * kabs * clwp, 25.0))
    effcld_lay = cld * emis

    # ozone profile on interfaces → layer vmr (colmod3 :569-576)
    o3_int = o3prof_interfaces(ps, coli(pf3))
    o3vmr = 0.5 * (o3_int[:, 1:] + o3_int[:, :-1])
    o3mmr = (tb.AMO3 / tb.AMD) * o3vmr

    # radinp (mod_rad_radiation.F90:4093-4184): CO2/H2O paths, tclrsf
    # cld with the reference's 1-offset kzp1 slot layout
    cldp = jnp.concatenate([cld, jnp.zeros((ncol, 1), t.dtype)],
                           axis=1)
    plh2o0 = tb.RGSSLP * q[:, :1] * pint[:, :1] ** 2
    plh2o = jnp.concatenate(
        [plh2o0,
         plh2o0 + lwmod.cumsum_mm(tb.RGSSLP * (pint[:, 1:] ** 2
                                          - pint[:, :-1] ** 2) * q,
                             axis=1)], axis=1)
    cpwpl = (tb.AMCO2 / tb.AMD) * 0.5 / (tb.EGRAVGTS * tb.SSLP)
    plco2 = ghg["co2vmr"] * cpwpl * pint ** 2

    # ---- aerosol optical properties (aeroppt) --------------------------
    aer_sw = None
    aer_ucum = None
    if aermmr is not None and aertab is not None:
        from ....chem.optics import (sw_aerosol_mixture, lw_dust_path)
        amc = jnp.moveaxis(
            jnp.maximum(aermmr, 0.0).reshape(aermmr.shape[0], kz, ncol),
            2, 1)                                   # (ntr, ncol, kz)
        pint_pa = coli(pf3)
        aer_sw = sw_aerosol_mixture(amc, pint_pa, aertab)
        aer_ucum = lw_dust_path(amc, pint_pa, aertab.lw_mask)

    # ---- shortwave -----------------------------------------------------
    czen = jnp.where(c2(coszrs) < 1.0e-3, 0.0, c2(coszrs))
    sw = radcsw(pint, q, o3mmr, cld, clwp, rel, rei, fice,
                eccf, czen, c2(aldirs), c2(aldifs), c2(aldirl),
                c2(aldifl), c2(albvs), c2(albvl),
                ghg["co2mmr"], solcon * 1000.0, aer=aer_sw)

    # ---- longwave ------------------------------------------------------
    tp = lwmod.radtpl(c2(tg), t, pmln, q, piln, pint, plh2o)
    if cache is None:
        plos, plol = lwmod.radoz2(o3vmr, pint)
        xptrop = (25000.0 - 15000.0
                  * jnp.cos(c2(xlat) * np.pi / 180.0) ** 2) * 10.0  # cgs
        n2o, ch4, cfc11, cfc12 = lwmod.trcmix(
            c2(xlat), xptrop, pmid,
            dict(ch40=ghg["ch40"], n2o0=ghg["n2o0"],
                 cfc110=ghg["cfc110"], cfc120=ghg["cfc120"]))
        paths = lwmod.trcpth(t, pint, cfc11, cfc12, n2o, ch4, q,
                             ghg["co2mmr"])
        emplnk, abplnk1, abplnk2 = lwmod.trcplk(tp["tint"], tp["tlayr"],
                                                tp["tplnke"])
        em = lwmod.radems(pint, tp, plh2o, plco2, plos, plol, paths,
                          emplnk, ghg["co2vmr"])
        abstot, absnxt = lwmod.radabs(pint, pmid, piln, pmln, tp, em,
                                      plh2o, plco2, plos, plol, paths,
                                      abplnk1, abplnk2, ghg["co2vmr"])
        emsgastot = em["emsgastot"]
    else:
        # dtabem-cached tensors (grid layout → column layout)
        abstot = cache["abstot"].reshape(
            (kz + 1) * (kz + 1), ncol).T.reshape(ncol, kz + 1, kz + 1)
        absnxt = cache["absnxt"].reshape(
            kz * 4, ncol).T.reshape(ncol, kz, 4)
        emsgastot = cache["emstot"].reshape(kz + 1, ncol).T
    cache_out = None
    if want_cache:
        # the cache always stores the gas-only tensors (getabetot)
        cache_out = dict(
            abstot=abstot.reshape(ncol, -1).T.reshape(-1, iy, jx),
            absnxt=absnxt.reshape(ncol, -1).T.reshape(-1, iy, jx),
            emstot=emsgastot.T.reshape(kz + 1, iy, jx))
    if aer_ucum is not None:
        # grey dust LW (aertrlw application, radclw :2007-2015)
        from ....chem.optics import QABSLW_DUST, FIVEOTHREE
        trkk = jnp.exp(-FIVEOTHREE * QABSLW_DUST
                       * jnp.abs(aer_ucum[:, None, :]
                                 - aer_ucum[:, :, None]))
        abstot = 1.0 - (1.0 - abstot) * trkk
        emsgastot = 1.0 - (1.0 - emsgastot) * trkk[:, :, 0]
        trlay = jnp.exp(-FIVEOTHREE * QABSLW_DUST
                        * (aer_ucum[:, 1:] - aer_ucum[:, :-1]))
        pi_a, pi_b = pint[:, :-1], pint[:, 1:]
        p1 = 0.5 * (pmid + pi_b)
        p2 = 0.5 * (pmid + pi_a)
        rdpnmsq = 1.0 / (pi_b ** 2 - pi_a ** 2)
        uinpl = jnp.stack([(pi_b ** 2 - p1 ** 2) * rdpnmsq,
                           -(pi_a ** 2 - p2 ** 2) * rdpnmsq,
                           -(pi_a ** 2 - p1 ** 2) * rdpnmsq,
                           (pi_b ** 2 - p2 ** 2) * rdpnmsq], axis=2)
        absnxt = 1.0 - (1.0 - absnxt) * trlay[:, :, None] ** uinpl
    effcldp = jnp.concatenate(
        [effcld_lay, jnp.zeros((ncol, 1), t.dtype)], axis=1)
    lwr = lwmod.radclw(c2(tg), c2(emiss), effcldp, tp,
                       emsgastot, abstot, absnxt, pint)

    # total cloud fraction (radctl :980-995, max-random overlap)
    pair_max = jnp.maximum(cldp[:, :-1], cldp[:, 1:])
    totcf = 1.0 - jnp.prod(
        (1.0 - pair_max) / jnp.maximum(1.0 - cldp[:, :-1], 1e-10),
        axis=1)

    heatrt = sw.qrs + lwr.qrl                      # already K/s
    un = lambda a: a.T.reshape(kz, iy, jx)
    u2 = lambda a: (a * 1.0e-3).reshape(iy, jx)    # cgs → W/m²
    res = RadResult(
        heatrt=un(heatrt),
        swabs_sfc=u2(sw.fsns),
        # net downward LW at the surface = down − up = −flns
        lwnet_sfc=-u2(lwr.flns),
        flwds=u2(lwr.flwds), flns=u2(lwr.flns), fsds=u2(sw.fsds),
        solin=u2(sw.solin), fsnt=u2(sw.fsnt), flnt=u2(lwr.flnt),
        fsntc=u2(sw.fsntc), flntc=u2(lwr.flntc),
        sols=sw.sols.reshape(iy, jx), soll=sw.soll.reshape(iy, jx),
        solsd=sw.solsd.reshape(iy, jx),
        solld=sw.solld.reshape(iy, jx),
        totcf=totcf.reshape(iy, jx))
    return res, cache_out
