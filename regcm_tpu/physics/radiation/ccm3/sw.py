"""CCM3 shortwave: 19-interval delta-Eddington solver.

Faithful jax re-derivation of ``radcsw`` / ``radded`` / ``radclr``
(``Main/radlib/mod_rad_radiation.F90:1155-2541``; Briegleb 1992).  All
arrays are (ncol, levels); the 19-interval spectral loop is unrolled at
trace time, the layer-adding recursions run as ``lax.scan`` over the
(small) vertical axis batched on all columns — the TPU-native layout
(columns dense on the vector units, k sequential).

Index conventions follow the reference: layer index 0 is the *extra*
layer above the model top (layers 0..kz), interface index 0 is the top
of the extra layer (interfaces 0..kz+1, kz+1 = surface).  Fluxes are in
cgs (erg/cm²/s) until the driver converts; pressures in dynes/cm².
Night columns are masked by ``czengt0`` exactly like the reference's
guarded loops.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import tables as tb


def _el(w, g):
    return jnp.sqrt(3.0 * (1.0 - w) * (1.0 - w * g))


def _delta_eddington(wtot, ftot, tautot, gtot, czen):
    """Scaled delta-Eddington layer solution (radded inner block,
    mod_rad_radiation.F90:2650-2700). Returns rdir, rdif, tdir, tdif,
    explay."""
    ts = (1.0 - wtot * ftot) * tautot
    ws = (1.0 - ftot) * wtot / (1.0 - wtot * ftot)
    gs = (gtot - ftot) / (1.0 - ftot)
    lm = _el(ws, gs)
    denom = 1.0 - (lm * lm) * (czen * czen)
    denom = jnp.where(jnp.abs(denom) < 1e-12,
                      jnp.sign(denom) * 1e-12 + 1e-30, denom)
    alp = 0.75 * ws * czen * (1.0 + gs * (1.0 - ws)) / denom
    gam = 0.5 * ws * (3.0 * gs * (1.0 - ws) * czen * czen + 1.0) / denom
    ue = 1.5 * (1.0 - ws * gs) / lm
    arg = jnp.minimum(lm * ts, tb.MXARG)
    extins = jnp.exp(-arg)
    ne = (ue + 1.0) ** 2 / extins - (ue - 1.0) ** 2 * extins
    rdif = (ue + 1.0) * (ue - 1.0) * (1.0 / extins - extins) / ne
    tdif = 4.0 * ue / ne
    arg = jnp.minimum(ts / czen, tb.MXARG)
    explay = jnp.exp(-arg)
    apg = alp + gam
    amg = alp - gam
    rdir = amg * (tdif * explay - 1.0) + apg * rdif
    tdir = apg * tdif + (amg * rdif - (apg - 1.0)) * explay
    return (jnp.maximum(rdir, 0.0), jnp.maximum(rdif, 0.0),
            jnp.maximum(tdir, 0.0), jnp.maximum(tdif, 0.0), explay)


def _add_down(rdir, rdif, tdir, tdif, explay):
    """Adding method downwards (radded :2705-2730 + :2825-2850):
    per-interface exptdn/tottrn/rdndif from layer properties 0..kz.
    Layer arrays (ncol, kz+1) → interface arrays (ncol, kz+2)."""
    ncol = rdir.shape[0]
    one = jnp.ones((ncol,), rdir.dtype)
    zero = jnp.zeros((ncol,), rdir.dtype)

    def body(carry, lay):
        exptdn_km1, tottrn_km1, rdndif_km1 = carry
        rdir_l, rdif_l, tdir_l, tdif_l, explay_l = lay
        exptdn_k = exptdn_km1 * explay_l
        exptdn_k = jnp.where(exptdn_k < 1e-20, 0.0, exptdn_k)
        rdenom = 1.0 / (1.0 - jnp.minimum(rdif_l * rdndif_km1,
                                          tb.VERYNEARONE))
        rdirexp = rdir_l * exptdn_km1
        tdnmexp = tottrn_km1 - exptdn_km1
        tottrn_k = exptdn_km1 * tdir_l + tdif_l \
            * (tdnmexp + rdndif_km1 * rdirexp) * rdenom
        rdndif_k = rdif_l + (rdndif_km1 * tdif_l) * (tdif_l * rdenom)
        new = (exptdn_k, tottrn_k, rdndif_k)
        return new, new

    lays = (rdir.T, rdif.T, tdir.T, tdif.T, explay.T)
    _, (e, t, r) = jax.lax.scan(body, (one, one, zero), lays)
    exptdn = jnp.concatenate([one[None], e], axis=0).T
    tottrn = jnp.concatenate([one[None], t], axis=0).T
    rdndif = jnp.concatenate([zero[None], r], axis=0).T
    return exptdn, tottrn, rdndif


def _add_up(rdir, rdif, tdir, tdif, explay, diralb, difalb):
    """Adding from the surface upwards (radcsw :1540-1560): rupdir,
    rupdif at interfaces 0..kz+1."""
    def body(carry, lay):
        rupdir_kp1, rupdif_kp1 = carry
        rdir_l, rdif_l, tdir_l, tdif_l, explay_l = lay
        rdenom = 1.0 / (1.0 - rdif_l * rupdif_kp1)
        rupdir_k = rdir_l + tdif_l * (rupdir_kp1 * explay_l
                                      + rupdif_kp1
                                      * (tdir_l - explay_l)) * rdenom
        rupdif_k = rdif_l + rupdif_kp1 * tdif_l ** 2 * rdenom
        new = (rupdir_k, rupdif_k)
        return new, new

    lays = tuple(a[:, ::-1].T for a in (rdir, rdif, tdir, tdif, explay))
    _, (rd, rf) = jax.lax.scan(body, (diralb, difalb), lays)
    rupdir = jnp.concatenate([rd[::-1], diralb[None]], axis=0).T
    rupdif = jnp.concatenate([rf[::-1], difalb[None]], axis=0).T
    return rupdir, rupdif


def _fluxes(exptdn, tottrn, rdndif, rupdir, rupdif):
    rdenom = 1.0 / (1.0 - rdndif * rupdif)
    fluxup = (exptdn * rupdir + (tottrn - exptdn) * rupdif) * rdenom
    fluxdn = exptdn + (tottrn - exptdn
                       + exptdn * rupdir * rdndif) * rdenom
    return fluxup, fluxdn


class SWResult(NamedTuple):
    qrs: jax.Array        # solar heating rate (K/s), (ncol, kz)
    fsns: jax.Array       # surface absorbed solar (cgs)
    fsnt: jax.Array       # top-of-model net absorbed
    fsntc: jax.Array      # clear-sky TOA net
    fsnsc: jax.Array      # clear-sky surface absorbed
    fsds: jax.Array       # surface downwelling
    solin: jax.Array      # solar incident
    solout: jax.Array     # reflected at TOA
    sols: jax.Array       # sfc direct  < 0.7 µm (MKS)
    soll: jax.Array       # sfc direct  > 0.7 µm (MKS)
    solsd: jax.Array      # sfc diffuse < 0.7 µm (MKS)
    solld: jax.Array      # sfc diffuse > 0.7 µm (MKS)
    abv: jax.Array        # vegetation-weighted sfc absorption (MKS)
    sol: jax.Array        # incident visible at sfc (MKS)


def radcsw(pint, h2ommr, o3mmr, cld, clwp, rel, rei, fice, eccf,
           czen, adirsw, adifsw, adirlw, adiflw, asw, alw,
           co2mmr, scon, aer=None):
    """Shortwave driver (radcsw, mod_rad_radiation.F90:1155-1821).

    pint: interface pressures (ncol, kz+1) in dynes/cm²; cld/clwp/...:
    (ncol, kz) layer fields (clwp g/m²); czen: cosine zenith.

    aer: optional aerosol external-mixture arrays
    (chem.optics.SWAerosol, each (ncol, kz+1, nspi) with the padded top
    layer) added to the delta-Eddington optical properties exactly like
    the reference's tauxar3d/tauasc3d/gtota3d/ftota3d terms
    (radcsw :1530-1560 full-sky, :2630-2660 clear-sky).
    """
    ncol, kz = h2ommr.shape
    dtype = h2ommr.dtype
    day = czen > 0.0
    dayf = day.astype(dtype)
    czen_s = jnp.where(day, czen, 1.0)      # guard divisions at night

    solin = scon * eccf * czen * dayf
    # pflx: interfaces incl. extra layer top (ncol, kz+2)
    pflx = jnp.concatenate(
        [jnp.zeros((ncol, 1), dtype), pint], axis=1)

    # optical paths (uh2o/uo3/uco2/uo2 per layer incl. extra layer 0)
    tmp1 = 0.5 / (tb.EGRAVGTS * tb.SSLP)
    sqrco2 = jnp.sqrt(co2mmr)
    zenfac = jnp.sqrt(czen_s)
    xptop = pflx[:, 1]
    h2ostr0 = jnp.sqrt(1.0 / h2ommr[:, 0])
    pthh2o0 = xptop ** 2 * tmp1 + (xptop * tb.REGRAVGTS) \
        * (h2ostr0 * zenfac * tb.DELTA)
    uh2o0 = h2ommr[:, 0] * pthh2o0
    uco2_0 = zenfac * sqrco2 * (xptop * tb.REGRAVGTS)
    uo2_0 = zenfac * tb.O2MMR * xptop * tb.REGRAVGTS
    uo3_0 = o3mmr[:, 0] * xptop * tb.REGRAVGTS

    pdel = pflx[:, 2:] - pflx[:, 1:-1]          # (ncol, kz)
    path = pdel * tb.REGRAVGTS
    h2ostr = jnp.sqrt(1.0 / h2ommr)
    pthh2o = (pflx[:, 2:] ** 2 - pflx[:, 1:-1] ** 2) * tmp1 \
        + pdel * h2ostr * zenfac[:, None] * (tb.DELTA * tb.REGRAVGTS)
    uh2o = jnp.concatenate([uh2o0[:, None], h2ommr * pthh2o], axis=1)
    uco2 = jnp.concatenate(
        [uco2_0[:, None], zenfac[:, None] * sqrco2 * path], axis=1)
    uo2 = jnp.concatenate(
        [uo2_0[:, None], zenfac[:, None] * tb.O2MMR * path], axis=1)
    uo3 = jnp.concatenate([uo3_0[:, None], o3mmr * path], axis=1)

    # total column absorber amounts (model layers only, for clear-sky)
    uth2o = jnp.sum(uh2o[:, 1:], axis=1)
    uto3 = jnp.sum(uo3[:, 1:], axis=1)
    utco2 = jnp.sum(uco2[:, 1:], axis=1)
    uto2 = jnp.sum(uo2[:, 1:], axis=1)

    zero1 = jnp.zeros((ncol,), dtype)
    out = dict(fsds=zero1, fsnt=zero1, fsns=zero1, solout=zero1,
               fsnsc=zero1, fsntc=zero1, sols=zero1, soll=zero1,
               solsd=zero1, solld=zero1, abv=zero1, sol=zero1)
    totfld = jnp.zeros((ncol, kz + 1), dtype)
    fswdn_sfc = zero1

    for ns in range(tb.NSPI):
        isl = int(tb.INDXSL[ns])
        # cloud optics for this interval (Slingo/Ebert-Curry)
        tmp1l = tb.ABARL[isl] + tb.BBARL[isl] / rel
        tmp2l = 1.0 - tb.CBARL[isl] - tb.DBARL[isl] * rel
        tmp3l = tb.FBARL[isl] * rel
        tmp1i = tb.ABARI[isl] + tb.BBARI[isl] / rei
        tmp2i = 1.0 - tb.CBARI[isl] - tb.DBARI[isl] * rei
        tmp3i = tb.FBARI[isl] * rei
        # scheme 2 cloud-fraction-weighted extinction (radcsw :1470-1485)
        tauxcl_lay = (clwp * cld * (1.0 - fice) * tmp1l) \
            / (1.0 + (1.0 - 0.85) * ((1.0 - cld)
                                     * (clwp * tmp1l * (1.0 - fice))))
        tauxci_lay = (clwp * cld * fice * tmp1i) \
            / (1.0 + (1.0 - 0.78) * ((1.0 - cld)
                                     * (clwp * tmp1i * fice)))
        wcl_lay = jnp.minimum(tmp2l, tb.VERYNEARONE)
        gcl_lay = tb.EBARL[isl] + tmp3l
        fcl_lay = gcl_lay * gcl_lay
        wci_lay = jnp.minimum(tmp2i, tb.VERYNEARONE)
        gci_lay = tb.EBARI[isl] + tmp3i
        fci_lay = gci_lay * gci_lay
        # extra top layer: no cloud
        pad0 = lambda a, v: jnp.concatenate(
            [jnp.full((ncol, 1), v, dtype), a], axis=1)
        tauxcl = pad0(tauxcl_lay, 0.0)
        tauxci = pad0(tauxci_lay, 0.0)
        wcl = pad0(wcl_lay, tb.VERYNEARONE)
        gcl = pad0(gcl_lay, 0.850)
        fcl = pad0(fcl_lay, 0.725)
        wci = pad0(wci_lay, tb.VERYNEARONE)
        gci = pad0(gci_lay, 0.850)
        fci = pad0(fci_lay, 0.725)

        wavmid = 0.5 * (tb.WAVMIN[ns] + tb.WAVMAX[ns])
        if wavmid < 0.7:
            diralb, difalb = adirsw, adifsw
            aveg = asw
        else:
            diralb, difalb = adirlw, adiflw
            aveg = alw
        trayoslp = tb.RAYTAU[ns] / tb.SSLP

        # -- radded: per-layer delta-Eddington (layers 0..kz) ------------
        tauray = trayoslp * (pflx[:, 1:] - pflx[:, :-1])   # (ncol, kz+1)
        taugab = tb.ABH2O[ns] * uh2o + tb.ABO3[ns] * uo3 \
            + tb.ABCO2[ns] * uco2 + tb.ABO2[ns] * uo2
        if aer is not None:
            atau = aer.tauxar[..., ns]
            aasc = aer.tauasc[..., ns]
            agt = aer.gtota[..., ns]
            aft = aer.ftota[..., ns]
        else:
            atau = aasc = agt = aft = 0.0
        tautot = tauxcl + tauxci + tauray + taugab + atau
        taucsc = tauxcl * wcl + tauxci * wci + aasc
        wtau = tb.WRAY * tauray
        wt = wtau + taucsc
        wtot = jnp.minimum(wt / tautot, tb.VERYNEARONE)
        gtot = (wtau * tb.GRAY + gcl * tauxcl * wcl
                + gci * tauxci * wci + agt) / wt
        ftot = (wtau * tb.FRAY + fcl * tauxcl * wcl
                + fci * tauxci * wci + aft) / wt
        rdir, rdif, tdir, tdif, explay = _delta_eddington(
            wtot, ftot, tautot, gtot, czen_s[:, None])
        exptdn, tottrn, rdndif = _add_down(rdir, rdif, tdir, tdif,
                                           explay)
        rupdir, rupdif = _add_up(rdir, rdif, tdir, tdif, explay,
                                 diralb, difalb)
        fluxup, fluxdn = _fluxes(exptdn, tottrn, rdndif, rupdir, rupdif)
        flxdiv = (fluxdn[:, :-1] - fluxdn[:, 1:]) \
            + (fluxup[:, 1:] - fluxup[:, :-1])

        psf = 1.0
        if abs(tb.PH2O[ns]) > 1e-30:
            psf *= tb.PH2O[ns]
        if abs(tb.PCO2[ns]) > 1e-30:
            psf *= tb.PCO2[ns]
        if abs(tb.PO2[ns]) > 1e-30:
            psf *= tb.PO2[ns]
        solflx = solin * tb.FRCSOL[ns] * psf
        out["fsnt"] += solflx * (fluxdn[:, 1] - fluxup[:, 1])
        out["fsns"] += solflx * (fluxdn[:, -1] - fluxup[:, -1])
        out["solout"] += solflx * fluxup[:, 0]
        netsfc = solflx * (fluxdn[:, -1] - fluxup[:, -1])
        if wavmid < 0.7:
            out["sols"] += exptdn[:, -1] * solflx * 1e-3
            out["solsd"] += (fluxdn[:, -1] - exptdn[:, -1]) \
                * solflx * 1e-3
        else:
            out["soll"] += exptdn[:, -1] * solflx * 1e-3
            out["solld"] += (fluxdn[:, -1] - exptdn[:, -1]) \
                * solflx * 1e-3
        out["abv"] += netsfc * (1.0 - aveg) / (1.0 - diralb) * 1e-3
        totfld = totfld + solflx[:, None] * flxdiv
        fswdn_sfc = fswdn_sfc + solflx * fluxdn[:, -1]
        if ns == 7:                 # ns==8 1-based: incident visible
            out["sol"] = solflx * fluxdn[:, -1] * 1e-3

        # -- radclr: 2-effective-layer clear-sky column ------------------
        # layer 0: pure-absorbing ozone layer; layer 1: rest of column
        taugab0 = tb.ABO3[ns] * uto3
        explay0 = jnp.exp(-jnp.minimum(taugab0 / czen_s, tb.MXARG))
        tdir0 = explay0
        tdif0 = jnp.exp(-jnp.minimum(1.66 * taugab0, tb.MXARG))
        rdir0 = jnp.zeros_like(explay0)
        rdif0 = jnp.zeros_like(explay0)
        tauray1 = trayoslp * pflx[:, -1]
        taugab1 = tb.ABH2O[ns] * uth2o + tb.ABCO2[ns] * utco2 \
            + tb.ABO2[ns] * uto2
        if aer is not None:
            atau1 = jnp.sum(aer.tauxar[..., ns], axis=1)
            aasc1 = jnp.sum(aer.tauasc[..., ns], axis=1)
            agt1 = jnp.sum(aer.gtota[..., ns], axis=1)
            aft1 = jnp.sum(aer.ftota[..., ns], axis=1)
        else:
            atau1 = aasc1 = agt1 = aft1 = 0.0
        tautot1 = tauray1 + taugab1 + atau1
        wtot1 = jnp.minimum((tb.WRAY * tauray1 + aasc1) / tautot1,
                            tb.VERYNEARONE)
        gtot1 = (tb.GRAY * tb.WRAY * tauray1 + agt1) \
            / (wtot1 * tautot1)
        ftot1 = (tb.FRAY * tb.WRAY * tauray1 + aft1) \
            / (wtot1 * tautot1)
        rdir1, rdif1, tdir1, tdif1, explay1 = _delta_eddington(
            wtot1, ftot1, tautot1, gtot1, czen_s)
        # gate layer-1 computation on transmission through the o3 layer
        live = tdir0 > tb.TRMIN
        rdir1 = jnp.where(live, rdir1, 0.0)
        rdif1 = jnp.where(live, rdif1, 0.0)
        tdir1 = jnp.where(live, tdir1, 0.0)
        tdif1 = jnp.where(live, tdif1, 0.0)
        explay1 = jnp.where(live, explay1, 0.0)
        cl_rdir = jnp.stack([rdir0, rdir1], axis=1)
        cl_rdif = jnp.stack([rdif0, rdif1], axis=1)
        cl_tdir = jnp.stack([tdir0, tdir1], axis=1)
        cl_tdif = jnp.stack([tdif0, tdif1], axis=1)
        cl_explay = jnp.stack([explay0, explay1], axis=1)
        cexptdn, ctottrn, crdndif = _add_down(
            cl_rdir, cl_rdif, cl_tdir, cl_tdif, cl_explay)
        crupdir, crupdif = _add_up(cl_rdir, cl_rdif, cl_tdir, cl_tdif,
                                   cl_explay, diralb, difalb)
        cfluxup, cfluxdn = _fluxes(cexptdn, ctottrn, crdndif,
                                   crupdir, crupdif)
        out["fsntc"] += solflx * (cfluxdn[:, 0] - cfluxup[:, 0])
        out["fsnsc"] += solflx * (cfluxdn[:, 2] - cfluxup[:, 2])

    qrs = -(tb.GOCP * totfld[:, 1:]) / (pint[:, :-1] - pint[:, 1:])
    qrs = qrs * dayf[:, None]
    msk = lambda a: a * dayf
    return SWResult(
        qrs=qrs, fsns=msk(out["fsns"]), fsnt=msk(out["fsnt"]),
        fsntc=msk(out["fsntc"]), fsnsc=msk(out["fsnsc"]),
        fsds=msk(fswdn_sfc), solin=solin, solout=msk(out["solout"]),
        sols=msk(out["sols"]), soll=msk(out["soll"]),
        solsd=msk(out["solsd"]), solld=msk(out["solld"]),
        abv=msk(out["abv"]), sol=msk(out["sol"]))
