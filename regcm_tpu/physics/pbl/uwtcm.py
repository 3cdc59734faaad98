"""UW turbulent closure model (ibltyp=2) — Bretherton-McCaa-Grenier
(2004) moist TKE PBL, re-derived TPU-first from the reference
``Main/pbllib/mod_pbl_uwtcm.F90:137`` (uwtcm) + ``mod_pbl_thetal.F90``.

Prognoses TKE on the kz+1 interface levels; diffuses liquid-water
potential temperature and total water (and ice/momentum) implicitly with
Mellor-Yamada level-2.5 stability functions; diagnoses PBL height from
connected convectively-unstable (N²≤0) interface layers, extended
up/down by the integrated N²·l² criterion with cloud-top radiative and
entrainment contributions (Grenier-Bretherton 2001).

TPU re-design notes (vs the Fortran per-column control flow):
- all columns are processed dense: the per-column ``do i,j`` loops become
  whole-grid array ops; the tridiagonal solves are batched Thomas
  ``lax.scan`` sweeps along k over the full (iy, jx) plane;
- the reference's unstable-layer bookkeeping (``pblhgt``: find runs,
  extend up one interface + while ∫N²l² allows, add radiative /
  entrainment terms, extend down, restart on merges) is recast as
  run-labelling prefix scans plus one upward and one downward extension
  `lax.scan`; merged layers are reconnected by the extension marks in a
  final relabel rather than by restarting the search loop (documented
  deviation: the reference restarts the merge loop until a fixed point —
  identical for ≤1 merge per column per step, the overwhelmingly common
  case);
- ``thv0 = thgb*(1+tvfac)`` reproduces the reference formula at
  mod_pbl_uwtcm.F90:329 verbatim for behavioural parity (it biases the
  surface interface strongly unstable).

Index conventions: k=0 is the model top. Layer arrays are (kz, iy, jx);
interface arrays (kz+1, iy, jx) with interface kz = the surface.
Interface k sits between layer k-1 (above) and layer k (below).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...utils import constants as c
from ...utils.thermo import pfwsat

UWTKEMIN = 1.0e-3          # uwtkemin (mod_pbl_uwtcm.F90:86)
TKEMIN = 1.0e-4            # tkemin floor used by the dycore forecast
XFR = 0.1                  # fraction of turb layer in bbls (:90)
AONE = 1.9 * XFR           # :92
MINN2 = 1.0e-7             # :95
KTHMAX = 1.0e3             # melloryamada kthmax/kzmmax (:813-814)
# Mellor-Yamada closure constants (melloryamada :810-811)
A1, C1, A2, B2 = 0.92, 0.08, 0.74, 10.1


class UWParams(NamedTuple):
    """uwparam namelist defaults (Main/mod_params.F90:476-480)."""
    atwo: float = 15.0
    rstbl: float = 1.5
    czero: float = 5.869
    nuk: float = 5.0


class UWOut(NamedTuple):
    uten: jax.Array      # (kz,iy,jx) uncoupled cross du/dt
    vten: jax.Array
    tten: jax.Array      # uncoupled dT/dt
    qvten: jax.Array
    qcten: jax.Array
    qiten: jax.Array
    tketen: jax.Array    # (kz+1,iy,jx) d(tke)/dt
    kth: jax.Array       # scalar diffusivity, interfaces
    kzm: jax.Array       # momentum diffusivity, interfaces
    kpbl: jax.Array      # (iy,jx) int PBL-top interface index
    zpbl: jax.Array      # (iy,jx) PBL height (m)


def _tridiag(a, b, cc, rhs_list):
    """Batched Thomas algorithm along axis 0 (solve_tridiag,
    mod_pbl_uwtcm.F90:725-757). a/b/cc: (n, iy, jx)."""
    n = a.shape[0]

    def fwd(carry, k):
        bp_prev, vps = carry
        m = a[k] / bp_prev
        bp = b[k] - m * cc[k - 1]
        vp_new = tuple(r[k] - m * vp for r, vp in zip(rhs_list, vps))
        return (bp, vp_new), (bp, vp_new)

    bp0 = b[0]
    vp0 = tuple(r[0] for r in rhs_list)
    (_, _), (bps, vps) = jax.lax.scan(
        fwd, (bp0, vp0), jnp.arange(1, n))
    bps = jnp.concatenate([bp0[None], bps], axis=0)
    vps = tuple(jnp.concatenate([v0[None], v], axis=0)
                for v0, v in zip(vp0, vps))

    def bwd(xs, k):
        xn = tuple((vp[k] - cc[k] * x) / bps[k] for vp, x in zip(vps, xs))
        return xn, xn

    xn0 = tuple(vp[n - 1] / bps[n - 1] for vp in vps)
    _, xs = jax.lax.scan(bwd, xn0, jnp.arange(n - 2, -1, -1))
    outs = []
    for i, x0 in enumerate(xn0):
        stack = jnp.concatenate([jnp.flip(xs[i], axis=0), x0[None]], axis=0)
        outs.append(stack)
    return tuple(outs)


def _n2(thl, qw, exnerfl, rexnerfl, presfl, rdza, qw_ref):
    """Saturation-adjusted buoyancy frequency at interfaces 1..kz-1
    (n2, mod_pbl_uwtcm.F90:759-803). Returns (nsq, rcldb) on the
    (kz+1,…) interface grid (rows 0 and kz left zero, filled by caller).
    qw_ref: the qw profile used for the virtual-effect factor (the
    reference closes over the *outer* qwx, not the iterate)."""
    kz = thl.shape[0]

    def sat_adjust(thl_lay, qw_lay, k):
        # one Newton step from the liquid-water temperature (as in ref)
        templ = thl_lay * exnerfl[k]
        rvls = pfwsat(templ, presfl[k])
        temps = templ + (qw_lay - rvls) / (
            c.cpowlhv + c.ep2 * c.wlhv * rvls / (c.rgas * templ * templ))
        rvls = pfwsat(temps, presfl[k])
        rcld = jnp.maximum(qw_lay - rvls, 0.0)
        return templ, rcld

    # below-interface parcel: layer k lifted to interface k
    templ_b, rcld_b = sat_adjust(thl[1:], qw[1:], slice(1, kz))
    tempv_b = (templ_b + c.wlhvocp * rcld_b) * (
        1.0 + c.ep1 * (qw_ref[1:] - rcld_b) - rcld_b)
    tvbl = tempv_b * rexnerfl[1:kz]
    # above-interface parcel: layer k-1 lowered to interface k
    templ_a, rcld_a = sat_adjust(thl[:-1], qw[:-1], slice(1, kz))
    tempv_a = (templ_a + c.wlhvocp * rcld_a) * (
        1.0 + c.ep1 * (qw_ref[:-1] - rcld_a) - rcld_a)
    tvab = tempv_a * rexnerfl[1:kz]

    thvxfl = 0.5 * (tvab + tvbl)
    dtvdz = (tvab - tvbl) * rdza[1:kz]
    nsq_i = c.egrav / thvxfl * dtvdz
    z1 = jnp.zeros_like(nsq_i[:1])
    nsq = jnp.concatenate([nsq_i[:1], nsq_i, z1], axis=0)
    rcldb = jnp.concatenate([jnp.zeros_like(rcld_b[:1]), rcld_b, z1],
                            axis=0)
    return nsq, rcldb


def _pblhgt(nsq, tke, zq_ext, qc_lay, heatrt, presfl, rhoxfl, uthv,
            exnerfl, rexnerhl, thl, thx, qw, ktr, p: UWParams):
    """PBL height + master length scale (pblhgt,
    mod_pbl_uwtcm.F90:909-1057). All inputs on the column grids
    described in the module docstring; returns (bbls, top_mask, kmix,
    kpbl, zpbl) where top_mask marks convective-layer top interfaces."""
    kzp1 = nsq.shape[0]
    kz = kzp1 - 1
    karr = jnp.arange(kzp1)[:, None, None]
    vkzq = c.vonkar * zq_ext[:kzp1]

    unstable = nsq <= 0.0
    unstable = unstable.at[0].set(False)   # ref loop starts at k=2

    def label_runs(mask):
        """Run extents + within-run aggregates by prefix scans."""
        above = jnp.concatenate([jnp.zeros_like(mask[:1]), mask[:-1]],
                                axis=0)
        start = mask & ~above

        zi = jnp.zeros(mask.shape[1:], jnp.int32)

        def down(carry, k):
            t = jnp.where(start[k], k.astype(jnp.int32), carry)
            return t, t
        _, tops = jax.lax.scan(down, zi, jnp.arange(kzp1))

        below = jnp.concatenate([mask[1:], jnp.zeros_like(mask[:1])],
                                axis=0)
        end = mask & ~below

        def up(carry, k):
            b = jnp.where(end[k], k.astype(jnp.int32), carry)
            return b, b
        _, bots_r = jax.lax.scan(up, zi,
                                 jnp.arange(kzp1 - 1, -1, -1))
        bots = jnp.flip(bots_r, axis=0)
        return start, end, tops, bots

    def run_reduce(start, end, tops, vals, mask):
        """Sum vals over each run; broadcast the total to every member."""
        def down(carry, k):
            s = jnp.where(start[k], vals[k],
                          carry + jnp.where(mask[k], vals[k], 0.0))
            return s, s
        _, prefix = jax.lax.scan(down, jnp.zeros_like(vals[0]),
                                 jnp.arange(kzp1))

        def up(carry, k):
            tot = jnp.where(end[k], prefix[k], carry)
            return tot, tot
        _, tot_r = jax.lax.scan(up, jnp.zeros_like(vals[0]),
                                jnp.arange(kzp1 - 1, -1, -1))
        return jnp.flip(tot_r, axis=0)

    def run_geometry(mask):
        start, end, tops, bots = label_runs(mask)
        # blinf = xfr*(zq[top-1] - zq[bot+1]) (:951)
        ztop = jnp.take_along_axis(zq_ext, jnp.maximum(tops - 1, 0),
                                   axis=0)
        zbot = jnp.take_along_axis(zq_ext, jnp.minimum(bots + 1, kzp1),
                                   axis=0)
        blinf = XFR * (ztop - zbot)
        bbls_c = jnp.minimum(blinf, vkzq)
        nn = nsq * bbls_c * bbls_c
        rnnll = run_reduce(start, end, tops, jnp.where(mask, nn, 0.0),
                           mask)
        nlev = run_reduce(start, end, tops,
                          jnp.where(mask, 1.0, 0.0), mask)
        tketot = run_reduce(start, end, tops,
                            jnp.where(mask, tke, 0.0), mask)
        tkeavg = tketot / jnp.maximum(nlev, 1.0)
        return start, end, tops, bots, blinf, bbls_c, rnnll, nlev, tkeavg

    (start, end, tops, bots, blinf, bbls_c, rnnll, nlev,
     tkeavg) = run_geometry(unstable)

    # ---- upward extension (searchup1 :963-990): scan k = kz → 1 -------
    def upscan(carry, k):
        active, rnn, nl, bli, first = carry
        is_top = start[k]
        # activate when passing a run top
        active = jnp.where(is_top, True, active)
        rnn = jnp.where(is_top, rnnll[k], rnn)
        nl = jnp.where(is_top, nlev[k], nl)
        bli = jnp.where(is_top, blinf[k], bli)
        first = jnp.where(is_top, True, first)
        kk = k - 1     # candidate interface above
        valid = active & (kk >= 1)
        tb = jnp.minimum(bli, vkzq[jnp.maximum(kk, 0)])
        trn = nsq[jnp.maximum(kk, 0)] * tb * tb
        cont = valid & (first | (trn * nl < -0.5 * rnn)) \
            & ~unstable[jnp.maximum(kk, 0)]
        rnn = jnp.where(cont, rnn + trn, rnn)
        nl = jnp.where(cont, nl + 1.0, nl)
        active = cont
        first = jnp.zeros_like(first)
        return (active, rnn, nl, bli, first), cont

    z2b = jnp.zeros(nsq.shape[1:], bool)
    z2f = jnp.zeros(nsq.shape[1:], nsq.dtype)
    _, ext_up_r = jax.lax.scan(
        upscan, (z2b, z2f, z2f, z2f, z2b),
        jnp.arange(kzp1 - 1, 0, -1))
    # ext_up_r[j] corresponds to interface (kzp1-1-j)-1 = kz-1-j
    ext_up = jnp.zeros_like(unstable)
    idx = jnp.arange(kzp1 - 1, 0, -1) - 1
    ext_up = ext_up.at[idx].set(ext_up_r)

    mask2 = unstable | ext_up
    (start, end, tops, bots, blinf, bbls_c, rnnll, nlev,
     tkeavg) = run_geometry(mask2)

    # ---- cloud-top radiative + entrainment terms (:992-1010) ----------
    qc_i = jnp.concatenate([qc_lay, jnp.zeros_like(qc_lay[:1])], axis=0)
    heat_i = jnp.concatenate([heatrt, jnp.zeros_like(heatrt[:1])],
                             axis=0)
    presfl_x = jnp.concatenate([presfl, presfl[-1:]], axis=0)
    radnnll = jnp.where(
        qc_i > c.minqq,
        heat_i * (presfl_x[1:kzp1 + 1] - presfl_x[:kzp1])
        / (rhoxfl * uthv * exnerfl), 0.0)
    thl_i = jnp.concatenate([thl, thl[-1:]], axis=0)
    thx_i = jnp.concatenate([thx, thx[-1:]], axis=0)
    qw_i = jnp.concatenate([qw, qw[-1:]], axis=0)
    thvl = thl_i + thx_i * c.ep1 * qw_i            # per layer
    delthvl = (jnp.roll(thvl, 2, axis=0) - thvl)[:kzp1]
    _, rcldb_dummy = 0.0, 0.0
    # elambda uses rcldb at the interface — recomputed by caller; here we
    # use the conservative qc-based estimate (qc at the layer below)
    elam = c.wlhvocp * qc_i * jnp.concatenate(
        [rexnerhl, rexnerhl[-1:]], axis=0)[:kzp1] \
        / jnp.maximum(delthvl, 0.1)
    biga = AONE * (1.0 + p.atwo * 0.8 * elam)
    entnnll = jnp.where(karr >= 2, biga * tkeavg ** 1.5
                        / jnp.maximum(bbls_c, 1e-10), 0.0)
    addtop = jnp.where(
        (tkeavg > 0.0) & start,
        jnp.minimum(0.0, bbls_c / jnp.sqrt(jnp.maximum(tkeavg, 1e-12))
                    * (radnnll + entnnll)), 0.0)
    # add the top contribution to the whole run's rnnll
    s2, e2, t2, b2 = label_runs(mask2)
    rnnll = rnnll + run_reduce(s2, e2, t2, addtop, mask2)

    # ---- downward extension (searchdown1 :1012-1037): scan k = 1→kz ---
    def downscan(carry, k):
        active, rnn, nl, bli = carry
        is_bot = end[k]
        active = jnp.where(is_bot, True, active)
        rnn = jnp.where(is_bot, rnnll[k], rnn)
        nl = jnp.where(is_bot, nlev[k], nl)
        bli = jnp.where(is_bot, blinf[k], bli)
        kk = k + 1
        valid = active & (kk <= kz)
        tb = jnp.minimum(bli, vkzq[jnp.minimum(kk, kz)])
        trn = nsq[jnp.minimum(kk, kz)] * tb * tb
        cont = valid & (trn * nl < -0.5 * rnn) \
            & ~mask2[jnp.minimum(kk, kz)]
        rnn = jnp.where(cont, rnn + trn, rnn)
        nl = jnp.where(cont, nl + 1.0, nl)
        active = cont
        return (active, rnn, nl, bli), cont

    _, ext_dn_s = jax.lax.scan(
        downscan, (z2b, z2f, z2f, z2f), jnp.arange(0, kzp1 - 1))
    ext_dn = jnp.zeros_like(unstable)
    ext_dn = ext_dn.at[jnp.arange(1, kzp1)].set(ext_dn_s)

    mask3 = mask2 | ext_dn
    s3, e3, t3, b3 = label_runs(mask3)
    ztop = jnp.take_along_axis(zq_ext, jnp.maximum(t3 - 1, 0), axis=0)
    zbot = jnp.take_along_axis(zq_ext, jnp.minimum(b3 + 1, kzp1), axis=0)
    blinf3 = XFR * (ztop - zbot)

    # final master length scale (setbbls :1041-1048 + stable branch :938)
    bbls_stable = jnp.where(
        nsq > 0.0,
        jnp.minimum(p.rstbl * jnp.sqrt(tke / jnp.maximum(nsq, 1e-20)),
                    vkzq), 0.0)
    bbls = jnp.where(mask3, jnp.minimum(blinf3, vkzq), bbls_stable)
    bbls = bbls.at[0].set(0.0)

    top_mask = s3
    any_run = jnp.any(mask3, axis=0)
    kmin = jnp.min(jnp.where(mask3, karr, kzp1), axis=0)
    kmix = jnp.where(any_run, jnp.maximum(kmin, ktr), kz)
    zpbl = jnp.take_along_axis(
        zq_ext, kmix[None], axis=0)[0]
    return bbls, top_mask, kmix, zpbl


def uwtcm(t, qv, qc, qi, u, v, za, zq, dzq, patm, patmf, tke0,
          heatrt, tg, q2m, qfx, hfx, uvdrag, lndmsk, ptrop, dt,
          p: UWParams = UWParams(), diffuse_ice: bool = False):
    """One UW TCM step over the dense grid (uwtcm,
    Main/pbllib/mod_pbl_uwtcm.F90:137-714). All 3-D layer inputs are
    (kz, iy, jx) decoupled physical fields at time b; tke0 is
    (kz+1, iy, jx). Returns uncoupled tendencies (UWOut)."""
    kz = t.shape[0]
    kzp1 = kz + 1
    dtype = t.dtype
    rczero = 1.0 / p.czero
    tkefac = p.czero ** (2.0 / 3.0)
    b1 = p.czero * 2.0 ** 1.5

    tke = jnp.maximum(tke0, UWTKEMIN)
    zq_ext = jnp.concatenate([zq, jnp.zeros_like(zq[:1])], axis=0)

    exnerhl = (patm / c.stdp) ** c.rovcp
    rexnerhl = 1.0 / exnerhl
    exnerfl = (patmf / c.stdp) ** c.rovcp
    rexnerfl = 1.0 / exnerfl
    rdzq = 1.0 / dzq

    thx = t * rexnerhl
    qw = qv + qc
    tvcon = 1.0 + c.ep1 * qv - qc
    tvx = t * tvcon
    uthv = thx * tvcon
    thl = thx - c.wlhvocp * qc * rexnerhl

    rhoxhl = patm / (c.rgas * tvx)
    rrhoxhl = 1.0 / rhoxhl

    # interface spacing/density (:283-293)
    dza = za[:-1] - za[1:]                       # (kz-1,) interfaces 1..kz-1
    rdza_i = 1.0 / dza
    z1 = jnp.zeros_like(t[:1])
    rdza = jnp.concatenate([z1, rdza_i, z1], axis=0)   # (kz+1)
    fracz = (zq[1:kz] - za[1:]) * rdza_i
    rhoxfl_i = rhoxhl[1:] + (rhoxhl[:-1] - rhoxhl[1:]) * fracz
    rhoxfl = jnp.concatenate([rhoxhl[:1], rhoxfl_i, rhoxhl[-1:]], axis=0)
    rrhoxfl = 1.0 / rhoxfl
    # interface uthv/exner for the radiative buoyancy term
    uthv_i = jnp.concatenate([uthv, uthv[-1:]], axis=0)

    # ---- surface (:314-345) -------------------------------------------
    thgb = tg * rexnerfl[kz]
    q0s = pfwsat(tg, patmf[kz])
    tvfac = jnp.where(lndmsk > 0.5, 1.0 + c.ep1 * q2m,
                      1.0 + c.ep1 * q0s)
    rhoxsf = patmf[kz] / (c.rgas * tvx[kz - 1])
    # verbatim reference formula (:329) — see module docstring
    thv0 = thgb * (1.0 + tvfac)
    dthv = uthv[kz - 1] - thv0
    uflxp = -uvdrag * u[kz - 1] / rhoxsf
    vflxp = -uvdrag * v[kz - 1] / rhoxsf
    ustxsq = jnp.sqrt(uflxp ** 2 + vflxp ** 2)

    # ---- N², PBL height (:352-365) ------------------------------------
    nsq, rcldb = _n2(thl, qw, exnerfl, rexnerfl, patmf, rdza, qw)
    nsq = nsq.at[kz].set(c.egrav / uthv[kz - 1] * dthv / za[kz - 1])

    bbls, top_mask, kmix, zpbl = _pblhgt(
        nsq, tke, zq_ext, qc, heatrt, patmf, rrhoxfl * 0 + rhoxfl,
        uthv_i, exnerfl, rexnerhl, thl, thx, qw, ptrop, p)

    # ---- Mellor-Yamada diffusivities ----------------------------------
    def melloryamada(nsq_in, rcldb_in, thl_in, qw_in):
        gh = -bbls ** 2 * nsq_in / (2.0 * tke + 1.0e-9)
        gh = jnp.clip(gh, -0.28, 0.0233)      # Galperin 88 limits
        a1ob1 = A1 / b1
        sm = A1 * (1.0 - 3.0 * C1 - 6.0 * a1ob1 - 3.0 * A2 * gh *
                   ((B2 - 3.0 * A2) * (1.0 - 6.0 * a1ob1)
                    - 3.0 * C1 * (B2 + 6.0 * A1))) / \
            ((1.0 - 3.0 * A2 * gh * (6.0 * A1 + B2))
             * (1.0 - 9.0 * A1 * A2 * gh))
        sh = A2 * (1.0 - 6.0 * a1ob1) / (1.0 - 3.0 * A2 * gh
                                         * (6.0 * A1 + B2))
        speed = jnp.sqrt(2.0 * tke)
        kth = jnp.minimum(bbls * speed * sh, KTHMAX)
        kzm = jnp.minimum(bbls * speed * sm, KTHMAX)
        kth = kth.at[0].set(0.0).at[kz].set(0.0)
        kzm = kzm.at[0].set(0.0).at[kz].set(0.0)
        # kethl on layers (:863): geometric mean of bounding interfaces
        kethl = p.nuk * jnp.sqrt(kzm[:kz] * kzm[1:])
        kethl = jnp.minimum(kethl, KTHMAX)
        # convective-top entrainment closure (conv :869-901)
        karr = jnp.arange(kzp1)[:, None, None]
        thvl = thl_in + thx * c.ep1 * qw_in
        thvl_i = jnp.concatenate([thvl, thvl[-1:]], axis=0)
        delthvl = (jnp.roll(thvl_i, 2, axis=0) - thvl_i)[:kzp1]
        elam = c.wlhvocp * rcldb_in * jnp.concatenate(
            [rexnerhl, rexnerhl[-1:]], axis=0)[:kzp1] \
            / jnp.maximum(delthvl, 0.1)
        biga = AONE * (1.0 + p.atwo * 0.8 * elam)
        bbmax = jnp.maximum(bbls,
                            jnp.concatenate([bbls[1:], bbls[-1:]],
                                            axis=0))
        kth_ent = jnp.minimum(
            kth, biga * tke ** 1.5 / jnp.maximum(nsq_in, MINN2)
            / jnp.maximum(bbmax, 1e-10))
        sel = top_mask & (nsq_in >= MINN2) & (karr >= 2)
        kth_new = jnp.where(sel, jnp.minimum(kth_ent, KTHMAX), kth)
        sh_dn = jnp.concatenate([sh[1:], sh[-1:]], axis=0)
        sm_dn = jnp.concatenate([sm[1:], sm[-1:]], axis=0)
        kzm_new = jnp.where(
            sel, jnp.minimum(jnp.minimum(kzm, kth_new / sh_dn * sm_dn),
                             KTHMAX), kzm)
        # kethl: conv tops get nuk*kzm[k+1]; level above top zeroed
        kzm_dn = jnp.concatenate([kzm_new[1:], kzm_new[-1:]], axis=0)
        sel_l = sel[:kz]
        kethl = jnp.where(sel_l, jnp.minimum(p.nuk * kzm_dn[:kz],
                                             KTHMAX), kethl)
        above = jnp.concatenate([sel_l[1:],
                                 jnp.zeros_like(sel_l[:1])], axis=0)
        kethl = jnp.where(above & (karr[:kz] >= 2), 0.0, kethl)
        kethl = kethl.at[0].set(kethl[1])
        kethl = kethl.at[kz - 1].set(p.nuk * 0.5 * kzm_new[kz - 1])
        return kth_new, kzm_new, kethl

    # ---- 2-iteration semi-implicit thl/qw diffusion (:377-421) --------
    thl_it, qw_it = thl, qw
    nsq_it, rcldb_it = nsq, rcldb
    for _ in range(2):
        kth, kzm, kethl = melloryamada(nsq_it, rcldb_it, thl_it, qw_it)
        a = jnp.concatenate(
            [z1, -(rhoxfl[1:kz] * rrhoxhl[1:]) * kth[1:kz] * dt
             * rdzq[1:] * rdza[1:kz]], axis=0)
        cc = jnp.concatenate(
            [-(rhoxfl[1:kz] * rrhoxhl[:-1]) * kth[1:kz] * dt
             * rdzq[:-1] * rdza[1:kz], z1], axis=0)
        b = 1.0 - a - cc
        r1 = thl.at[kz - 1].add(
            dt * hfx * rrhoxhl[kz - 1] * c.rcpd * rdzq[kz - 1]
            * rexnerhl[kz - 1])
        r2 = qw.at[kz - 1].add(dt * qfx * rrhoxhl[kz - 1]
                               * rdzq[kz - 1])
        thl_it, qw_it = _tridiag(a, b, cc, [r1, r2])
        nsq_it, rcldb_it = _n2(thl_it, qw_it, exnerfl, rexnerfl, patmf,
                               rdza, qw)
        # surface N² from the updated lowest layer (:415-419)
        thx_t = thl_it[kz - 1] + c.wlhvocp * qc[kz - 1] \
            * rexnerhl[kz - 1]
        thvx_t = thx_t * (1.0 + c.ep1 * qv[kz - 1] - qc[kz - 1])
        nsq_it = nsq_it.at[kz].set(
            c.egrav / thvx_t * (thvx_t - thv0) / za[kz - 1])

    # ---- recover T, qv, qc from thl/qw (3-iter Newton, :443-465) ------
    templ = thl_it * exnerhl
    temps = templ
    rvls = pfwsat(temps, patm)
    for _ in range(3):
        dtc = ((templ - temps) * c.cpowlhv + qw_it - rvls) / (
            c.cpowlhv + c.ep2 * c.wlhv * rvls / (c.rgas * temps * temps))
        temps = temps + dtc
        rvls = pfwsat(temps, patm)
    qc_new = jnp.maximum(qw_it - rvls, 0.0)
    qv_new = qw_it - qc_new
    thx_new = (templ + c.wlhvocp * qc_new) * rexnerhl
    uthv_new = thx_new * (1.0 + c.ep1 * qv_new - qc_new)

    # ---- implicit momentum diffusion (:470-496) -----------------------
    a = jnp.concatenate(
        [z1, -(rhoxfl[1:kz] * rrhoxhl[1:]) * kzm[1:kz] * dt
         * rdzq[1:] * rdza[1:kz]], axis=0)
    cc = jnp.concatenate(
        [-(rhoxfl[1:kz] * rrhoxhl[:-1]) * kzm[1:kz] * dt
         * rdzq[:-1] * rdza[1:kz], z1], axis=0)
    b = 1.0 - a - cc
    ru = u.at[kz - 1].add(dt * uflxp * (rhoxsf * rrhoxhl[kz - 1])
                          * rdzq[kz - 1])
    rv = v.at[kz - 1].add(dt * vflxp * (rhoxsf * rrhoxhl[kz - 1])
                          * rdzq[kz - 1])
    if diffuse_ice:
        akth = jnp.concatenate(
            [z1, -(rhoxfl[1:kz] * rrhoxhl[1:]) * kth[1:kz] * dt
             * rdzq[1:] * rdza[1:kz]], axis=0)
        ckth = jnp.concatenate(
            [-(rhoxfl[1:kz] * rrhoxhl[:-1]) * kth[1:kz] * dt
             * rdzq[:-1] * rdza[1:kz], z1], axis=0)
        bkth = 1.0 - akth - ckth
        (qi_new,) = _tridiag(akth, bkth, ckth, [qi])
        qi_new = jnp.maximum(qi_new, 0.0)
    else:
        qi_new = qi
    u_new, v_new = _tridiag(a, b, cc, [ru, rv])

    # ---- TKE budget (:584-665) ----------------------------------------
    uflxp = -uvdrag * u_new[kz - 1] / rhoxsf
    vflxp = -uvdrag * v_new[kz - 1] / rhoxsf
    ustxsq = jnp.sqrt(uflxp ** 2 + vflxp ** 2)
    dthv = uthv_new[kz - 1] - thv0
    nsq_it = nsq_it.at[kz].set(
        c.egrav / uthv_new[kz - 1] * dthv / za[kz - 1])

    dudz = (u_new[:-1] - u_new[1:]) * rdza[1:kz]
    dvdz = (v_new[:-1] - v_new[1:]) * rdza[1:kz]
    svs = dudz ** 2 + dvdz ** 2
    zi1 = jnp.zeros_like(nsq[:1])
    buoyan = jnp.concatenate([zi1, -kth[1:kz] * nsq_it[1:kz], zi1],
                             axis=0)
    shear = jnp.concatenate([zi1, kzm[1:kz] * svs, zi1], axis=0)
    # cloud-top radiative divergence (radib :607-614)
    qc_i = jnp.concatenate([qc, jnp.zeros_like(qc[:1])], axis=0)
    heat_i = jnp.concatenate([heatrt, jnp.zeros_like(heatrt[:1])],
                             axis=0)
    patmf_x = jnp.concatenate([patmf, patmf[-1:]], axis=0)
    karr = jnp.arange(kzp1)[:, None, None]
    radterm = jnp.where(
        top_mask & (qc_i > c.minqq) & (karr >= 1),
        heat_i * (patmf_x[1:kzp1 + 1] - patmf_x[:kzp1]) * rrhoxfl
        * rexnerfl / uthv_i, 0.0)
    buoyan = buoyan - radterm

    tke_sfc = jnp.maximum(tkefac * ustxsq, UWTKEMIN)
    # rows: interfaces 1..kz-1 (n = kz-1 unknowns)
    ks = jnp.arange(1, kz)
    kethl_x = kethl                                  # (kz,) layers
    a_t = jnp.where(
        (ks > 1)[:, None, None],
        -(rhoxhl[ks - 1] * rrhoxfl[ks]) * kethl_x[ks - 1] * dt
        * rdzq[ks - 1] * rdza[ks], 0.0)
    c_t = jnp.where(
        (ks < kz - 1)[:, None, None],
        -(rhoxhl[ks] * rrhoxfl[ks]) * kethl_x[ks] * dt
        * rdzq[ks] * rdza[ks], 0.0)
    bbls_dn = jnp.concatenate([bbls[1:], bbls[-1:]], axis=0)
    tbbls = jnp.maximum(bbls[ks], bbls_dn[ks])
    diss_mid = jnp.where(tbbls > 0.0,
                         dt * jnp.sqrt(tke[ks]) * rczero
                         / jnp.maximum(tbbls, 1e-10), 0.0)
    sfc_coup = (rhoxhl[kz - 1] * rrhoxfl[kz - 1]) * kethl_x[kz - 1] \
        * rdzq[kz - 1] * rdza[kz - 1]
    diss_bot = jnp.where(
        bbls[kz - 1] > 0.0,
        dt * (jnp.sqrt(tke[kz - 1]) * rczero
              / jnp.maximum(bbls[kz - 1], 1e-10) + sfc_coup),
        dt * sfc_coup)
    b_t = 1.0 - a_t - c_t + jnp.where(
        (ks == kz - 1)[:, None, None], diss_bot, diss_mid)
    r_t = tke[ks] + dt * (shear[ks] + buoyan[ks])
    r_t = r_t.at[-1].add(dt * tke_sfc * sfc_coup)
    (tke_sol,) = _tridiag(a_t, b_t, c_t, [r_t])
    tke_new = jnp.concatenate(
        [jnp.zeros_like(tke[:1]), jnp.maximum(tke_sol, UWTKEMIN),
         tke_sfc[None]], axis=0)

    # ---- tendencies (:675-712) ----------------------------------------
    rdt = 1.0 / dt
    return UWOut(
        uten=(u_new - u) * rdt,
        vten=(v_new - v) * rdt,
        tten=(thx_new - thx) * exnerhl * rdt,
        qvten=(qv_new - qv) * rdt,
        qcten=(qc_new - qc) * rdt,
        qiten=(qi_new - qi) * rdt,
        tketen=(tke_new - tke0) * rdt,
        kth=kth, kzm=kzm,
        kpbl=kmix, zpbl=zpbl)
