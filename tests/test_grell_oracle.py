"""Grell cup oracle — AS74/FC80 closures (VERDICT r4 item 5).

Independent NumPy f64 re-derivation of the reference's Grell scheme
(mod_cu_grell.F90 `cup` body, :460-1235): literal sequential Fortran
loops — the hydrostatic height build, k22/kbcon searches with the
lid-removal and pbcdif retry cycling, cloud-top/kmin selection, the
updraft condensate cascade and cloud work function on all three
states (current / large-scale-forced / cloud-modified), wind-shear
precipitation efficiency, downdraft bu/qrcd/pwcd recursions, the
dellah/dellaq mass-flux response, the AS74 (igcc=1) and FC80 (igcc=2)
closures and the sequential heating-bound feedback — compared against
the port's `cup` on the same columns.

Two knowing deviations from the literal Fortran, both shared with the
port and documented there:
 - detdo (:849) indexes dkk with a stale loop variable (an
   out-of-bounds read after the shear loop); we use dkk(k+1) like the
   adjacent detdoq.
 - the heating-bound feedback (:1108-1118) rescales xmb sequentially
   per level; the port rescales once by the worst level. The fixture
   asserts at most one level triggers so both agree exactly.

This is NOT a fingerprint: every expected number here is derived from
the Fortran formulas by this file alone.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from regcm_tpu.utils import constants as c
from regcm_tpu.physics.cumulus.grell import (
    cup, SHRMIN, SHRMAX, EDTMIN, EDTMAX, PBCMAX, MINCLD, HTMIN,
    HTMAX, DTAUC, ZDETR)

# Flatau 1992 polynomial saturation pressure (Share/pfesat.inc)
_AW = [6.11213476, 0.444007856, 0.143064234e-1, 0.264461437e-3,
       0.305903558e-5, 0.196237241e-7, 0.892344772e-10,
       -0.373208410e-12, 0.209339997e-15]
_AI = [6.11123516, 0.503109514, 0.188369801e-1, 0.420547422e-3,
       0.614396778e-5, 0.602780717e-7, 0.387940929e-9,
       0.149436277e-11, 0.262655803e-14]


def _pfesat(t):
    td = np.clip(t - c.tzero, -75.0, 100.0)
    cw = np.polyval(_AW[::-1], td)
    ci = np.polyval(_AI[::-1], td)
    return np.where(td >= 0.0, cw, ci) * 100.0


def _pfwsat(t, p):
    es = _pfesat(t)
    return c.ep2 * es / (p - es)


K2_CONST, KFAC_SHAL, KFAC_DEEP = 500.0, 0.07, 0.14


def cup_oracle(t_in, q_in, tn_in, qo_in, p, psur, ter11, vsp, dtime,
               igcc, kbmax0, htmax=HTMAX, htmin=HTMIN, debug=None):
    """Literal 0-based bottom-up transcription of cup (:460-1235)."""
    ncol, kz = t_in.shape
    mbdt = dtime * 5.0e-3
    outt = np.zeros((ncol, kz))
    outq = np.zeros((ncol, kz))
    pratec = np.zeros(ncol)
    cldfrc = np.zeros((ncol, kz))
    kbcon_o = np.full(ncol, -1)
    ktop_o = np.full(ncol, -1)
    active = np.zeros(ncol, bool)
    cover = dict(retry=0, deep=0, inactive=0, closure_neg=0,
                 htcap=0)

    for n in range(ncol):
        t = t_in[n].copy()
        q = q_in[n].copy()
        tn = tn_in[n].copy()
        qo = qo_in[n].copy()
        pn = p[n]
        # ---- environment (:490-535) ---------------------------
        qes = np.maximum(_pfwsat(t, pn * 100.0), c.minqq)
        qeso = np.maximum(_pfwsat(tn, pn * 100.0), c.minqq)
        q = np.minimum(q, qes)
        qo = np.minimum(qo, qeso)
        tv = t * (1 + c.ep1 * q)
        tvo = tn * (1 + c.ep1 * qo)
        z = np.zeros(kz)
        zo = np.zeros(kz)
        z[0] = ter11[n] - (np.log(pn[0]) - np.log(psur[n])) \
            * c.rgas * tv[0] * c.regrav
        zo[0] = ter11[n] - (np.log(pn[0]) - np.log(psur[n])) \
            * c.rgas * tvo[0] * c.regrav
        kdet = 0
        for k in range(1, kz):
            z[k] = z[k - 1] - (np.log(pn[k]) - np.log(pn[k - 1])) \
                * c.rgas * 0.5 * (tv[k] + tv[k - 1]) * c.regrav
            zo[k] = zo[k - 1] - (np.log(pn[k]) - np.log(pn[k - 1])) \
                * c.rgas * 0.5 * (tvo[k] + tvo[k - 1]) * c.regrav
            if z[k] > ZDETR + ter11[n]:
                kdet = k
        he = np.minimum(c.egrav * z + c.cpd * t + c.wlhv * q,
                        c.egrav * z + c.cpd * t + c.wlhv * qes)
        hes = c.egrav * z + c.cpd * t + c.wlhv * qes
        heo = np.minimum(c.egrav * zo + c.cpd * tn + c.wlhv * qo,
                         c.egrav * zo + c.cpd * tn + c.wlhv * qeso)
        heso = c.egrav * zo + c.cpd * tn + c.wlhv * qeso
        qrcd = np.zeros(kz)
        qrcd[:-1] = 0.5 * (qes[:-1] + qes[1:])
        # ---- k22: max he in [0, kbmax] ------------------------
        kbmax = kbmax0
        k22 = int(np.argmax(he[:kbmax + 1]))
        if k22 >= kbmax:
            cover["inactive"] += 1
            continue
        hkb = 0.5 * (he[k22] + he[k22 + 1])
        qkb = 0.5 * (q[k22] + q[k22 + 1])
        hkbo = 0.5 * (heo[k22] + heo[k22 + 1])
        # dkk
        dkk = np.ones(kz)
        kdet_f = kdet + 1                 # reference 1-based kdet
        for kp in range(kdet_f):
            dkk[kp] = kp / kdet_f
        # ---- cloudbase with retry (:560-616) ------------------
        dead = False
        while True:
            kb = k22
            kbcon = kb
            while hkb < 0.5 * (hes[kbcon]
                               + hes[min(kbcon + 1, kz - 1)]):
                kbcon += 1
                if kbcon > kbmax:
                    dead = True
                    break
            if dead:
                break
            kbcono = kbcon
            while True:
                if kbcono > kbmax:
                    dead = True
                    break
                if hkbo < 0.5 * (heso[kbcono]
                                 + heso[min(kbcono + 1, kz - 1)]):
                    kbcono += 1
                    continue
                break
            if dead:
                break
            kbcon = kbcono
            pbcdif = pn[kb] - pn[kbcon]
            if pbcdif > PBCMAX:
                cover["retry"] += 1
                k22 += 1
                if k22 >= kbmax:
                    dead = True
                    break
                hkb = 0.5 * (he[k22] + he[k22 + 1])
                qkb = 0.5 * (q[k22] + q[k22 + 1])
                hkbo = 0.5 * (heo[k22] + heo[k22 + 1])
                continue
            break
        if dead:
            cover["inactive"] += 1
            continue
        # ---- cloud top (:624-655) -----------------------------
        dby = np.zeros(kz)
        dbyo = np.zeros(kz)
        dby[kz - 1] = hkb - hes[kz - 1]
        dbyo[kz - 1] = hkbo - heso[kz - 1]
        for k in range(kz - 1):
            dby[k] = hkb - 0.5 * (hes[k] + hes[k + 1])
            dbyo[k] = hkbo - 0.5 * (heso[k] + heso[k + 1])
        ktop = -1
        for k in range(kbcon, kz):
            if dby[k] <= 0.0:
                ktop = k
                break
        if ktop < 0 or pn[kbcon] - pn[ktop] < MINCLD:
            cover["inactive"] += 1
            continue
        # ---- kmin (:661-671) ----------------------------------
        kmin = kb + int(np.argmin(he[kb:ktop + 1]))
        if kmin <= 2:                     # reference 1-based <= 3
            cover["inactive"] += 1
            continue
        # ---- updraft cascade + cwf (:672-733) -----------------
        def updraft_np(qck, dbyX, qesX, tX, zX):
            pwc = np.zeros(kz)
            pwcav = 0.0
            cwf = 0.0
            for k in range(1, kz - 1):
                if kbcon < k < ktop:
                    agam = c.wlhvocp * (c.wlhv / (c.rwat * tX[k] ** 2)) \
                        * qesX[k]
                    agam0 = c.wlhvocp * (c.wlhv
                                         / (c.rwat * tX[k - 1] ** 2)) \
                        * qesX[k - 1]
                    qrch = qesX[k] + c.rwlhv * (agam / (1 + agam)) \
                        * dbyX[k]
                    pwc[k] = qck - qrch
                    qck = qrch
                    pwcav += pwc[k]
                    dz1 = zX[k] - zX[k - 1]
                    cwf += dz1 * (c.egrav / (c.cpd * 0.5
                                             * (tX[k] + tX[k - 1]))) \
                        * dbyX[k - 1] / (1 + 0.5 * (agam + agam0))
            pwc[ktop] = qck - qesX[ktop]
            pwcav += pwc[ktop]
            return pwc, pwcav, cwf

        pwc, pwcav, xac = updraft_np(qkb, dby, qes, t, z)
        qkbo = 0.5 * (qo[k22] + qo[k22 + 1])
        pwco, pwcavo, xao = updraft_np(qkbo, dbyo, qeso, tn, zo)
        # ---- shear-based efficiency (:736-760) ----------------
        vshear = 0.0
        sdp = 0.0
        for kk in range(min(ktop, kz - 2) + 1):
            if kk >= kbcon:
                vshear += (vsp[n, kk + 1] - vsp[n, kk]
                           / (z[kk + 1] - z[kk])) \
                    * (pn[kk] - pn[kk + 1])
                sdp += pn[kk] - pn[kk + 1]
        vshear = vshear * 1000.0 / sdp
        edt = 1.0 - (1.591 - 0.639 * vshear + 0.0953 * vshear ** 2
                     - 0.00496 * vshear ** 3)
        edt = min(max(edt, SHRMIN), SHRMAX)
        edto = edt
        edtx = edt
        qrcd[kz - 1] = qes[kz - 1]
        hcd = 0.5 * (he[kmin] + he[kmin + 1])
        qcd = 0.5 * (q[kmin] + q[kmin + 1])
        hcdo = 0.5 * (heo[kmin] + heo[kmin + 1])
        qcdo = 0.5 * (qo[kmin] + qo[kmin + 1])
        # ---- downdraft bu/qrcd/pwcd (:766-795) ----------------
        def downdraft_np(hcdX, qcdX, hesX, qesX, tX, zX, qrcdX):
            bu = 0.0
            pwcev = 0.0
            pwcd = np.zeros(kz)
            for kk in range(kmin - 1, -1, -1):
                dz = -0.5 * (zX[kk] - zX[min(kk + 2, kz - 1)])
                dh = hcdX - 0.5 * (hesX[kk] + hesX[kk + 1])
                bu += dz * dh
                dq = 0.5 * (qesX[kk] + qesX[kk + 1])
                dtm = 0.5 * (tX[kk] + tX[kk + 1])
                agam = c.wlhvocp * (c.wlhv / (c.rwat * dtm ** 2)) * dq
                qrcdX[kk] = dq + c.rwlhv * (agam / (1 + agam)) * dh
                pwcd[kk] = dkk[kk] * (qcdX - qrcdX[kk])
                qcdX = qrcdX[kk]
                pwcev += pwcd[kk]
            return bu, pwcev, pwcd

        qrcdo = np.zeros(kz)
        bu, pwcev, pwcd = downdraft_np(hcd, qcd, hes, qes, t, z,
                                       qrcd)
        buo, pwcevo, pwcdo = downdraft_np(hcdo, qcdo, heso, qeso,
                                          tn, zo, qrcdo)
        if bu >= 0.0 or buo >= 0.0 or pwcev >= 0.0 or pwcevo >= 0.0:
            cover["inactive"] += 1
            continue
        edt = min(max(-edt * pwcav / pwcev, EDTMIN), EDTMAX)
        edto = min(max(-edto * pwcavo / pwcevo, EDTMIN), EDTMAX)
        # ---- dellah/dellaq (:815-905) -------------------------
        dellah = np.zeros(kz)
        dellaq = np.zeros(kz)
        dellat = np.zeros(kz)
        xhe = he.copy()
        xq = q.copy()
        xt = t.copy()
        dp_s = 50.0 * (psur[n] - pn[1])
        dellah[0] = edt * (dkk[1] * hcd
                           - dkk[1] * 0.5 * (he[0] + he[1])) \
            * c.egrav / dp_s
        dellaq[0] = edt * (dkk[1] * qrcd[1]
                           - dkk[0] * 0.5 * (q[0] + q[1])) \
            * c.egrav / dp_s
        for k in range(kz):
            if k == 0 or (0 < k < ktop):
                if k > 0:
                    dv1 = 0.5 * (he[k] + he[k + 1])
                    dv2 = he[k]
                    dv3 = 0.5 * (he[k] + he[k - 1])
                    dv1q = 0.5 * (q[k] + q[k + 1])
                    dv2q = q[k]
                    dv3q = 0.5 * (q[k] + q[k - 1])
                    detdo = (dkk[k + 1] - dkk[k]) * (hcd - dv2)
                    detdoq = (dkk[k + 1] - dkk[k]) * (qrcd[k] - dv2q)
                    aup = 0.0 if k <= k22 else 1.0
                    adw = 0.0 if k > kmin else 1.0
                    dpi = 1.0 / (50.0 * (pn[k - 1] - pn[k + 1]))
                    dellah[k] = ((aup - adw * dkk[k + 1] * edt)
                                 * (dv1 - dv2)
                                 + (aup - adw * dkk[k] * edt)
                                 * (dv2 - dv3)) * c.egrav * dpi \
                        + adw * edt * detdo * c.egrav * dpi
                    dellaq[k] = ((aup - adw * dkk[k + 1] * edt)
                                 * (dv1q - dv2q)
                                 + (aup - adw * dkk[k] * edt)
                                 * (dv2q - dv3q)) * c.egrav * dpi \
                        + adw * edt * detdoq * c.egrav * dpi
                xhe[k] = dellah[k] * mbdt + he[k]
                xq[k] = dellaq[k] * mbdt + q[k]
                dellat[k] = c.rcpd * (dellah[k] - c.wlhv * dellaq[k])
                xt[k] = mbdt * dellat[k] + t[k]
                if xq[k] <= 0.0:
                    xq[k] = c.minqq
        # cloud top (:884-900)
        k = ktop
        dp_s = 100.0 * (pn[k - 1] - pn[k])
        dellah[k] = (hkb - 0.5 * (he[k] + he[k - 1])) * c.egrav / dp_s
        dellaq[k] = (qes[k] - 0.5 * (q[k] + q[k - 1])) \
            * c.egrav / dp_s
        xhe[k] = dellah[k] * mbdt + he[k]
        xq[k] = dellaq[k] * mbdt + q[k]
        dellat[k] = c.rcpd * (dellah[k] - c.wlhv * dellaq[k])
        xt[k] = mbdt * dellat[k] + t[k]
        if xq[k] <= 0.0:
            xq[k] = c.minqq
        xhkb = dellah[kbcon] * mbdt + hkb
        xqkb = dellaq[kbcon] * mbdt + qkb
        if xqkb <= 0.0:
            xqkb = c.minqq
        # ---- x environment (:906-948) -------------------------
        xqes = _pfwsat(xt, pn * 100.0)
        xq = np.minimum(xq, xqes)
        xtv = xt * (1 + c.ep1 * xq)
        xz = np.zeros(kz)
        xz[0] = ter11[n] - (np.log(pn[0]) - np.log(psur[n])) \
            * c.rgas * xtv[0] * c.regrav
        for k in range(1, kz):
            xz[k] = xz[k - 1] \
                - (np.log(pn[k]) - np.log(pn[k - 1])) * c.rgas \
                * 0.5 * (xtv[k] + xtv[k - 1]) * c.regrav
        xhes = c.egrav * xz + c.cpd * xt + c.wlhv * xqes
        xhe = np.minimum(xhe, xhes)
        # ---- x updraft (:952-996) -----------------------------
        xdby = np.zeros(kz)
        xdby[kz - 1] = xhkb - xhes[kz - 1]
        if xac >= 0.0:
            for k in range(kz - 1):
                xdby[k] = xhkb - 0.5 * (xhes[k] + xhes[k + 1])
            xpwc, xpwcav, xxac = updraft_np(xqkb, xdby, xqes, xt, xz)
            xhcd = 0.5 * (xhe[kmin] + xhe[kmin + 1])
            xqcd = 0.5 * (xq[kmin] + xq[kmin + 1])
            xqrcd = np.zeros(kz)
            xbu, xpwcev, xpwcd = downdraft_np(
                xhcd, xqcd, xhes, xqes, xt, xz, xqrcd)
            if xbu >= 0.0:
                cover["inactive"] += 1
                continue
            if abs(xpwcev) > 1.0e-20:
                edtx = -edtx * xpwcav / xpwcev
            edtx = min(max(edtx, EDTMIN), EDTMAX)
            # ---- downdraft cwf on all three states (:1040-1080)
            for k in range(1, kz):
                if k < kmin:
                    kk = kmin - k
                    a1 = c.wlhvocp * (c.wlhv
                                      / (c.rwat * t[kk] ** 2)) * qes[kk]
                    a2 = c.wlhvocp * (c.wlhv
                                      / (c.rwat * t[kk + 1] ** 2)) \
                        * qes[kk + 1]
                    dtm = 0.5 * (t[kk] + t[kk + 1])
                    dg = 0.5 * (a1 + a2)
                    dh = 0.5 * (hes[kk] + hes[kk + 1])
                    dz = (z[kk] - z[kk + 1]) * dkk[kk]
                    xac += edt * dz * (c.egrav / (c.cpd * dtm)) \
                        * ((hcd - dh) / (1 + dg))
                    a1 = c.wlhvocp * (c.wlhv
                                      / (c.rwat * tn[kk] ** 2)) \
                        * qeso[kk]
                    a2 = c.wlhvocp * (c.wlhv
                                      / (c.rwat * tn[kk + 1] ** 2)) \
                        * qeso[kk + 1]
                    dtm = 0.5 * (tn[kk] + tn[kk + 1])
                    dg = 0.5 * (a1 + a2)
                    dh = 0.5 * (heso[kk] + heso[kk + 1])
                    dz = (zo[kk] - zo[kk + 1]) * dkk[kk]
                    xao += edto * dz * (c.egrav / (c.cpd * dtm)) \
                        * ((hcdo - dh) / (1 + dg))
                    a1 = c.wlhvocp * (c.wlhv
                                      / (c.rwat * xt[kk] ** 2)) \
                        * xqes[kk]
                    a2 = c.wlhvocp * (c.wlhv
                                      / (c.rwat * xt[kk + 1] ** 2)) \
                        * xqes[kk + 1]
                    dtm = 0.5 * (xt[kk] + xt[kk + 1])
                    dg = 0.5 * (a1 + a2)
                    dh = 0.5 * (xhes[kk] + xhes[kk + 1])
                    dz = (xz[kk] - xz[kk + 1]) * dkk[kk]
                    xxac += edtx * dz * (c.egrav / (c.cpd * dtm)) \
                        * ((xhcd - dh) / (1 + dg))
        # ---- closure (:1086-1102) -----------------------------
        xmb = 0.0
        if xac >= 0.0:
            if igcc == 1:
                f = (xao - xac) / dtime
            else:
                f = xac / DTAUC
            xk = (xxac - xac) / mbdt
            if f <= 0.0 or xk >= 0.0:
                xmb = 0.0
                cover["closure_neg"] += 1
            else:
                xmb = -f / xk
            # ---- sequential heating-bound feedback (:1108-1118)
            ntrig = 0
            for k in range(kz):
                if k <= ktop:
                    outtes = dellat[k] * xmb * c.secpd
                    if outtes > htmax:
                        xmb = 1.001 * htmax / outtes * xmb
                        ntrig += 1
                    elif outtes < htmin:
                        xmb = 1.001 * htmin / outtes * xmb
                        ntrig += 1
            if ntrig:
                cover["htcap"] += 1
            assert ntrig <= 1, \
                "fixture hit the multi-level heating cap edge case"
            # ---- feedback (:1122-1145) ------------------------
            for k in range(kz):
                if k <= ktop:
                    outt[n, k] = dellat[k] * xmb
                    outq[n, k] = dellaq[k] * xmb
                    pratec[n] += (pwc[k] + edt * pwcd[k]) * xmb
                    if k >= kbcon:
                        mflx = max(100.0 * (pn[k] / (c.rgas * t[k]))
                                   * dellah[k] * xmb, 0.0)
                        if z[ktop] - z[kbcon] > 2000.0:
                            cf = KFAC_DEEP * np.log(1 + K2_CONST
                                                    * mflx)
                            cldfrc[n, k] = max(0.01, min(0.6, cf))
                        else:
                            cf = KFAC_SHAL * np.log(1 + K2_CONST
                                                    * mflx)
                            cldfrc[n, k] = max(0.01, min(0.2, cf))
            kbcon_o[n] = kbcon
            ktop_o[n] = ktop
            active[n] = xmb > 0.0
            if debug is not None:
                debug[n] = dict(kmin=kmin, kdet=kdet, dkk=dkk.copy(),
                                xac=xac, xao=xao, xxac=xxac, edt=edt,
                                edtx=edtx, xmb=xmb, hkb=hkb, hcd=hcd,
                                pwcav=pwcav, pwcev=pwcev,
                                dellah=dellah.copy(),
                                dellaq=dellaq.copy(),
                                dellat=dellat.copy(), qrcd=qrcd.copy(),
                                pwc=pwc.copy(), pwcd=pwcd.copy(),
                                xhkb=xhkb, xpwcav=xpwcav,
                                xpwcev=xpwcev)
            if pn[kbcon] - pn[ktop] >= 200.0:
                cover["deep"] += 1
    pratec = np.maximum(pratec, 0.0)
    return (outt, outq, pratec, cldfrc, kbcon_o, ktop_o, active,
            cover)


def _fixture():
    """4 columns, kz=18 bottom-up sigma levels."""
    rng = np.random.default_rng(5)
    ncol, kz = 4, 18
    ptop = 50.0
    # full levels bottom-up, finer near the surface (so an adjacent
    # kbcon sits within pbcmax=50 hPa of the departure level)
    x = np.linspace(0.0, 1.0, kz)
    sig = 0.995 - (0.995 - 0.03) * x ** 1.8
    psur = np.array([1010.0, 995.0, 1002.0, 985.0])
    p = sig[None, :] * (psur[:, None] - ptop) + ptop
    ts = np.array([303.0, 288.0, 300.0, 298.0])
    gam = np.array([0.0078, 0.0050, 0.0076, 0.0075])
    rh0 = np.array([0.97, 0.30, 0.95, 0.94])
    ztr = np.array([7000.0, 9000.0, 5200.0, 3500.0])
    ghi = np.array([0.0015, 0.0050, 0.0008, 0.0005])
    t = np.zeros((ncol, kz))
    for n in range(ncol):
        zz = 287.0 * 265.0 / 9.81 * np.log(psur[n] / p[n])
        t[n] = np.maximum(
            ts[n] - gam[n] * np.minimum(zz, ztr[n])
            - ghi[n] * np.maximum(zz - ztr[n], 0.0), 205.0)
    t += rng.normal(0.0, 0.1, t.shape)
    qs = _pfwsat(t, p * 100.0)
    rhprof = rh0[:, None] * np.linspace(1.0, 0.25, kz)[None, :]
    del ztr, ghi
    q = np.clip(qs * rhprof, 1e-7, None)
    # forced state: gentle large-scale warming aloft + moistening
    tn = t + rng.normal(0.1, 0.05, t.shape)
    qo = np.clip(q * (1.0 + rng.normal(0.02, 0.01, q.shape)), 1e-7,
                 None)
    vsp = np.abs(rng.normal(5.0, 3.0, (ncol, kz))) \
        + np.linspace(0.0, 12.0, kz)[None, :]
    ter11 = np.array([50.0, 400.0, 10.0, 150.0])
    kbmax0 = int((sig > 0.4).sum()) - 1
    return t, q, tn, qo, p, psur, ter11, vsp, kbmax0


@pytest.mark.parametrize("igcc", [1, 2])
def test_cup_vs_fortran_oracle(igcc):
    t, q, tn, qo, p, psur, ter11, vsp, kbmax0 = _fixture()
    dtime = 300.0
    (outt_e, outq_e, prate_e, cldf_e, kbcon_e, ktop_e, act_e,
     cover) = cup_oracle(t, q, tn, qo, p, psur, ter11, vsp, dtime,
                         igcc, kbmax0)
    assert act_e.any(), "no active column in fixture"
    assert (~act_e).any(), "no inactive column in fixture"
    assert cover["deep"] > 0 and cover["htcap"] > 0

    out = cup(jnp.asarray(t), jnp.asarray(q), jnp.asarray(tn),
              jnp.asarray(qo), jnp.asarray(p), jnp.asarray(psur),
              jnp.asarray(ter11), jnp.asarray(vsp), dtime,
              igcc=igcc, kbmax=kbmax0)
    act = np.asarray(out.active)
    np.testing.assert_array_equal(act, act_e)
    np.testing.assert_array_equal(np.asarray(out.kbcon)[act_e],
                                  kbcon_e[act_e])
    np.testing.assert_array_equal(np.asarray(out.ktop)[act_e],
                                  ktop_e[act_e])
    np.testing.assert_allclose(np.asarray(out.outt), outt_e,
                               rtol=1e-9, atol=1e-16)
    np.testing.assert_allclose(np.asarray(out.outq), outq_e,
                               rtol=1e-9, atol=1e-19)
    np.testing.assert_allclose(np.asarray(out.pratec), prate_e,
                               rtol=1e-9, atol=1e-16)
    np.testing.assert_allclose(np.asarray(out.cldfrc), cldf_e,
                               rtol=1e-9, atol=1e-12)


def test_cup_oracle_retry_branch():
    """A warm dry nose above the departure level pushes the LFC more
    than pbcmax=50 hPa up, forcing the reference's cloudbase retry
    cycle (:597-612: k22 walks upward, search restarts at kb=k22).
    Here the retry exhausts kbmax and the column must go INACTIVE in
    both the oracle and the port — a column that stays active with a
    far-away kbcon would mean the retry was skipped."""
    t, q, tn, qo, p, psur, ter11, vsp, kbmax0 = _fixture()
    t2 = t.copy()
    q2 = q.copy()
    tn2 = tn.copy()
    qo2 = qo.copy()
    span, bump, dryf = 8, 2.5, 0.25
    t2[0, 1:span] += bump * np.exp(-np.arange(1, span) / 4.0)
    tn2[0, 1:span] = t2[0, 1:span] + 0.1
    q2[0, 1:span] *= dryf
    qo2[0, 1:span] = q2[0, 1:span] * 1.02
    (outt_e, outq_e, prate_e, cldf_e, kbcon_e, ktop_e, act_e,
     cover) = cup_oracle(t2, q2, tn2, qo2, p, psur, ter11, vsp,
                         300.0, 2, kbmax0)
    assert cover["retry"] > 0, "fixture did not trigger the retry"
    assert not act_e[0]
    assert act_e.any()
    out = cup(jnp.asarray(t2), jnp.asarray(q2), jnp.asarray(tn2),
              jnp.asarray(qo2), jnp.asarray(p), jnp.asarray(psur),
              jnp.asarray(ter11), jnp.asarray(vsp), 300.0,
              igcc=2, kbmax=kbmax0)
    np.testing.assert_array_equal(np.asarray(out.active), act_e)
    np.testing.assert_allclose(np.asarray(out.outt), outt_e,
                               rtol=1e-9, atol=1e-16)
    np.testing.assert_allclose(np.asarray(out.outq), outq_e,
                               rtol=1e-9, atol=1e-19)
    np.testing.assert_allclose(np.asarray(out.pratec), prate_e,
                               rtol=1e-9, atol=1e-16)


@pytest.mark.parametrize("igcc", [1, 2])
def test_cup_closure_uncapped(igcc, monkeypatch):
    """With the heating bound lifted, xmb is purely the closure's
    -f/xk — AS74 and FC80 then produce DIFFERENT mass fluxes, which
    pins the f and xk algebra itself (the capped main fixture pins
    the cap formula instead)."""
    import regcm_tpu.physics.cumulus.grell as G
    monkeypatch.setattr(G, "HTMAX", 1.0e6)
    monkeypatch.setattr(G, "HTMIN", -1.0e6)
    t, q, tn, qo, p, psur, ter11, vsp, kbmax0 = _fixture()
    (outt_e, outq_e, prate_e, cldf_e, kbcon_e, ktop_e, act_e,
     cover) = cup_oracle(t, q, tn, qo, p, psur, ter11, vsp, 300.0,
                         igcc, kbmax0, htmax=1.0e6, htmin=-1.0e6)
    assert cover["htcap"] == 0
    assert act_e.any()
    out = G.cup(jnp.asarray(t), jnp.asarray(q), jnp.asarray(tn),
                jnp.asarray(qo), jnp.asarray(p), jnp.asarray(psur),
                jnp.asarray(ter11), jnp.asarray(vsp), 300.0,
                igcc=igcc, kbmax=kbmax0)
    np.testing.assert_array_equal(np.asarray(out.active), act_e)
    np.testing.assert_allclose(np.asarray(out.pratec), prate_e,
                               rtol=1e-9, atol=1e-16)
    np.testing.assert_allclose(np.asarray(out.outt), outt_e,
                               rtol=1e-9, atol=1e-16)
    np.testing.assert_allclose(np.asarray(out.outq), outq_e,
                               rtol=1e-9, atol=1e-19)


def test_cup_closures_differ_uncapped(monkeypatch):
    """AS74 vs FC80 must give different uncapped precipitation."""
    import regcm_tpu.physics.cumulus.grell as G
    monkeypatch.setattr(G, "HTMAX", 1.0e6)
    monkeypatch.setattr(G, "HTMIN", -1.0e6)
    t, q, tn, qo, p, psur, ter11, vsp, kbmax0 = _fixture()
    r1 = cup_oracle(t, q, tn, qo, p, psur, ter11, vsp, 300.0, 1,
                    kbmax0, htmax=1.0e6, htmin=-1.0e6)
    r2 = cup_oracle(t, q, tn, qo, p, psur, ter11, vsp, 300.0, 2,
                    kbmax0, htmax=1.0e6, htmin=-1.0e6)
    act = r1[6] & r2[6]
    assert act.any()
    assert not np.allclose(r1[2][act], r2[2][act])
