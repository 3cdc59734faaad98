"""Gas-phase chemistry model coupling — the ``chemistry`` equivalent
(``Main/chemlib/mod_che_chemistry.F90:50-147``), mechanism-generic
(CBMZ and CB6r2 instantiations below).

Per call: convert the transported tracers (uncoupled kg/kg) to
molec/cm³ with ``cfactor = ρ·1e-3·N_A`` and the per-tracer molecular
weight (:68,:101), seed every NON-transported species at zero exactly
as the reference does (the ``chemall`` restore at :93-97 is commented
out there), set the mechanism's fixed species, compute photolysis
from the cosine zenith + cloud optical depths above/below each layer
(``ichjphcld``, :76-83), integrate the mechanism with the batched
Rosenbrock (``kinetics.GasKinetics``), and return the coupled tracer
tendency.

DOCUMENTED DEVIATIONS
- solver cadence: the reference solves every ``dtchsolv`` = 900 s and
  applies the held tendency each dt; here the solver runs every
  chemistry call over ``dt`` — better time-resolved, avoids a held
  chemten state slot.  (The reference itself notes the smoothing is a
  cost optimization, mod_che_tend.F90:523-529.)  The two cadences'
  trajectories are compared in tests/test_cbmz.py::test_cadence.
- stratosphere skip: cells with p < 10 kPa (and the topmost level,
  kmin=2) get zero chemistry tendency, standing in for the
  ``cptrop`` tropopause test (:65).
- photolysis: MCM analytic fits replace the absent TUVGRID2 table
  (see jvalues.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BOLTZ = 1.380658e-23       # J/K
NAVGDR = 6.02214129e23
AMW_H2O = 18.0


class GasChemDriver:
    """Bound to one grid/config + mechanism; called from ChemTend.

    ``mech``: generated ``_*_mech_data`` module; ``kin``: the
    mechanism's GasKinetics; ``jval_fn(coszen, alt, ta, tb)``;
    ``fix_fn(c_m, wtr)`` → (…, nfix) fixed species; ``h2o_var``:
    variable-species index of water (CBMZ) or None when water is a
    fixed species (CB6)."""

    def __init__(self, cfg, grid, spec, mech, kin, jval_fn, fix_fn,
                 h2o_var=None, dtype=None):
        self.cfg = cfg
        self.spec = spec
        self.mech = mech
        self.kin = kin
        self.jval_fn = jval_fn
        self.fix_fn = fix_fn
        self.h2o_var = h2o_var
        # tracers absent from the mechanism (aerosols, inert NH3 in
        # the DCCB set) are skipped — the reference's indcbmz<0 guard
        # (mod_che_chemistry.F90:100,135)
        self.indmech = np.array(
            [mech.SPECIES.index(n) if n in mech.SPECIES else -1
             for n in spec.names], np.int32)
        self.mw = np.array([mech.MW[i] if i >= 0 else 1.0
                            for i in self.indmech])
        self.kmin = 1              # skip topmost level (kmin=2 1-based)
        self.ptrop_pa = 1.0e4      # stratosphere cutoff
        self.ichjphcld = int(getattr(cfg.chem, "ichjphcld", 1))

    def __call__(self, atms, s, chib, cpl, dt):
        """Coupled chemistry tendency (ntr, kz, iy, jx)."""
        ntr, kz, iy, jx = chib.shape
        nvar = self.kin.nvar
        tb3 = atms["tb3"]
        pb3 = atms["pb3"]                       # Pa
        rho = atms["rhob3"]
        rpsb = atms.get("rpsb")
        chi = jnp.maximum(chib * rpsb[None], 0.0) if rpsb is not None \
            else jnp.maximum(chib, 0.0)
        qv = jnp.maximum(atms["qvb3"], 0.0)

        cfactor = rho * 1.0e-3 * NAVGDR         # (kg/kg)·cf/mw → molec/cm³
        c_m = pb3 / (BOLTZ * tb3) * 1.0e-6      # air molec/cm³

        # photolysis: cloud optical depth above/below each layer from
        # the cloud water path (τ ≈ 0.15·LWP[g/m²] at re = 10 µm)
        coszen = atms.get("coszrs", jnp.zeros((iy, jx), tb3.dtype))
        if self.ichjphcld == 1:
            lwp = atms["qcb3"] * rho * atms["dzq"] * 1.0e3   # g/m²
            tau = 0.15 * lwp
            cum = jnp.cumsum(tau, axis=0)
            tau_above = cum - tau
            tau_below = cum[-1][None] - cum
        else:
            tau_above = tau_below = jnp.zeros_like(tb3)
        alt_km = atms["za"] * 1.0e-3
        jv = self.jval_fn(coszen, alt_km, tau_above, tau_below)

        # rate constants (nreact, kz, iy, jx)
        rconst = self.mech.update_rconst(tb3, c_m, jv)

        # pack concentrations: (ncell, nvar)
        ncell = kz * iy * jx
        flat = lambda a: a.reshape((-1, ncell)).T
        var0 = jnp.zeros((ncell, nvar), tb3.dtype)
        cf_flat = flat(cfactor[None])[:, 0]
        for n in range(ntr):
            if self.indmech[n] < 0:
                continue
            conc = flat(chi[n][None])[:, 0] * cf_flat / self.mw[n]
            var0 = var0.at[:, self.indmech[n]].set(conc)
        wtr = flat(qv[None])[:, 0] * cf_flat / AMW_H2O
        if self.h2o_var is not None:
            var0 = var0.at[:, self.h2o_var].set(wtr)
        m_flat = flat(c_m[None])[:, 0]
        fix = self.fix_fn(m_flat, wtr)
        rc_flat = rconst.reshape((self.kin.nreact, ncell)).T

        varo = self.kin.integrate(var0, fix, rc_flat, dt)

        # tendency back to coupled kg/kg/s (chemistry :126-143)
        solve = (pb3 > self.ptrop_pa) & \
            (jnp.arange(kz)[:, None, None] >= self.kmin)
        chemten = jnp.zeros_like(chib)
        dvar = (varo - var0).T.reshape((nvar, kz, iy, jx))
        pfact = cpl[None] / cfactor / dt
        for n in range(ntr):
            if self.indmech[n] < 0:
                continue
            ten = dvar[self.indmech[n]] * pfact * self.mw[n]
            chemten = chemten.at[n].set(jnp.where(solve, ten, 0.0))
        return chemten


def CbmzDriver(cfg, grid, spec, dtype=None):
    """CBMZ instantiation: H2O is a VARIABLE species; fixed = O2/N2 at
    0.22/0.78·M (``chemmain``, mod_cbmz_main.F90:96-97 — the
    reference's 0.22 quirk kept)."""
    from . import _cbmz_mech_data as M
    from .cbmz import KIN
    from .jvalues import cbmz_jvals

    def fix_fn(c_m, wtr):
        return jnp.stack([0.22 * c_m, 0.78 * c_m], axis=-1)

    return GasChemDriver(cfg, grid, spec, M, KIN, cbmz_jvals, fix_fn,
                         h2o_var=M.SPECIES.index("H2O"), dtype=dtype)


def Cb6Driver(cfg, grid, spec, dtype=None):
    """CB6r2 instantiation: water is the WTR FIXED species
    (mod_cb6_Main.F90:107)."""
    from . import _cb6_mech_data as M
    from .cb6 import KIN, cb6_jvals, fixed_species

    return GasChemDriver(cfg, grid, spec, M, KIN, cb6_jvals,
                         fixed_species, h2o_var=None, dtype=dtype)
