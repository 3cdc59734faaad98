"""Generic batched gas-phase kinetics: tensors + Rosenbrock solver.

One machinery for every KPP-generated mechanism the reference ships
(CBMZ ``GAS_CBMZ_NEW/``, CB6r2 ``GAS_CB6r2/``): a mechanism is three
extracted tensors — a (nreact, ≤3) reactant-index table, a dense
(nvar, nreact) stoichiometry matrix, and an ``update_rconst`` rate
function — and the solver is a batched adaptive two-stage Rosenbrock
(Ros2, L-stable; Verwer et al. 1999 / the KPP ros2 tableau) over all
grid cells at once:

- rates:    a_r = rconst_r · Π_s c[idx_{r,s}]   (gather + product)
- vdot:     S @ a                               (MXU matmul)
- Jacobian: ∂a_r/∂c_j per reactant slot as rconst·(product of the
  other slots), scattered through constant one-hot matrices — three
  einsums, exact, no autodiff retracing
- stage solves: batched LU of P = I/(hγ) − J, two back-solves/step

DOCUMENTED DEVIATION: the reference's per-cell LSODE/BDF
(``mod_cbmz_integrator.F90`` / ``mod_cb6_Integrator.F90``, rtol =
atol = 0.1) → batched Ros2.  At those loose tolerances the
integrators agree on the solution (box-model oracles in
tests/test_cbmz.py and tests/test_cb6.py against scipy BDF); a
fixed-structure Rosenbrock is the jit/batch-friendly choice
(data-dependent BDF order/step logic cannot batch on TPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Ros2 tableau (gamma = 1 + 1/sqrt(2); KPP ros2 coefficients)
_G = 1.0 + 1.0 / np.sqrt(2.0)
_A21 = 1.0 / _G
_C21 = -2.0 / _G
_M1, _M2 = 3.0 / (2.0 * _G), 1.0 / (2.0 * _G)
_E1, _E2 = 1.0 / (2.0 * _G), 1.0 / (2.0 * _G)


class GasKinetics:
    """Mechanism-bound kinetics; ``mech`` is a generated
    ``_*_mech_data`` module (NVAR/NFIX/NREACT, STOICH, REACT_IDX)."""

    def __init__(self, mech):
        self.mech = mech
        self.nvar = mech.NVAR
        self.nfix = mech.NFIX
        self.nreact = mech.NREACT
        self._S = jnp.asarray(mech.STOICH)
        self._IDX = jnp.asarray(mech.REACT_IDX)
        es = []
        for s in range(mech.REACT_IDX.shape[1]):
            e = np.zeros((self.nreact, self.nvar))
            for r in range(self.nreact):
                ix = mech.REACT_IDX[r, s]
                if ix < self.nvar:
                    e[r, ix] = 1.0
            es.append(jnp.asarray(e))
        self._E = es
        # one jit cache per mechanism instance (module-level singletons)
        self.integrate = jax.jit(partial(_integrate, self),
                                 static_argnames=("max_steps",))

    def fun(self, var, fix, rconst):
        """vdot (…, nvar)."""
        one = jnp.ones(var.shape[:-1] + (1,), var.dtype)
        c = jnp.concatenate([var, fix, one], axis=-1)
        f = c[..., self._IDX]                      # (…, nreact, nslot)
        a = rconst
        for s in range(len(self._E)):              # fixed multiply
            a = a * f[..., s]                      # order (batch-size
        return a @ self._S.T                       # independent)

    def jac(self, var, fix, rconst):
        """Dense Jacobian (…, nvar, nvar) of fun w.r.t. var."""
        one = jnp.ones(var.shape[:-1] + (1,), var.dtype)
        c = jnp.concatenate([var, fix, one], axis=-1)
        f = c[..., self._IDX]
        nslot = len(self._E)
        j = 0.0
        for s in range(nslot):
            others = rconst
            for s2 in range(nslot):
                if s2 != s:
                    others = others * f[..., s2]
            j = j + jnp.einsum("vr,...r,rj->...vj", self._S, others,
                               self._E[s])
        return j


def _integrate(kin, var0, fix, rconst, tend, rtol=0.1, atol=0.1,
               hstart=1.0e-5, hmin=1.0e-8, max_steps=120):
    """Batched adaptive Ros2 from t=0 to tend.

    var0 (n, nvar) molec/cm³; fix (n, nfix); rconst (n, nreact); tend
    scalar seconds.  Columns advance independently (masked); the loop
    exits when every column reaches tend or max_steps is hit
    (remaining columns keep their last state).  The integration starts
    at a tiny h (1e-5 s) exactly because the radical spin-up from the
    zeroed non-transported species (µs lifetimes) must be resolved
    before the controller grows the step — the same path LSODE takes
    from its small initial step; growth factor ≤10 reaches 900 s in
    ~20 accepted steps."""
    n = var0.shape[0]
    dtype = var0.dtype
    eye = jnp.eye(kin.nvar, dtype=dtype)

    def cond(st):
        t, y, h, it = st
        return jnp.logical_and(jnp.any(t < tend), it < max_steps)

    def body(st):
        t, y, h, it = st
        active = t < tend
        hh = jnp.minimum(h, tend - t)
        hh = jnp.maximum(hh, hmin)
        f0 = kin.fun(y, fix, rconst)
        j0 = kin.jac(y, fix, rconst)
        p = eye / (hh * _G)[:, None, None] - j0
        lu, piv = jax.scipy.linalg.lu_factor(p)
        k1 = jax.scipy.linalg.lu_solve((lu, piv), f0)
        y2 = y + _A21 * k1
        f2 = kin.fun(jnp.maximum(y2, 0.0), fix, rconst)
        rhs2 = f2 + (_C21 / hh)[:, None] * k1
        k2 = jax.scipy.linalg.lu_solve((lu, piv), rhs2)
        ynew = y + _M1 * k1 + _M2 * k2
        yerr = _E1 * k1 + _E2 * k2
        sc = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(ynew))
        err = jnp.sqrt(jnp.mean((yerr / sc) ** 2, axis=-1))
        err = jnp.maximum(err, 1e-10)
        accept = err <= 1.0
        fac = jnp.clip(0.9 * err ** -0.5, 0.2, 10.0)
        hnew = jnp.clip(hh * fac, hmin, tend)
        upd = active & accept
        y = jnp.where(upd[:, None], jnp.maximum(ynew, 0.0), y)
        t = jnp.where(upd, t + hh, t)
        h = jnp.where(active, hnew, h)
        return (t, y, h, it + 1)

    t0 = jnp.zeros((n,), dtype)
    h0 = jnp.full((n,), 1.0, dtype) * jnp.minimum(
        jnp.asarray(hstart, dtype), jnp.asarray(tend, dtype))
    _, y, _, _ = jax.lax.while_loop(
        cond, body, (t0, var0, h0, jnp.asarray(0)))
    return y
