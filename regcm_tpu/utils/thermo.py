"""Moist thermodynamics helper functions (jax.numpy, jit-safe).

Re-implements the reference's thermodynamic include-file functions:
``Share/pfesat.inc`` (Flatau et al. 1992 polynomial saturation vapour
pressure), ``Share/pfqsat.inc`` (saturation specific humidity),
``Share/mod_humid.F90`` conversions, and the latent-heat/virtual-
temperature helpers used across the physics libraries. All functions are
elementwise on arrays of any shape and dtype-preserving.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import constants as c

# Flatau et al. (1992) polynomial coefficients — water (0..100 C)
_AW = (6.11213476, 0.444007856, 0.143064234e-01, 0.264461437e-03,
       0.305903558e-05, 0.196237241e-07, 0.892344772e-10,
       -0.373208410e-12, 0.209339997e-15)
# ice (-75..0 C)
_AI = (6.11123516, 0.503109514, 0.188369801e-01, 0.420547422e-03,
       0.614396778e-05, 0.602780717e-07, 0.387940929e-09,
       0.149436277e-11, 0.262655803e-14)


def _poly8(td, a):
    r = a[8]
    for k in range(7, -1, -1):
        r = a[k] + td * r
    return r


def pfesat(t):
    """Saturation vapour pressure (Pa) over water/ice (Share/pfesat.inc)."""
    td = jnp.clip(t - c.tzero, -75.0, 100.0)
    esw = _poly8(td, _AW)
    esi = _poly8(td, _AI)
    return jnp.where(td >= 0.0, esw, esi) * 100.0


def pfwsat(t, p, e=None):
    """Saturation mixing ratio (kg/kg dry air)."""
    es = pfesat(t) if e is None else e
    return c.ep2 * (es / (p - es))


def pfqsat(t, p, e=None):
    """Saturation specific humidity (kg/kg) (Share/pfqsat.inc)."""
    ws = pfwsat(t, p, e)
    return ws / (1.0 + ws)


def pfesat_water(t):
    td = jnp.clip(t - c.tzero, -75.0, 100.0)
    return _poly8(td, _AW) * 100.0


def pfesat_ice(t):
    td = jnp.clip(t - c.tzero, -75.0, 100.0)
    return _poly8(td, _AI) * 100.0


def pfqsdt(t, p):
    """d(qsat)/dT at constant p (finite Clausius-Clapeyron form used by
    SUBEX and PBL schemes)."""
    es = pfesat(t)
    qs = pfqsat(t, p, es)
    lh = jnp.where(t > c.tzero, c.wlhv, c.wlhs)
    return qs * lh / (c.rwat * t * t)


def wlh(t):
    """Latent heat of vaporisation, weak T dependence (used by SUBEX):
    lh = wlhv - 2369·(T - tzero) above freezing, wlhs below."""
    return jnp.where(t > c.tzero, c.wlhv - 2369.0 * (t - c.tzero), c.wlhs)


def cpmf(q):
    """Specific heat of moist air (Share/cpmf.inc): cpd(1-q) + cpv·q."""
    return c.cpd * (1.0 - q) + c.cpv * q


def virtual_temperature(t, qv):
    """Tv = T (1 + 0.608 qv) (qv specific humidity)."""
    return t * (1.0 + c.ep1 * qv)


def potential_temperature(t, p):
    """theta = T (p00/p)^(R/cp)."""
    return t * (c.stdp / p) ** c.rovcp


def temperature_from_theta(theta, p):
    return theta * (p / c.stdp) ** c.rovcp


def exner(p):
    return (p / c.stdp) ** c.rovcp


def air_density(t, p, qv=0.0):
    return p / (c.rgas * virtual_temperature(t, qv))


def mixing_ratio_to_sph(w):
    return w / (1.0 + w)


def sph_to_mixing_ratio(q):
    return q / (1.0 - q)


def dewpoint(e):
    """Inverse Tetens over water (e in Pa)."""
    lg = jnp.log(jnp.maximum(e, 1e-10) / c.c1es)
    return (c.c4les * lg - c.c3les * c.tzero) / (lg - c.c3les)
