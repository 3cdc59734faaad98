#!/usr/bin/env python
"""Regenerate the golden 10-step regression fields
(tests/test_parity.py::test_golden_regression). Run on CPU in float64;
commit tests/data/golden_test001.npz when a discretization change is
deliberate."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_parity import _golden_trajectory, GOLDEN  # noqa: E402

os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
np.savez_compressed(GOLDEN, **_golden_trajectory())
print(f"wrote {GOLDEN}")
