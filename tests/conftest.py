"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host devices
(xla_force_host_platform_device_count=8), mirroring how the reference
exercises its MPI code single-node via ``mpirun -np 8``
(Tools/Scripts/BuildBot/argo.cfg MPISTRING) and the mpi-serial stub.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config
# update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA-CPU compiles are very slow on the
# 2-core CI box (~0.1 s/HLO-op); caching jitted steps across test runs
# cuts suite wall time dramatically after the first cold run.
_cache = os.environ.get("REGCM_TPU_JAX_CACHE",
                        os.path.expanduser("~/.cache/regcm_tpu_jax"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ---------------------------------------------------------------------------
# Suite tiering (VERDICT r4 next #9): the 8-device trajectory tests and
# the stiff-ODE box oracles dominate suite wall time.  They run in the
# `slow` tier — enabled with --runslow or REGCM_TPU_SLOW=1 — so the
# default tier stays fast enough to run on every change.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow tier (8-device trajectories, box oracles)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running tier; run with --runslow or REGCM_TPU_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("REGCM_TPU_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: pass --runslow (or REGCM_TPU_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
