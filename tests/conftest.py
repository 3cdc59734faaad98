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
