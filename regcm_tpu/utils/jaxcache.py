"""Persistent XLA compilation cache setup.

Compiled executables are cached on disk keyed by HLO + flags, so a
model step recompiles only on shape/config changes — essential on slow
build hosts and a free win on TPU pods (one worker compiles, the rest
load).  Call :func:`enable_cache` before the first jit execution.
"""
from __future__ import annotations

import os


def enable_cache(path: str | None = None) -> str:
    import jax

    cache = path or os.environ.get(
        "REGCM_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/regcm_tpu_jax"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache
