"""Persistent XLA compilation cache.

PTv3-scale models contain ~25 distinct sort/attention kernels; on the axon
remote-compile path each costs 45-120 s to compile. Enabling JAX's disk cache
makes every process after the first start hot.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str = "/root/.jax_compile_cache", min_compile_secs: float = 1.0):
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization; never fail on it
        pass
