"""Persistent XLA compilation cache.

PTv3-scale models contain ~25 distinct sort/attention kernels; on the axon
remote-compile path each costs 45-120 s to compile. Enabling JAX's disk cache
makes every process after the first start hot.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """Short tag of the host's CPU capabilities.

    XLA:CPU cache entries are AOT machine code; the x86 feature set is baked
    in at compile time but NOT part of jax's cache key. Loading an entry
    produced on a different host merely logs "could lead to execution errors
    such as SIGILL" — and mismatched prefer-no-gather/amx code was observed
    to HANG mid-execution on this CI box. Scoping the cache directory by a
    cpuinfo-flags hash makes foreign entries unreachable."""
    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
        return hashlib.blake2b(
            (platform.machine() + flags).encode(), digest_size=4
        ).hexdigest()
    except Exception:
        return platform.machine() or "unknown"


def enable_persistent_cache(path: str = "/root/.jax_compile_cache", min_compile_secs: float = 1.0):
    import jax

    try:
        path = f"{path}-{_host_fingerprint()}"
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization; never fail on it
        pass
