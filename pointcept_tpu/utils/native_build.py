"""Build host-side C++ helper libraries into a hash-keyed cache.

Artifacts are never committed; each build is keyed by (source bytes, compiler
flags, machine arch), so a checkout moved to a different microarchitecture
rebuilds instead of dlopen-ing a stale `-march=native` binary (SIGILL risk).
"""

from __future__ import annotations

import hashlib
import os
import platform
import subprocess
import tempfile
from typing import Optional, Sequence

DEFAULT_FLAGS = ("-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-pthread")


def build_native(src_path: str, flags: Sequence[str] = DEFAULT_FLAGS,
                 cache_dir: Optional[str] = None) -> Optional[str]:
    """Compile ``src_path`` with g++ and return the cached .so path.

    Returns None if compilation fails (callers fall back to numpy paths).
    """
    if not os.path.exists(src_path):
        return None
    with open(src_path, "rb") as f:
        src_bytes = f.read()
    key = hashlib.sha256(
        src_bytes + repr(tuple(flags)).encode() + platform.machine().encode()
    ).hexdigest()[:16]
    stem = os.path.splitext(os.path.basename(src_path))[0]
    if cache_dir is None:
        cache_dir = os.environ.get(
            "POINTCEPT_NATIVE_CACHE",
            os.path.join(
                os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                "pointcept_tpu", "native",
            ),
        )
    lib_path = os.path.join(cache_dir, f"lib{stem}-{key}.so")
    if os.path.exists(lib_path):
        return lib_path
    try:
        os.makedirs(cache_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=cache_dir)
        os.close(fd)
        subprocess.run(
            ["g++", *flags, "-o", tmp, src_path], check=True, capture_output=True
        )
        os.replace(tmp, lib_path)  # atomic: concurrent workers race benignly
        return lib_path
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None
