"""Shared-memory dataset cache over /dev/shm.

Parity: reference `pointcept/utils/cache.py:24,38` (`shared_array`/`shared_dict`
over SharedArray + ShareableList); used by `cache=True` datasets and the
DataCacheOperator hook to keep decoded scenes resident across dataloader worker
processes. Implemented with numpy memory-mapped files under /dev/shm.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict

import numpy as np

SHM_ROOT = "/dev/shm/pointcept_tpu"


def _slot(name: str) -> str:
    h = hashlib.sha1(name.encode()).hexdigest()[:16]
    return os.path.join(SHM_ROOT, h)


def shared_array(name: str, var: np.ndarray = None) -> np.ndarray:
    """Create (var given) or attach (var None) a shared numpy array."""
    path = _slot(name)
    meta_path = path + ".json"
    if var is not None:
        os.makedirs(SHM_ROOT, exist_ok=True)
        mm = np.memmap(path, dtype=var.dtype, mode="w+", shape=var.shape)
        mm[...] = var
        mm.flush()
        with open(meta_path, "w") as f:
            json.dump({"dtype": str(var.dtype), "shape": list(var.shape)}, f)
        return mm
    with open(meta_path) as f:
        meta = json.load(f)
    return np.memmap(path, dtype=np.dtype(meta["dtype"]), mode="r", shape=tuple(meta["shape"]))


def shared_dict(name: str, var: Dict[str, np.ndarray] = None) -> Dict[str, np.ndarray]:
    """Share a dict of arrays (reference `shared_dict`)."""
    name = name.replace(".", "-")
    keys_path = _slot(name) + ".keys"
    if var is not None:
        assert isinstance(var, dict)
        keys = []
        for key, value in var.items():
            assert isinstance(value, np.ndarray)
            shared_array(f"{name}.{key}", value)
            keys.append(key)
        os.makedirs(SHM_ROOT, exist_ok=True)
        with open(keys_path, "w") as f:
            json.dump(keys, f)
        return var
    with open(keys_path) as f:
        keys = json.load(f)
    return {key: shared_array(f"{name}.{key}") for key in keys}


def exists(name: str) -> bool:
    return os.path.exists(_slot(name.replace(".", "-")) + ".keys") or os.path.exists(_slot(name) + ".json")


def clear(name_prefix: str = ""):
    if os.path.isdir(SHM_ROOT):
        for f in os.listdir(SHM_ROOT):
            os.remove(os.path.join(SHM_ROOT, f))
