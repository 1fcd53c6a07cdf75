"""Multi-host process utilities on top of JAX's single-controller runtime.

The reference (`pointcept/utils/comm.py`) wraps torch.distributed (NCCL + a gloo
side-channel for python objects). On TPU, collectives inside jitted computation are
emitted by XLA (psum/all_gather under shard_map/pjit); this module only covers the
*host-side* concerns: process identity, barriers, and gathering small python
objects across hosts.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np


def _jax():
    import jax

    return jax


def get_world_size() -> int:
    return _jax().process_count()


def get_rank() -> int:
    return _jax().process_index()


def get_local_rank() -> int:
    # one process per host under JAX; local rank == 0 unless overridden
    return 0


def get_local_size() -> int:
    return 1


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize():
    """Barrier across hosts (no-op for single process)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("pointcept_tpu_barrier")


def all_gather(data: Any) -> List[Any]:
    """Gather an arbitrary picklable object from each host; returns list of size world_size.

    Parity: reference `utils/comm.py:92` (gloo object all_gather). Implemented by
    broadcasting pickled bytes through a padded uint8 array per host.
    """
    world_size = get_world_size()
    if world_size == 1:
        return [data]
    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.array([buf.size], dtype=np.int64))
    sizes = np.asarray(sizes).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros(max_size, dtype=np.uint8)
    padded[: buf.size] = buf
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(gathered[i, : int(sizes[i])].tobytes()) for i in range(world_size)]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather picklable objects on one host (others receive [])."""
    out = all_gather(data)
    return out if get_rank() == dst else []


def shared_random_seed() -> int:
    """A random seed shared by all hosts (reference `utils/comm.py:158`)."""
    seed = np.random.randint(2**31)
    return int(all_gather(seed)[0])


def reduce_dict(input_dict: dict, average: bool = True) -> dict:
    """Reduce scalar values across hosts (reference `utils/comm.py:171`)."""
    world_size = get_world_size()
    if world_size < 2:
        return input_dict
    keys = sorted(input_dict.keys())
    values = np.array([float(input_dict[k]) for k in keys], dtype=np.float64)
    gathered = np.stack([np.asarray(v) for v in all_gather(values)]).sum(axis=0)
    if average:
        gathered = gathered / world_size
    return {k: gathered[i] for i, k in enumerate(keys)}
