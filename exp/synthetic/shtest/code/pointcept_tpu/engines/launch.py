"""Launcher — single-controller SPMD replaces the reference's mp.spawn + NCCL.

Parity: reference `pointcept/engines/launch.py:36-136`. In JAX, one Python
process per host drives all local chips; multi-host jobs call
`jax.distributed.initialize` for the coordination service and then run the SAME
main_func — collectives are compiled into the program, so there is no worker
spawn, process group, or dist URL rendezvous dance beyond the coordinator.
"""

from __future__ import annotations

import logging
from typing import Any, Tuple

logger = logging.getLogger(__name__)


def launch(
    main_func,
    num_gpus_per_machine: int = 1,
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url: str = "auto",
    cfg: Tuple[Any, ...] = (),
    timeout=None,
):
    if num_machines > 1:
        import jax

        coordinator = None if dist_url in ("auto", None) else dist_url.replace("tcp://", "")
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_machines,
            process_id=machine_rank,
        )
        logger.info(
            f"jax.distributed initialized: process {machine_rank}/{num_machines}, "
            f"local devices {jax.local_device_count()}, global {jax.device_count()}"
        )
    main_func(*cfg)
