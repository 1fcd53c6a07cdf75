"""Seeding utilities (parity target: reference `pointcept/utils/env.py:17,26`)."""

from __future__ import annotations

import os
import random
from datetime import datetime

import numpy as np


def get_random_seed() -> int:
    return int(datetime.now().strftime("%S%f")) + os.getpid() % 100000


def set_seed(seed=None) -> int:
    """Seed python / numpy (host-side RNG). Device RNG uses explicit jax.random keys
    derived from this seed in the trainer, so there is no global device state to set."""
    if seed is None:
        seed = get_random_seed()
    seed = int(seed)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
