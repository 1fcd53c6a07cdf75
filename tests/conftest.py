"""Test config: force a virtual 8-device CPU platform before JAX initializes.

All tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
