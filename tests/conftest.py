"""Test config: force a virtual 8-device CPU platform.

The environment ships an `axon` TPU plugin that registers itself from
sitecustomize and force-selects jax_platforms="axon,cpu" — plain env vars are
overridden by the time conftest runs. So: set XLA flags (read lazily at backend
init), then override the platform through jax.config before any backend query.
All tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the CI/bench boxes have 1-2 cores, and a cold
# quick-tier run is compile-dominated; cached executables make re-runs cheap
from pointcept_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache("/root/.jax_compile_cache_tests", min_compile_secs=0.2)

assert jax.devices()[0].platform == "cpu", f"tests must run on CPU, got {jax.devices()}"
assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.device_count()}"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
