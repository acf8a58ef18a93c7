"""Test configuration: force an 8-virtual-device CPU JAX backend so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4: CPU-backend tests with xla_force_host_platform_device_count).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the axon TPU plugin overrides JAX_PLATFORMS; force CPU explicitly
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
