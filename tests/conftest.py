"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count) since real multi-chip hardware is not
available in CI.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# NOTE: the JAX_PLATFORMS env var is NOT honored in this environment (the
# axon TPU plugin registers regardless and tests silently run against the
# remote chip, ~60s/test); jax.config.update works.
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
