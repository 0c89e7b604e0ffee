"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit paths are
validated on XLA's host-platform device simulation (SURVEY.md §4d).
"""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize rewrites JAX_PLATFORMS; override the
# resolved config before any backend initializes so tests run on the virtual
# 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU platform; got %s" % jax.devices())
assert jax.device_count() == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
