"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on CPU via
--xla_force_host_platform_device_count (real TPU hardware in CI has one
chip; benches run separately on it).

Note: the environment's TPU plugin (axon) force-registers itself and wins
over the JAX_PLATFORMS env var, so the CPU platform must be forced through
jax.config AFTER importing jax."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
