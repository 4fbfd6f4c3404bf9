"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on CPU via
--xla_force_host_platform_device_count (real TPU hardware in CI has one
chip; benches run separately on it)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
