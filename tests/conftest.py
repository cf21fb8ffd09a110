"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual XLA devices so multi-chip sharding
(pjit / shard_map over a Mesh) is exercised without TPU hardware.
Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon site hook resets JAX_PLATFORMS=axon at interpreter start; the
# config update (pre backend-init) reliably forces the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
