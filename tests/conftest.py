"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding (dp/mp meshes) is tested on virtual CPU devices per the project's
test strategy (SURVEY.md §4); real-TPU runs happen in bench.py only.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's axon plugin forces jax_platforms="axon,cpu" at import, overriding
# the JAX_PLATFORMS env var — set the config explicitly or every test silently runs on
# the remote TPU through the tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")  # parity tests need f32 matmuls

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
