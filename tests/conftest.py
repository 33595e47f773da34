"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (no TPU needed in CI);
the driver separately dry-runs the multichip path and benches on real TPU.
"""

import os

# Hard-override: the ambient environment points JAX at the TPU (axon);
# tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The ambient axon/TPU plugin overrides JAX_PLATFORMS; the config flag wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
