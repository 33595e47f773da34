"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (no TPU needed in CI);
the driver separately dry-runs the multichip path and benches on real TPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
