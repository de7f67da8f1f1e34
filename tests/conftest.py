"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the JAX way — no real TPUs needed:
`xla_force_host_platform_device_count=8` fakes an 8-device mesh on the CPU
backend (the reference has no analogue; its only parallelism is
nn.DataParallel).
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
    return np.random.RandomState(0)
