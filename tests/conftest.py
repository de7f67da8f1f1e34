"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the JAX way — no real TPUs needed:
`xla_force_host_platform_device_count=8` fakes an 8-device mesh on the CPU
backend (the reference has no analogue; its only parallelism is
nn.DataParallel).
"""

import os

# The sandbox pre-sets JAX_PLATFORMS=axon (real TPU) and its sitecustomize
# imports jax at interpreter startup, so the env var is already baked into
# jax.config — override through the config API, not the environment.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# NOTE: do NOT enable the persistent compilation cache here — this sandbox
# routes some compiles through a remote helper on a machine with different
# CPU features, and reloading those AOT results SIGILLs (observed: suite
# aborts with 'Fatal Python error: Aborted' loading cached XLA:CPU results).


@pytest.fixture
def rng():
    return np.random.RandomState(0)
