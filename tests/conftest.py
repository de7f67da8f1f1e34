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

# Persistent compilation cache: repeated test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
