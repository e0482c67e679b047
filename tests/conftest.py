"""Test config: force CPU with a virtual 8-device mesh so pjit/shard_map paths
are exercised without TPU hardware (the standard JAX testing recipe).

Note: this image registers an 'axon' TPU PJRT plugin via sitecustomize before
pytest starts, so plain env vars are not enough — we must override through
jax.config before any backend is initialised.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
