"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding logic is validated on
a virtual CPU mesh exactly as the driver's dry-run does.

The host image's sitecustomize registers the axon TPU backend and calls
``jax.config.update("jax_platforms", "axon,cpu")``, which overrides the
``JAX_PLATFORMS`` env var — so the config must be forced back to cpu *after*
importing jax (env alone is not enough).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2705)
