"""Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4.3): JAX's standard
trick for validating pjit/shard_map collective paths without TPU hardware.
Environment variables must be set before the first ``import jax`` anywhere,
so this conftest is imported first by pytest.

Real-TPU runs (bench.py, the driver) do NOT import this file.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU. NOTE: the env var JAX_PLATFORMS is NOT enough here — this
# environment's sitecustomize registers the 'axon' TPU plugin at interpreter
# startup and sets jax.config.jax_platforms='axon,cpu', which wins over the
# env var. Only an explicit config update after that takes effect.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
