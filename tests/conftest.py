"""Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4.3): JAX's standard
trick for validating pjit/shard_map collective paths without TPU hardware.
Environment variables must be set before the first ``import jax`` anywhere,
so this conftest is imported first by pytest.

Real-TPU runs (bench.py, the driver) do NOT import this file.
"""

import os

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (the TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
