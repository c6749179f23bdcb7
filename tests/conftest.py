"""Test configuration: force a virtual 8-device CPU backend.

Multi-chip sharding paths are exercised on a virtual CPU mesh
(``xla_force_host_platform_device_count``); the real TPU is reserved for
benchmarks (bench.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU backend and forces
# jax_platforms="axon,cpu" programmatically; tests must run on the virtual
# CPU mesh, so override it back after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
