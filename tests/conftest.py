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

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_llvm_code_mappings():
    """Free compiled executables between test modules.

    Every XLA:CPU JIT program holds mmap'ed code sections; a full suite
    accumulates more mappings than ``vm.max_map_count`` (default 65530)
    and LLVM aborts the process with "Cannot allocate memory" /
    "Unable to allocate section memory" (observed 2026-08-18 at ~200
    tests, 117 GB RAM free).  Dropping the jit caches per module bounds
    the live mapping count at the cost of some cross-module recompiles.
    """
    yield
    gc.collect()
    jax.clear_caches()
