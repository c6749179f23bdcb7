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


def _mapping_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no way to observe, stay conservative
        return 1 << 30


@pytest.fixture(autouse=True, scope="module")
def _bound_llvm_code_mappings():
    """Free compiled executables when memory-mapping pressure builds.

    Every XLA:CPU JIT program holds mmap'ed code sections; a full suite
    accumulates more mappings than ``vm.max_map_count`` (default 65530)
    and LLVM aborts the process with "Cannot allocate memory" /
    "Unable to allocate section memory" (observed 2026-08-18 at ~200
    tests, 117 GB RAM free).  Clearing the jit caches bounds the live
    mapping count; doing it only above a threshold keeps cross-module
    compile reuse for the common case (unconditional clearing measured
    +15 min on the full suite).
    """
    yield
    if _mapping_count() > 30000:
        gc.collect()
        jax.clear_caches()
