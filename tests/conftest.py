"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding paths are validated the JAX-native way — fake host
devices — since real multi-chip hardware isn't present (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon sitecustomize force-registers the TPU platform and overrides
# JAX_PLATFORMS; pin the config back to CPU before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables at module boundaries.

    A full-suite run accumulates 100+ XLA:CPU executables in the pjit
    cache; past ~105 tests the in-process LLVM compiler starts
    segfaulting (reproducibly, position-dependent, standalone-green —
    compiler-memory exhaustion).  Dropping the caches between modules
    keeps the high-water mark bounded; within-module jit reuse is
    unaffected.
    """
    yield
    jax.clear_caches()
    if os.environ.get("SUITE_RSS_DEBUG"):
        rss = int(open("/proc/self/statm").read().split()[1]) * 4096
        print(f"\n[rss after module: {rss / 1e9:.2f} GB]", flush=True)


@pytest.fixture
def rng():
    return np.random.default_rng(23)
