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

# persistent XLA:CPU compile cache for suite re-runs on THIS host (first
# run compiles ~30 min, repeats drop to minutes).  Separate dir from the
# TPU .jax_cache and gitignored: XLA:CPU executables are host-CPU-specific
# (SIGILL risk if shared across machines), so the cache must die with the
# workspace.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_compiler_memory():
    """Free compiled executables before the process hits resource limits.

    A full-suite run accumulates 100+ XLA:CPU executables (JIT code
    mmaps); past ~105 tests the in-process LLVM compiler segfaults
    (reproducibly, position-dependent, standalone-green) as the map/arena
    footprint grows.  Clearing the pjit caches at every module boundary
    fixes it but also forfeits cross-module jit reuse (identical flax
    module configs hash equal), so clear only when the process is
    actually approaching the ceiling.
    """
    yield
    try:
        n_maps = sum(1 for _ in open("/proc/self/maps"))
        rss = int(open("/proc/self/statm").read().split()[1]) * 4096
    except OSError:
        jax.clear_caches()
        return
    if n_maps > 30000 or rss > 16e9:
        jax.clear_caches()
    if os.environ.get("SUITE_RSS_DEBUG"):
        print(f"\n[after module: rss {rss / 1e9:.2f} GB, {n_maps} maps]",
              flush=True)


@pytest.fixture
def rng():
    return np.random.default_rng(23)
