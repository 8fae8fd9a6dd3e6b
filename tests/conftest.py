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


@pytest.fixture
def rng():
    return np.random.default_rng(23)
