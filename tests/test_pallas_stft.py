"""Pallas fused STFT/iSTFT kernels vs the reference ops implementations
(run in interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.ops import compressed_stft, uncompressed_istft
from speech_enhancement_tpu.ops.pallas_stft import pallas_istft, pallas_stft


@pytest.mark.parametrize("comp_type", ["pow", "none"])
def test_pallas_stft_matches_ops(rng, comp_type):
    x = jnp.asarray(0.3 * rng.standard_normal((2, 16000)).astype(np.float32))
    want = np.asarray(compressed_stft(x, 400, 100, comp_type=comp_type))
    got = np.asarray(pallas_stft(x, 400, 100, comp_type=comp_type))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("comp_type", ["pow", "none"])
def test_pallas_istft_matches_ops(rng, comp_type):
    x = jnp.asarray(0.3 * rng.standard_normal((2, 16000)).astype(np.float32))
    spec = compressed_stft(x, 400, 100, comp_type=comp_type)
    want = np.asarray(
        uncompressed_istft(spec, 400, 100, comp_type=comp_type, length=16000)
    )
    got = np.asarray(
        pallas_istft(spec, 400, 100, comp_type=comp_type, length=16000)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_pallas_roundtrip(rng):
    x = jnp.asarray(0.3 * rng.standard_normal((1, 8000)).astype(np.float32))
    spec = pallas_stft(x, 400, 100, comp_type="pow")
    y = np.asarray(pallas_istft(spec, 400, 100, comp_type="pow", length=8000))
    np.testing.assert_allclose(y, np.asarray(x), rtol=1e-3, atol=2e-4)


def test_pallas_stft_nonmultiple_tile(rng):
    """161 frames with t_tile=64 exercises the ragged final tile."""
    x = jnp.asarray(0.3 * rng.standard_normal((1, 16000)).astype(np.float32))
    got = np.asarray(pallas_stft(x, 400, 100, t_tile=64))
    assert got.shape == (1, 161, 201)
    want = np.asarray(compressed_stft(x, 400, 100))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
