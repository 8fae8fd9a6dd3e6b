"""Enhancer pipeline: bucketing, order preservation, bf16 parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.enhance import Enhancer, round_to_bucket, wrap_pad
from speech_enhancement_tpu.models import TSCNet
from speech_enhancement_tpu.ops import compressed_stft


@pytest.fixture(scope="module")
def small_enhancer():
    model = TSCNet(num_channel=8, num_features=201)
    spec = compressed_stft(jnp.zeros((1, 8000)), 400, 100)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec,
        deterministic=True,
    )
    return model, variables


def test_round_to_bucket():
    assert round_to_bucket(1, 8000) == 8000
    assert round_to_bucket(8000, 8000) == 8000
    assert round_to_bucket(8001, 8000) == 16000


def test_enhancer_hop_aligns_quantum(small_enhancer):
    """A config hop that doesn't divide the default 8000-sample quantum
    (e.g. 256) must not trip round_to_bucket's assert — Enhancer derives
    the nearest not-larger hop multiple (diffuse-CLI derivation)."""
    model, variables = small_enhancer
    enh = Enhancer(model, variables, n_fft=400, hop=256)
    assert enh.quantum == 8000 - 8000 % 256 and enh.quantum % 256 == 0
    # degenerate case: quantum smaller than hop clamps to one hop
    enh2 = Enhancer(model, variables, n_fft=400, hop=256, quantum=100)
    assert enh2.quantum == 256


def test_wrap_pad():
    x = np.arange(10, dtype=np.float32)
    y = wrap_pad(x, 25)
    np.testing.assert_array_equal(y[:10], x)
    np.testing.assert_array_equal(y[10:20], x)
    np.testing.assert_array_equal(y[20:], x[:5])


def test_enhance_variable_lengths_preserves_order(small_enhancer, rng):
    model, variables = small_enhancer
    enh = Enhancer(model, variables, quantum=4000)
    utts = [
        0.1 * rng.standard_normal(n).astype(np.float32)
        for n in [5000, 12000, 3000, 8000]
    ]
    out = enh.enhance(utts, batch_size=2)
    assert [len(o) for o in out] == [5000, 12000, 3000, 8000]
    for o in out:
        assert np.all(np.isfinite(o))


def test_bf16_close_to_fp32(small_enhancer, rng):
    model, variables = small_enhancer
    x = 0.1 * rng.standard_normal((2, 8000)).astype(np.float32)
    full = Enhancer(model, variables).enhance_batch(x)
    half = Enhancer(model, variables,
                    compute_dtype=jnp.bfloat16).enhance_batch(x)
    assert half.dtype == np.float32
    # full-bf16 is the fast serving mode: a random-init 8-block conformer
    # stack accumulates ~10-25% RMS deviation (documented in Enhancer);
    # this is a sanity bound, not a parity claim
    rel = np.sqrt(np.mean((full - half) ** 2) / np.mean(full**2))
    assert rel < 0.35, rel


def test_model_accepts_pair_and_complex(small_enhancer):
    model, variables = small_enhancer
    spec = compressed_stft(jnp.ones((1, 8000)), 400, 100)
    r1 = model.apply(variables, spec, deterministic=True)
    r2 = model.apply(variables, (jnp.real(spec), jnp.imag(spec)),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(r1[0]), np.asarray(r2[0]), atol=1e-6)
