"""DSP parity keystone: our STFT/iSTFT must match torch.stft/istft.

torch (CPU) is used in tests only, as the ground truth the reference's
featurization is defined in terms of (core/function.py:685-703).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from speech_enhancement_tpu.ops import (
    compressed_stft,
    hamming_window,
    istft,
    normalize_batch,
    power_compress,
    power_uncompress,
    stft,
    uncompressed_istft,
)

N_FFT, HOP = 400, 100


def _torch_stft(x_np):
    w = torch.hamming_window(N_FFT)
    return torch.stft(
        torch.tensor(x_np), N_FFT, HOP, window=w, onesided=True, return_complex=True
    ).numpy()


def test_hamming_matches_torch():
    ours = np.asarray(hamming_window(N_FFT))
    theirs = torch.hamming_window(N_FFT).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("length", [16000, 16100, 4000])
def test_stft_matches_torch(rng, length):
    x = rng.standard_normal((3, length)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), N_FFT, HOP))  # [B, T, F]
    theirs = _torch_stft(x)  # [B, F, T]
    assert ours.shape == (3, theirs.shape[2], theirs.shape[1])
    np.testing.assert_allclose(
        ours, np.transpose(theirs, (0, 2, 1)), rtol=1e-4, atol=1e-3
    )


def test_istft_matches_torch(rng):
    x = rng.standard_normal((2, 16000)).astype(np.float32)
    spec_t = _torch_stft(x)
    w = torch.hamming_window(N_FFT)
    theirs = torch.istft(
        torch.tensor(spec_t), N_FFT, HOP, window=w, onesided=True
    ).numpy()
    ours = np.asarray(istft(jnp.asarray(np.transpose(spec_t, (0, 2, 1))), N_FFT, HOP))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_roundtrip_identity(rng):
    x = rng.standard_normal((2, 16000)).astype(np.float32)
    y = np.asarray(istft(stft(jnp.asarray(x), N_FFT, HOP), N_FFT, HOP))
    np.testing.assert_allclose(y, x[:, : y.shape[1]], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("comp_type", ["pow", "log", "none", "norm"])
def test_power_compress_inverse(rng, comp_type):
    x = rng.standard_normal((1, 8000)).astype(np.float32)
    spec = stft(jnp.asarray(x), N_FFT, HOP)
    back = power_uncompress(power_compress(spec, comp_type), comp_type)
    np.testing.assert_allclose(np.asarray(back), np.asarray(spec), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("comp_type", ["pow", "log", "none", "norm"])
def test_compressed_roundtrip(rng, comp_type):
    x = rng.standard_normal((2, 16000)).astype(np.float32)
    spec = compressed_stft(jnp.asarray(x), N_FFT, HOP, comp_type=comp_type)
    y = np.asarray(uncompressed_istft(spec, N_FFT, HOP, comp_type=comp_type))
    np.testing.assert_allclose(y, x[:, : y.shape[1]], rtol=1e-3, atol=1e-3)


def test_compressed_stft_matches_torch_pow(rng):
    """Mirror the reference composition: stft -> mag^0.3 recombination."""
    x = rng.standard_normal((2, 16000)).astype(np.float32)
    spec_t = _torch_stft(x)
    mag, ang = np.abs(spec_t), np.angle(spec_t)
    mag = mag**0.3
    ref = (mag * np.cos(ang) + 1j * mag * np.sin(ang)).astype(np.complex64)
    ours = np.asarray(compressed_stft(jnp.asarray(x), N_FFT, HOP, comp_type="pow"))
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 1)), rtol=1e-3, atol=1e-3)


def test_normalize_batch(rng):
    clean = rng.standard_normal((4, 16000)).astype(np.float32)
    noisy = (2.0 * rng.standard_normal((4, 16000))).astype(np.float32)
    c_out, n_out, c = normalize_batch(jnp.asarray(clean), jnp.asarray(noisy))
    rms = np.sqrt(np.mean(np.asarray(n_out) ** 2, axis=-1))
    np.testing.assert_allclose(rms, np.ones(4), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c_out), clean * np.asarray(c), rtol=1e-6
    )


def test_normalize_batch_silent_utterance_is_finite(rng):
    """A digitally-silent utterance gets gain c=1 (finite output, not
    the reference's inf -> all-NaN): real serving batches contain
    all-zero files.  Non-silent rows are bit-identical to the unguarded
    math."""
    clean = rng.standard_normal((2, 4000)).astype(np.float32)
    noisy = np.stack([
        (2.0 * rng.standard_normal(4000)).astype(np.float32),
        np.zeros(4000, np.float32),
    ])
    c_out, n_out, c = normalize_batch(jnp.asarray(clean), jnp.asarray(noisy))
    assert np.all(np.isfinite(np.asarray(c_out)))
    assert np.all(np.isfinite(np.asarray(n_out)))
    np.testing.assert_allclose(np.asarray(c)[1], 1.0)
    # the non-silent row keeps exact reference semantics
    want = np.sqrt(4000 / np.sum(noisy[0] ** 2))
    np.testing.assert_allclose(np.asarray(c)[0, 0], want, rtol=1e-6)


@pytest.mark.parametrize("comp_type", ["pow", "log"])
def test_compress_gradients_finite_at_zero_bins(rng, comp_type):
    """Exactly-zero spectrogram bins must not NaN the gradient: the vjp
    of abs at a complex zero is 0/0, and d/dm(m^0.3) is inf at m=0 — the
    naive double-where guards only the primal division.  Both directions
    sit on the train-step gradient path (est spec -> istft, est audio ->
    re-featurized consistency loss), so one zero estimated bin would
    silently NaN the whole update."""
    from speech_enhancement_tpu.ops import power_compress, power_uncompress

    re = rng.standard_normal((3, 5)).astype(np.float32)
    im = rng.standard_normal((3, 5)).astype(np.float32)
    re[0, :2] = im[0, :2] = 0.0  # exact complex zeros
    re[1, 3] = im[1, 3] = 0.0

    for f in (power_compress, power_uncompress):
        def loss(r, i):
            out = f(jax.lax.complex(r, i), comp_type)
            return jnp.sum(jnp.real(out) ** 2 + jnp.imag(out) ** 2)

        gr, gi = jax.grad(loss, argnums=(0, 1))(jnp.asarray(re),
                                                jnp.asarray(im))
        assert np.all(np.isfinite(np.asarray(gr))), f.__name__
        assert np.all(np.isfinite(np.asarray(gi))), f.__name__
        # nonzero bins still carry real gradient
        assert float(jnp.max(jnp.abs(gr))) > 0


def test_istft_differentiable(rng):
    """SCP consistency losses backprop through istft->stft (function.py:231-254)."""
    x = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))

    def loss(sig):
        spec = compressed_stft(sig, N_FFT, HOP)
        audio = uncompressed_istft(spec, N_FFT, HOP)
        spec2 = compressed_stft(audio, N_FFT, HOP)
        return jnp.mean(jnp.abs(spec2)) + jnp.mean(jnp.abs(audio))

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_stft_jits_and_caches():
    f = jax.jit(lambda x: stft(x, N_FFT, HOP))
    x = jnp.ones((2, 16000))
    out = f(x)
    assert out.shape == (2, 161, 201)
    assert out.dtype == jnp.complex64
