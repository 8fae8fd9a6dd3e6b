"""Diffusion model family tests (DiffuSE waveform + diffusion TSCNet)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.models import (
    DiffuSE,
    DiffusionEmbedding,
    DiffusionTSCNet,
    SpectrogramUpsampler,
)
from speech_enhancement_tpu.ops import compressed_stft, stft

B, L = 2, 4000  # 40 frames — keep CPU tests fast


def test_diffusion_embedding_integer_and_fractional():
    emb = DiffusionEmbedding(max_steps=50)
    vs = emb.init(jax.random.PRNGKey(0), jnp.array([0, 5]))
    out_int = emb.apply(vs, jnp.array([3, 7]))
    assert out_int.shape == (2, 512)
    out_lo = emb.apply(vs, jnp.array([3.0]))
    out_hi = emb.apply(vs, jnp.array([4.0]))
    out_mid = emb.apply(vs, jnp.array([3.5]))
    np.testing.assert_allclose(
        np.asarray(out_int[0]), np.asarray(out_lo[0]), atol=1e-5
    )
    # lerp happens on the raw table before the MLP, so the midpoint output is
    # not exactly the mean of endpoints — but it must be between-ish / finite
    assert np.all(np.isfinite(np.asarray(out_mid)))
    assert not np.allclose(np.asarray(out_mid), np.asarray(out_hi))


def test_spectrogram_upsampler_stretch():
    up = SpectrogramUpsampler(hop_length=100)
    x = jnp.ones((B, 40, 201))
    vs = up.init(jax.random.PRNGKey(0), x)
    y = up.apply(vs, x)
    assert y.shape == (B, 4000, 201)
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("use_groupnorm", [True, False])
def test_diffuse_forward(rng, use_groupnorm):
    model = DiffuSE(
        residual_layers=3, residual_channels=32, n_specs=201,
        use_groupnorm=use_groupnorm,
    )
    audio = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    spec = stft(audio, 400, 100)  # [B, 41, 201] complex
    cond = jnp.abs(spec)[:, :40, :]
    t = jnp.array([3, 17])
    vs = model.init(jax.random.PRNGKey(0), audio, cond, t)
    out = model.apply(vs, audio, cond, t)
    assert out.shape == (B, L)
    assert np.all(np.isfinite(np.asarray(out)))


def test_diffuse_zero_init_output():
    """Output conv is zero-init (DiffuSE.py:143): fresh model emits ~bias=0."""
    model = DiffuSE(residual_layers=2, residual_channels=32, n_specs=201)
    audio = jnp.ones((1, L))
    cond = jnp.ones((1, 40, 201))
    t = jnp.array([0])
    vs = model.init(jax.random.PRNGKey(0), audio, cond, t)
    out = model.apply(vs, audio, cond, t)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_diffusion_tscnet_forward(rng):
    model = DiffusionTSCNet(num_channel=16, num_features=201, num_steps=50)
    x = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    spec = compressed_stft(x, 400, 100)
    t = jnp.array([1.0, 3.5])  # fractional timesteps supported
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec, spec, t,
    )
    re, im = model.apply(vs, spec, spec, t, deterministic=True)
    assert re.shape == spec.shape
    assert np.all(np.isfinite(np.asarray(re)))


def test_diffusion_tscnet_shares_merge_block(rng):
    """The reference reuses ONE MergeBlock across all 4 TSCB stages
    (tsc_diffusion.py:77-80) — param tree must contain a single merge_block."""
    model = DiffusionTSCNet(num_channel=16, num_features=201, num_steps=50)
    spec = compressed_stft(jnp.ones((1, L)), 400, 100)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec, spec, jnp.array([0.0]),
    )
    merge_keys = [k for k in vs["params"] if "merge" in k]
    assert merge_keys == ["merge_block"]
