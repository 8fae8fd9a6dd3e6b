"""Diffusion forward process, schedules, and lax.scan samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.models import DiffuSE, DiffusionTSCNet
from speech_enhancement_tpu.train import (
    add_noise,
    inference_schedule,
    linear_noise_schedule,
    sample_tsc,
    sample_waveform,
)

B, L = 2, 4000


def test_add_noise_statistics(rng):
    sched = linear_noise_schedule(50)
    clean = jnp.asarray(rng.standard_normal((64, 1000)).astype(np.float32))
    noisy = clean + 0.1
    na, cn, t = add_noise(clean, noisy, sched, jax.random.PRNGKey(0))
    assert na.shape == clean.shape and cn.shape == clean.shape
    assert t.shape == (64,)
    assert int(jnp.min(t)) >= 0 and int(jnp.max(t)) < 50
    assert np.all(np.isfinite(np.asarray(na)))
    # at t=0, noise_scale ~ 1-1e-4 so noisy_audio ~ audio-ish mixture: just
    # sanity-bound the magnitude
    assert float(jnp.max(jnp.abs(na))) < 50


def test_inference_schedule_full_and_fast():
    train_sched = linear_noise_schedule(50)
    full = inference_schedule(train_sched)
    assert len(full.T) == 50
    np.testing.assert_allclose(full.T, np.arange(50), atol=1e-4)
    fast = inference_schedule(
        train_sched, [0.0001, 0.001, 0.01, 0.05, 0.2, 0.35], fast=True
    )
    assert len(fast.T) == 6
    assert np.all(np.diff(fast.T) > 0)  # monotone fractional timestep map
    assert np.all(np.isfinite(fast.c1)) and np.all(np.isfinite(fast.c2))


def test_sample_waveform_runs(rng):
    model = DiffuSE(residual_layers=2, residual_channels=32, n_specs=201)
    noisy = jnp.asarray(0.1 * rng.standard_normal((B, L)).astype(np.float32))
    sched = inference_schedule(
        linear_noise_schedule(50), [0.0001, 0.001, 0.01, 0.05, 0.2, 0.35],
        fast=True,
    )
    cond = jnp.ones((B, L // 100, 201))
    vs = model.init(jax.random.PRNGKey(0), noisy, cond, jnp.array([0.0, 0.0]))
    out = sample_waveform(model, vs, noisy, sched, jax.random.PRNGKey(1))
    assert out.shape == (B, L)
    assert np.all(np.isfinite(np.asarray(out)))
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # final-step clamp


@pytest.mark.slow
def test_sample_waveform_full_50_steps(rng):
    """BASELINE config #4: the full (non-fast) 50-step reverse process."""
    model = DiffuSE(residual_layers=2, residual_channels=32, n_specs=201)
    noisy = jnp.asarray(0.1 * rng.standard_normal((1, L)).astype(np.float32))
    sched = inference_schedule(linear_noise_schedule(50))
    assert len(sched.alpha) == 50
    cond = jnp.ones((1, L // 100, 201))
    vs = model.init(jax.random.PRNGKey(0), noisy, cond, jnp.array([0.0]))
    out = sample_waveform(model, vs, noisy, sched, jax.random.PRNGKey(1))
    assert out.shape == (1, L)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sample_tsc_runs(rng):
    from speech_enhancement_tpu.ops import compressed_stft

    model = DiffusionTSCNet(num_channel=8, num_features=201, num_steps=50)
    noisy = jnp.asarray(0.1 * rng.standard_normal((B, L)).astype(np.float32))
    sched = inference_schedule(
        linear_noise_schedule(50), [0.0001, 0.001, 0.01, 0.05, 0.2, 0.35],
        fast=True,
    )
    spec = compressed_stft(noisy, 400, 100)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec, spec, jnp.array([0.0, 0.0]),
    )
    out = sample_tsc(model, vs, noisy, sched, jax.random.PRNGKey(1))
    assert out.shape == (B, L)
    assert np.all(np.isfinite(np.asarray(out)))
