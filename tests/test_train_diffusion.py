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

    # out-of-domain schedule (too little total noise: final alpha_cum
    # >= 0.5 clamps delta to 0) must raise, not emit NaN audio later
    with pytest.raises(ValueError, match="alpha_cum"):
        inference_schedule(np.linspace(1e-4, 0.05, 20))


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


def test_sample_waveform_clamp_modes(rng):
    """Pin BOTH clamp behaviors against a numpy reimplementation:
    clamp_every_step=False reproduces the top-level sampler
    (inference_diffuse.py:225, final-step clamp only) and =True the
    vendored standalone one (cdiffuse/inference.py:161, every step)."""
    from speech_enhancement_tpu.train.diffusion import ReverseSchedule

    class LinearEps:
        """Stub model: eps = 0.5 * audio (deterministic, spec-independent)."""

        def apply(self, variables, audio, spec, t):
            return 0.5 * audio

    n = 3
    # delta_bar = 0 makes the recurrence deterministic (no sampled noise)
    zeros = np.zeros(n, np.float32)
    sched = ReverseSchedule(
        alpha=np.full(n, 0.9, np.float32), beta=zeros, alpha_cum=zeros,
        sigmas=zeros, T=np.arange(n, dtype=np.float32),
        c1=np.full(n, 0.4, np.float32), c2=np.full(n, 0.3, np.float32),
        c3=np.full(n, 0.1, np.float32), delta=zeros, delta_bar=zeros,
    )
    # amplitude > 1 so the per-step clamp actually bites
    y = 2.0 * np.ones((1, 400), np.float32)
    gamma = 0.2

    def expected(clamp_every):
        x = y.copy()
        for i in range(n - 1, -1, -1):
            eps = 0.5 * x
            if i > 0:
                x = sched.c1[i] * x + sched.c2[i] * y - sched.c3[i] * eps
                if clamp_every:
                    x = np.clip(x, -1.0, 1.0)
            else:
                x = sched.c1[i] * x - sched.c3[i] * eps
                x = (1 - gamma) * x + gamma * y
                x = np.clip(x, -1.0, 1.0)
        return x

    for clamp_every in (False, True):
        got = sample_waveform(
            LinearEps(), {}, jnp.asarray(y), sched, jax.random.PRNGKey(0),
            clamp_every_step=clamp_every,
        )
        np.testing.assert_allclose(np.asarray(got), expected(clamp_every),
                                   rtol=1e-5)
    # the two modes genuinely diverge on this input
    assert not np.allclose(expected(False), expected(True))


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


def test_diffuse_step_fp32_and_bf16(rng):
    """bf16 compute_dtype must keep the STFT conditioner in fp32 (complex
    bf16 does not exist — round-4 on-chip crash) and produce a loss close
    to fp32's; the update must apply."""
    import optax

    from speech_enhancement_tpu.ops import stft
    from speech_enhancement_tpu.train import diffuse_step
    from speech_enhancement_tpu.train.state import ModuleState

    model = DiffuSE(residual_layers=2, residual_channels=32, n_specs=201)
    clean = jnp.asarray(0.1 * rng.standard_normal((B, L)).astype(np.float32))
    noisy = clean + jnp.asarray(
        0.02 * rng.standard_normal((B, L)).astype(np.float32))
    schedule = jnp.asarray(linear_noise_schedule(50), jnp.float32)
    spec = jnp.abs(stft(noisy, 400, 100))[:, :-1, :]
    variables = model.init(jax.random.PRNGKey(0), noisy, spec,
                           jnp.zeros((B,)))
    tx = optax.sgd(1e-3)
    state = ModuleState(params=variables["params"],
                        extra={k: v for k, v in variables.items()
                               if k != "params"},
                        opt_state=tx.init(variables["params"]), step=0)
    crit = lambda a, b: jnp.mean((a - b) ** 2)  # noqa: E731
    losses = {}
    for tag, cd in (("fp32", None), ("bf16", jnp.bfloat16)):
        new_state, loss = diffuse_step(
            state, clean, noisy, schedule, jax.random.PRNGKey(3),
            model=model, criterion=crit, tx=tx, compute_dtype=cd,
        )
        assert new_state.step == 1
        losses[tag] = float(loss)
        assert np.isfinite(losses[tag])
        # params moved, and master params stayed fp32
        leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        assert leaf.dtype == jnp.float32
    # same rng/batch: bf16 loss tracks fp32 to matmul tolerance
    assert abs(losses["bf16"] - losses["fp32"]) < 0.05 * (
        abs(losses["fp32"]) + 1e-3)


def test_predict_batch_singleton_matches_predict(rng):
    """cli.inference_diffuse.predict_batch with a singleton chunk must
    reproduce the per-utterance predict() bit-for-bit (same rng, same
    hop-multiple padding) for BOTH archs; a mixed-length chunk buckets,
    samples once, and trims back to the original lengths."""
    from types import SimpleNamespace

    from speech_enhancement_tpu.cli.inference_diffuse import (
        predict,
        predict_batch,
    )
    from speech_enhancement_tpu.ops import compressed_stft

    cfg = SimpleNamespace(HOP_SAMPLES=100, N_FFT=400)
    sched = inference_schedule(
        linear_noise_schedule(50), [0.0001, 0.001, 0.01, 0.05, 0.2, 0.35],
        fast=True,
    )
    sig = 0.1 * rng.standard_normal(L).astype(np.float32)

    # tsc arch
    model = DiffusionTSCNet(num_channel=8, num_features=201, num_steps=50)
    spec = compressed_stft(jnp.zeros((1, L)), 400, 100)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec, spec, jnp.array([0.0]),
    )
    args = SimpleNamespace(arch="tsc-diffuse", comp_type="pow",
                           sampler_batch=1)
    key = jax.random.PRNGKey(7)
    serial = predict(model, vs, args, cfg, sig, sched, key)
    batched = predict_batch(model, vs, args, cfg, [sig], sched, key)[0]
    np.testing.assert_array_equal(serial, batched)

    # mixed-length chunk: bucket, sample once, trim per utterance
    args2 = SimpleNamespace(arch="tsc-diffuse", comp_type="pow",
                            sampler_batch=2)
    short = 0.1 * rng.standard_normal(L - 700).astype(np.float32)
    outs = predict_batch(model, vs, args2, cfg, [sig, short], sched, key)
    assert [len(o) for o in outs] == [L, L - 700]
    assert all(np.isfinite(o).all() for o in outs)

    # silent utterance must not NaN-poison its chunk (c = 1 guard; the
    # reference's unguarded sqrt(T/sum x^2) is inf on an all-zero wav)
    silent = np.zeros(L, np.float32)
    outs = predict_batch(model, vs, args2, cfg, [sig, silent], sched, key)
    assert all(np.isfinite(o).all() for o in outs)

    # waveform arch, NON-hop-multiple length: singleton must keep
    # predict()'s raw (unpadded) framing — identical noise draws
    wmodel = DiffuSE(residual_layers=2, residual_channels=32, n_specs=201)
    cond = jnp.ones((1, L // 100, 201))
    wvs = wmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, L)), cond,
                      jnp.array([0.0]))
    wargs = SimpleNamespace(arch="diffuse", comp_type="pow", sampler_batch=1)
    for wsig in (sig, sig[: L - 37]):
        wserial = predict(wmodel, wvs, wargs, cfg, wsig, sched, key)
        wbatched = predict_batch(wmodel, wvs, wargs, cfg, [wsig], sched,
                                 key)[0]
        np.testing.assert_array_equal(wserial, wbatched)


def test_predict_batch_non_default_hop(rng):
    """round_to_bucket asserts quantum % hop == 0; HOP_SAMPLES is config-
    overridable, so the batched path must derive its ~0.5 s bucket
    quantum from the hop — a hard-coded 8000 crashes every non-singleton
    chunk for e.g. hop=256 (8000 % 256 != 0)."""
    from types import SimpleNamespace

    from speech_enhancement_tpu.cli.inference_diffuse import predict_batch
    from speech_enhancement_tpu.ops import compressed_stft

    cfg = SimpleNamespace(HOP_SAMPLES=256, N_FFT=400)
    sched = inference_schedule(
        linear_noise_schedule(50), [0.0001, 0.001, 0.01, 0.05, 0.2, 0.35],
        fast=True,
    )
    model = DiffusionTSCNet(num_channel=8, num_features=201, num_steps=50)
    spec = compressed_stft(jnp.zeros((1, L)), 400, 256)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec, spec, jnp.array([0.0]),
    )
    args = SimpleNamespace(arch="tsc-diffuse", comp_type="pow",
                           sampler_batch=2)
    sig = 0.1 * rng.standard_normal(L).astype(np.float32)
    short = 0.1 * rng.standard_normal(L - 700).astype(np.float32)
    outs = predict_batch(model, vs, args, cfg, [sig, short], sched,
                         jax.random.PRNGKey(7))
    assert [len(o) for o in outs] == [L, L - 700]
    assert all(np.isfinite(o).all() for o in outs)
