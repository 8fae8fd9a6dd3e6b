"""Conditional diffusion: forward process, schedules, train/eval losses,
and the lax.scan reverse sampler.

Re-designs the reference's CDiffuSE math (core/function.py:25-43 forward
process; inference_diffuse.py:117-189 reverse schedule; :192-269 samplers)
as pure jittable functions.  The per-utterance reverse loop becomes a
``lax.scan`` over precomputed per-step coefficient arrays with a
``jnp.where(n > 0, ...)`` final-step blend — one compiled program instead
of a Python loop of device round-trips.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_enhancement_tpu.ops import (
    compressed_stft,
    normalize_batch,
    stft,
    uncompressed_istft,
)
from speech_enhancement_tpu.train.state import ModuleState


def linear_noise_schedule(num_steps: int = 50) -> np.ndarray:
    """beta = linspace(1e-4, 0.035, N) (config/default.py:119)."""
    return np.linspace(1e-4, 0.035, num_steps)


def add_noise(audio, noisy, noise_schedule, rng):
    """CDiffuSE conditional forward process (function.py:25-43).

    Interpolates clean -> noisy with mass m(t) plus Gaussian noise; returns
    ``(noisy_audio, combine_noise, t)`` with one uniform random t per sample.
    """
    n = audio.shape[0]
    beta = jnp.asarray(noise_schedule, audio.dtype)
    noise_level = jnp.cumprod(1.0 - beta)
    rng_t, rng_n = jax.random.split(rng)
    t = jax.random.randint(rng_t, (n,), 0, beta.shape[0])
    noise_scale = noise_level[t][:, None]
    noise_scale_sqrt = noise_scale**0.5
    m = (((1.0 - noise_level[t]) / noise_level[t] ** 0.5) ** 0.5)[:, None]
    noise = jax.random.normal(rng_n, audio.shape, audio.dtype)
    noisy_audio = (
        (1.0 - m) * noise_scale_sqrt * audio
        + m * noise_scale_sqrt * noisy
        + (1.0 - (1.0 + m**2) * noise_scale) ** 0.5 * noise
    )
    combine_noise = (
        m * noise_scale_sqrt * (noisy - audio)
        + (1.0 - (1.0 + m**2) * noise_scale) ** 0.5 * noise
    ) / (1.0 - noise_scale) ** 0.5
    return noisy_audio, combine_noise, t


class ReverseSchedule(NamedTuple):
    """Per-step reverse-process coefficients, index 0 = first (largest n)
    sampled step is at the END; arrays indexed by n in [0, N)."""

    alpha: np.ndarray
    beta: np.ndarray
    alpha_cum: np.ndarray
    sigmas: np.ndarray
    T: np.ndarray  # (possibly fractional) training-timestep map
    c1: np.ndarray
    c2: np.ndarray
    c3: np.ndarray
    delta: np.ndarray
    delta_bar: np.ndarray


def inference_schedule(
    noise_schedule, inference_noise_schedule=None, fast: bool = False
) -> ReverseSchedule:
    """Host-side reverse-process coefficient computation
    (inference_diffuse.py:117-189).  Supports the interpolated fast
    (e.g. 6-step) schedule mapping inference steps onto fractional training
    timesteps."""
    training = np.asarray(noise_schedule, np.float64)
    if fast:
        assert inference_noise_schedule is not None
        beta = np.asarray(inference_noise_schedule, np.float64)
    else:
        beta = training

    talpha = 1.0 - training
    talpha_cum = np.cumprod(talpha)
    alpha = 1.0 - beta
    alpha_cum = np.cumprod(alpha)
    n_steps = len(alpha)

    sigmas = np.zeros(n_steps)
    for n in range(n_steps - 1, -1, -1):
        sigmas[n] = (1.0 - alpha_cum[n - 1]) / (1.0 - alpha_cum[n]) * beta[n]

    T = []
    for s in range(n_steps):
        for t in range(len(training) - 1):
            if talpha_cum[t + 1] <= alpha_cum[s] <= talpha_cum[t]:
                twiddle = (talpha_cum[t] ** 0.5 - alpha_cum[s] ** 0.5) / (
                    talpha_cum[t] ** 0.5 - talpha_cum[t + 1] ** 0.5
                )
                T.append(t + twiddle)
                break
    T = np.array(T, np.float32)

    m = np.array(
        [min((1.0 - ac) / ac**0.5, 1.0) ** 0.5 for ac in alpha_cum]
    )
    if np.any(m[:-1] >= 1.0) or alpha_cum[-1] >= 0.5:
        # The reverse coefficients divide by (1 - m[n-1]) and by delta[n],
        # so the schedule must keep every INTERMEDIATE m below the clamp
        # (alpha_cum[n] > (sqrt(5)-1)/2 ~ 0.382 for n < N-1: a clamped
        # intermediate step makes (1-m[n])/(1-m[n-1]) = 0/0) and the
        # final alpha_cum < 0.5 (m[-1] is forced to 1, so delta[-1] =
        # 1 - 2*alpha_cum[-1] must stay > 0).  The reference's own
        # equations (inference_diffuse.py:117-189) silently emit NaN
        # audio outside this domain; fail loudly instead.
        imin = float(alpha_cum[:-1].min()) if n_steps > 1 else float("nan")
        raise ValueError(
            "noise schedule is outside the CDiffuSE reverse-process "
            f"domain (alpha_cum must stay > 0.382 before the final step "
            f"and end below 0.5; got intermediate min {imin:.4f}, final "
            f"{alpha_cum[-1]:.4f}) — adjust the step count or betas"
        )
    m[-1] = 1.0
    delta = np.maximum(1.0 - (1.0 + m**2) * alpha_cum, 0.0)

    delta_cond = np.zeros(n_steps)
    delta_bar = np.zeros(n_steps)
    c1 = np.zeros(n_steps)
    c2 = np.zeros(n_steps)
    c3 = np.zeros(n_steps)
    for n in range(n_steps):
        if n > 0:
            delta_cond[n] = (
                delta[n] - ((1.0 - m[n]) / (1.0 - m[n - 1])) ** 2 * alpha[n] * delta[n - 1]
            )
            delta_bar[n] = delta_cond[n] * delta[n - 1] / delta[n]
            c1[n] = (1.0 - m[n]) / (1.0 - m[n - 1]) * (delta[n - 1] / delta[n]) * alpha[
                n
            ] ** 0.5 + (1.0 - m[n - 1]) * (delta_cond[n] / delta[n]) / alpha[n] ** 0.5
            c2[n] = (
                m[n - 1] * delta[n]
                - (m[n] * (1.0 - m[n])) / (1.0 - m[n - 1]) * alpha[n] * delta[n - 1]
            ) * (alpha_cum[n - 1] ** 0.5 / delta[n])
            c3[n] = (
                (1.0 - m[n - 1])
                * (delta_cond[n] / delta[n])
                * (1.0 - alpha_cum[n]) ** 0.5
                / alpha[n] ** 0.5
            )
        else:
            c1[n] = 1.0 / alpha[n] ** 0.5
            c3[n] = c1[n] * beta[n] / (1.0 - alpha_cum[n]) ** 0.5
    return ReverseSchedule(
        alpha, beta, alpha_cum, sigmas, T,
        c1.astype(np.float32), c2.astype(np.float32), c3.astype(np.float32),
        delta.astype(np.float32), delta_bar.astype(np.float32),
    )


def diffuse_train_loss(model, variables, batch_clean, batch_noisy,
                       noise_schedule, rng, n_fft=400, hop=100,
                       compute_dtype=None):
    """Waveform DiffuSE training loss (function.py:45-103): uncompressed
    STFT magnitude-free conditioner of the noisy signal, model predicts the
    combined noise, criterion applied by caller via returned pair.

    The STFT and the forward-noising run in fp32 regardless of
    ``compute_dtype`` (complex bf16 does not exist, and autocast-style AMP
    keeps FFTs in fp32 too); only the model inputs are cast."""
    # drop the trailing center-pad frame so the upsampled conditioner spans
    # exactly L = hop * n_frames samples (the reference's integrated waveform
    # path feeds 161 frames against 16000 samples, which only lines up for
    # the cdiffuse precomputed-spec pipeline; we make both consistent).
    spectrogram = jnp.abs(stft(batch_noisy, n_fft, hop))[:, :-1, :]
    noisy_audio, combine_noise, t = add_noise(
        batch_clean, batch_noisy, noise_schedule, rng
    )
    if compute_dtype is not None:
        spectrogram = spectrogram.astype(compute_dtype)
        noisy_audio = noisy_audio.astype(compute_dtype)
    predicted = model.apply(variables, noisy_audio, spectrogram, t)
    return predicted, combine_noise


def _maybe_cast(tree, dtype):
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "criterion", "tx", "n_fft", "hop", "train",
                     "compute_dtype", "return_grad_norm"),
)
def diffuse_step(
    state: ModuleState,
    clean: jnp.ndarray,
    noisy: jnp.ndarray,
    noise_schedule: jnp.ndarray,
    rng: jax.Array,
    *,
    model,
    criterion: Callable,
    tx: optax.GradientTransformation | None,
    n_fft: int = 400,
    hop: int = 100,
    train: bool = True,
    compute_dtype=None,
    return_grad_norm: bool = False,
):
    """Waveform DiffuSE train/eval step (function.py:45-125).  With
    ``train=False`` (or tx=None) no update is applied.
    ``compute_dtype=jnp.bfloat16`` is the TPU analogue of the reference's
    AMP autocast (function.py:83): the model runs in bf16 with fp32
    master params and an fp32 loss (no GradScaler needed for bf16).
    Returns (state, loss), or (state, loss, grad_norm) with
    ``return_grad_norm=True`` (the reference learner logs the pre-clip
    global grad norm, cdiffuse/learner.py:165,176)."""

    def loss_fn(params):
        # cast params only; auxiliary stats (e.g. BatchNorm running
        # averages) stay fp32 master copies
        variables = {"params": _maybe_cast(params, compute_dtype),
                     **state.extra}
        pred, target = diffuse_train_loss(
            model, variables, clean, noisy,
            noise_schedule, rng, n_fft, hop,
            compute_dtype=compute_dtype,
        )
        return criterion(pred.astype(jnp.float32), target.astype(jnp.float32))

    grad_norm = jnp.zeros(())
    if train and tx is not None:
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=new_params, opt_state=new_opt, step=state.step + 1
        )
    else:
        loss = loss_fn(state.params)
    if return_grad_norm:
        return state, loss, grad_norm
    return state, loss


@functools.partial(
    jax.jit,
    static_argnames=("model", "tx", "comp_type", "n_fft", "hop", "train",
                     "compute_dtype"),
)
def tsc_diffusion_step(
    state: ModuleState,
    clean: jnp.ndarray,
    noisy: jnp.ndarray,
    noise_schedule: jnp.ndarray,
    rng: jax.Array,
    *,
    model,
    tx: optax.GradientTransformation | None,
    comp_type: str = "pow",
    n_fft: int = 400,
    hop: int = 100,
    train: bool = True,
    compute_dtype=None,
):
    """Spectrogram-domain diffusion train/eval step
    (function.py:453-622): compressed STFTs of the diffused audio and the
    noisy conditioner, TSCNet predicts a spectrogram, iSTFT back, L1
    time-domain loss against the combined noise (the reference's active
    loss; the mag/RI terms are commented out there, :504-512)."""
    rng_noise, rng_drop = jax.random.split(rng)

    def loss_fn(params):
        variables = {"params": _maybe_cast(params, compute_dtype),
                     **state.extra}
        c, n, _ = normalize_batch(clean, noisy)
        orig_spec = compressed_stft(n, n_fft, hop, comp_type=comp_type)
        noisy_audio, combine_noise, t = add_noise(
            c, n, noise_schedule, rng_noise
        )
        noisy_spec = compressed_stft(noisy_audio, n_fft, hop,
                                     comp_type=comp_type)
        if compute_dtype is not None:
            # AMP-parity (function.py:482 autocast): model in bf16, STFT
            # featurization and loss in fp32
            spec_in = (jnp.real(noisy_spec).astype(compute_dtype),
                       jnp.imag(noisy_spec).astype(compute_dtype))
            orig_in = (jnp.real(orig_spec).astype(compute_dtype),
                       jnp.imag(orig_spec).astype(compute_dtype))
        else:
            spec_in, orig_in = noisy_spec, orig_spec
        if train:
            (est_re, est_im), updates = model.apply(
                variables, spec_in, orig_in, t,
                deterministic=False, rngs={"dropout": rng_drop},
                mutable=["batch_stats"],
            )
            new_stats = updates["batch_stats"]
        else:
            est_re, est_im = model.apply(
                variables, spec_in, orig_in, t, deterministic=True
            )
            new_stats = state.extra.get("batch_stats", {})
        predicted = uncompressed_istft(
            jax.lax.complex(est_re.astype(jnp.float32),
                            est_im.astype(jnp.float32)), n_fft, hop,
            comp_type=comp_type, length=clean.shape[-1],
        )
        loss = jnp.mean(jnp.abs(predicted - combine_noise))
        return loss, new_stats

    if train and tx is not None:
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=new_params,
            extra={**state.extra, "batch_stats": new_stats},
            opt_state=new_opt,
            step=state.step + 1,
        )
    else:
        loss, _ = loss_fn(state.params)
    return state, loss


def sample_waveform(model, variables, noisy_signal, schedule: ReverseSchedule,
                    rng, hop=100, n_fft=400, gamma: float = 0.2,
                    clamp_every_step: bool = False, conditioner=None):
    """DiffuSE reverse sampler (inference_diffuse.py:192-227) as lax.scan.

    Starts from the (zero-padded) noisy waveform; per-step update
    x <- c1 x + c2 y - c3 eps_theta + sqrt(delta_bar) z, with the final step
    dropping the y/noise terms and blending gamma with the noisy signal.

    ``clamp_every_step``: the vendored standalone sampler clamps the audio
    to [-1, 1] at EVERY reverse step (cdiffuse/inference.py:161), while the
    top-level one clamps only at the final step (inference_diffuse.py:225).
    False reproduces the top-level behavior; cli/cdiffuse_inference passes
    True.

    ``conditioner``: optional precomputed [B, frames, bins] spectrogram to
    feed the model instead of the |STFT| computed here — the standalone
    reference consumes offline-preprocessed conditioners whose
    featurization (log1p / mel, cdiffuse/preprocess.py) differs from a raw
    |STFT|; cli/cdiffuse_inference builds those for converted upstream
    checkpoints.  The audio buffer is framed as hop * frames either way
    (cdiffuse/inference.py:146-148).
    """
    if conditioner is not None:
        spec = jnp.asarray(conditioner, jnp.float32)
    else:
        spec = jnp.abs(stft(noisy_signal, n_fft, hop))[:, :-1, :]
    b = noisy_signal.shape[0]
    length = hop * spec.shape[1]
    take = min(noisy_signal.shape[-1], length)
    noisy_audio = jnp.zeros((b, length), noisy_signal.dtype)
    noisy_audio = noisy_audio.at[:, :take].set(noisy_signal[:, :take])
    n_steps = len(schedule.alpha)
    coeffs = jnp.asarray(
        np.stack([schedule.c1, schedule.c2, schedule.c3,
                  schedule.delta_bar, schedule.T]).T.astype(np.float32)
    )  # [N, 5]

    def body(carry, inp):
        audio, step_rng = carry
        n_idx, (c1, c2, c3, dbar, t_frac) = inp
        step_rng, sub = jax.random.split(step_rng)
        eps = model.apply(variables, audio, spec, jnp.full((b,), t_frac))
        noise = jax.random.normal(sub, audio.shape, audio.dtype)
        nonfinal = c1 * audio + c2 * noisy_audio - c3 * eps + dbar**0.5 * noise
        if clamp_every_step:
            nonfinal = jnp.clip(nonfinal, -1.0, 1.0)
        final = c1 * audio - c3 * eps
        final = (1.0 - gamma) * final + gamma * noisy_audio
        final = jnp.clip(final, -1.0, 1.0)
        audio = jnp.where(n_idx > 0, nonfinal, final)
        return (audio, step_rng), None

    steps = (
        jnp.arange(n_steps - 1, -1, -1),
        tuple(coeffs[::-1, i] for i in range(5)),
    )
    (audio, _), _ = jax.lax.scan(body, (noisy_audio, rng), steps)
    return audio


def sample_tsc(model, variables, noisy_signal, schedule: ReverseSchedule,
               rng, n_fft=400, hop=100, comp_type="pow", gamma: float = 0.2):
    """Spectrogram-domain (diffusion TSCNet) reverse sampler
    (inference_diffuse.py:230-269) as lax.scan.  The caller is responsible
    for the RMS normalization and hop-multiple padding wrapper."""
    b = noisy_signal.shape[0]
    orig_spec = compressed_stft(noisy_signal, n_fft, hop, comp_type=comp_type)
    noisy_audio = noisy_signal
    n_steps = len(schedule.alpha)
    coeffs = jnp.asarray(
        np.stack([schedule.c1, schedule.c2, schedule.c3,
                  schedule.delta_bar, schedule.T]).T.astype(np.float32)
    )

    def body(carry, inp):
        audio, step_rng = carry
        n_idx, (c1, c2, c3, dbar, t_frac) = inp
        step_rng, sub = jax.random.split(step_rng)
        spec = compressed_stft(audio, n_fft, hop, comp_type=comp_type)
        re, im = model.apply(
            variables, spec, orig_spec, jnp.full((b,), t_frac),
            deterministic=True,
        )
        eps = uncompressed_istft(
            jax.lax.complex(re, im), n_fft, hop, comp_type=comp_type,
            length=audio.shape[-1],
        )
        noise = jax.random.normal(sub, audio.shape, audio.dtype)
        nonfinal = c1 * audio + c2 * noisy_audio - c3 * eps + dbar**0.5 * noise
        final = c1 * audio - c3 * eps
        final = (1.0 - gamma) * final + gamma * noisy_audio
        audio = jnp.where(n_idx > 0, nonfinal, final)
        return (audio, step_rng), None

    steps = (
        jnp.arange(n_steps - 1, -1, -1),
        tuple(coeffs[::-1, i] for i in range(5)),
    )
    (audio, _), _ = jax.lax.scan(body, (noisy_signal, rng), steps)
    return audio
