"""SCP-GAN / CMGAN fused train and eval steps.

Re-designs core/function.py:182-451 (+ :705-760) as pure jitted functions:

* the whole featurize -> generate -> istft -> consistency-loss -> update
  chain is one compiled program; the arch dispatch (scp/cp/sc/cmgan) is
  *static* configuration, so each arch gets its own specialized executable
  with no runtime branching;
* the self-correcting discriminator trick (three backward passes with
  retain_graph + manual param.grad overwrite in the reference,
  function.py:705-760) becomes three ``jax.value_and_grad`` calls whose
  flattened-gradient dot products drive a ``jnp.where`` weight algebra —
  no host sync, no graph retention, one optimizer update;
* PESQ labels enter as plain arrays: the step is split at the only true
  host boundary (gen phase emits enhanced audio; the host computes batch
  PESQ; the disc phase consumes the labels).  This replaces the
  reference's per-step .cpu()/joblib round trip (function.py:283-301)
  with a clean two-kernel pipeline that can overlap label computation
  with the next generator step.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_enhancement_tpu.ops import (
    batch_stft,
    compressed_stft,
    uncompressed_istft,
)
from speech_enhancement_tpu.train.state import GanTrainState, ModuleState


def create_gan_state(
    rng: jax.Array,
    gen_model,
    disc_model,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    n_fft: int = 400,
    hop: int = 100,
    length: int = 16000,
) -> GanTrainState:
    """Initialize generator + discriminator states (main_gan.py:145-148
    model construction with kaiming init, :191-192 two optimizers).

    Both inits are jitted: un-jitted flax init dispatches op-by-op,
    which over this host's TPU tunnel costs minutes per model (the
    jitted version is one compile, served from the persistent cache on
    every later startup)."""
    r_gen, r_disc, r_drop = jax.random.split(rng, 3)
    spec = compressed_stft(jnp.zeros((1, length)), n_fft, hop)
    gen_vars = jax.jit(
        lambda rngs, s: gen_model.init(rngs, s, deterministic=True)
    )({"params": r_gen, "dropout": r_drop}, spec)
    mag = jnp.abs(spec)
    disc_vars = jax.jit(
        lambda rngs, m: disc_model.init(rngs, m, m)
    )({"params": r_disc, "dropout": r_drop}, mag)
    gen = ModuleState(
        params=gen_vars["params"],
        extra={k: v for k, v in gen_vars.items() if k != "params"},
        opt_state=gen_tx.init(gen_vars["params"]),
    )
    disc = ModuleState(
        params=disc_vars["params"],
        extra={k: v for k, v in disc_vars.items() if k != "params"},
        opt_state=disc_tx.init(disc_vars["params"]),
    )
    return GanTrainState(gen=gen, disc=disc)


class GenAux(NamedTuple):
    """Device outputs of the generator phase needed by the host (PESQ) and
    the discriminator phase."""

    est_audio: jnp.ndarray
    clean_audio: jnp.ndarray
    noisy_audio: jnp.ndarray
    est_mag: jnp.ndarray
    clean_mag: jnp.ndarray
    noisy_mag: jnp.ndarray
    metrics: dict


def _generator_losses(
    gen_model,
    variables,
    clean,
    noisy,
    rng,
    *,
    arch: str,
    criterion: Callable,
    comp_type: str,
    n_fft: int,
    hop: int,
    train: bool,
    compute_dtype=None,
    per_example: bool = False,
):
    """Shared generator loss computation (function.py:218-258 /
    :362-401).  Returns (losses dict, aux arrays, new batch_stats).

    ``compute_dtype=jnp.bfloat16``: run the generator forward (and, under
    grad, its backward) in bf16 — the TPU analogue of AMP autocast.  The
    DSP featurization and every loss stay fp32; params in ``variables``
    should already be cast by the caller (master copies stay fp32).

    ``per_example=True`` returns each loss as a [B] vector (row-mean via
    ``jax.vmap(criterion)``) instead of a scalar — used by validation to
    mask pad rows exactly when a ragged tail batch is padded to the mesh
    multiple.  Rows are independent in eval mode (running-stat BatchNorm),
    so masked means over real rows equal the unpadded scalars."""
    if per_example:
        # vmap over the leading (batch) axis turns any scalar criterion
        # into a per-row one; same for plain means
        criterion = jax.vmap(criterion)
        mean = lambda x: jnp.mean(  # noqa: E731
            x.reshape(x.shape[0], -1), axis=1)
    else:
        mean = jnp.mean
    # the reference's featurization bundle — ONE shared implementation
    # (ops/stft.batch_stft) so the loss-side and any other caller cannot
    # drift apart
    clean, noisy, clean_spec, noisy_spec, _ = batch_stft(
        clean, noisy, n_fft, hop
    )

    if compute_dtype is not None:
        # no complex bf16 dtype exists: feed the (re, im) pair form
        spec_in = (jnp.real(noisy_spec).astype(compute_dtype),
                   jnp.imag(noisy_spec).astype(compute_dtype))
    else:
        spec_in = noisy_spec

    if train:
        (est_real, est_imag), updates = gen_model.apply(
            variables,
            spec_in,
            deterministic=False,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        # batch_stats master copies stay fp32 even when computed in bf16
        new_stats = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            updates["batch_stats"],
        )
    else:
        est_real, est_imag = gen_model.apply(
            variables, spec_in, deterministic=True
        )
        new_stats = variables.get("batch_stats", {})

    est_real = est_real.astype(jnp.float32)
    est_imag = est_imag.astype(jnp.float32)
    est_spec = jax.lax.complex(est_real, est_imag)
    est_mag = jnp.abs(est_spec)
    clean_mag = jnp.abs(clean_spec)
    est_audio = uncompressed_istft(
        est_spec, n_fft, hop, comp_type="pow", length=clean.shape[-1]
    )

    if arch in ("scp", "cp"):
        # consistency-preserving: compare re-featurized est audio against the
        # istft->stft round trip of the clean spectrogram (function.py:231-254)
        est_prime = compressed_stft(est_audio, n_fft, hop, comp_type=comp_type)
        clean_prime_audio = uncompressed_istft(
            clean_spec, n_fft, hop, comp_type="pow", length=clean.shape[-1]
        )
        clean_prime = compressed_stft(
            clean_prime_audio, n_fft, hop, comp_type=comp_type
        )
        loss_mag = criterion(jnp.abs(est_prime), jnp.abs(clean_prime))
        time_loss = mean(jnp.abs(est_audio - clean_prime_audio))
        loss_ri = criterion(jnp.real(est_prime), jnp.real(clean_prime)) + criterion(
            jnp.imag(est_prime), jnp.imag(clean_prime)
        )
    else:
        loss_mag = criterion(est_mag, clean_mag)
        time_loss = mean(jnp.abs(est_audio - clean))
        loss_ri = criterion(est_real, jnp.real(clean_spec)) + criterion(
            est_imag, jnp.imag(clean_spec)
        )

    losses = {"loss_ri": loss_ri, "loss_mag": loss_mag, "time_loss": time_loss}
    aux = {
        "est_audio": est_audio,
        "clean_audio": clean,
        "noisy_audio": noisy,
        "est_mag": est_mag,
        "clean_mag": clean_mag,
        "noisy_mag": jnp.abs(noisy_spec),
    }
    return losses, aux, new_stats


@functools.partial(
    jax.jit,
    static_argnames=(
        "gen_model", "disc_model", "arch", "criterion", "comp_type",
        "n_fft", "hop", "gan_active", "loss_weights", "gen_tx",
        "compute_dtype",
    ),
)
def gan_generator_step(
    state: GanTrainState,
    clean: jnp.ndarray,
    noisy: jnp.ndarray,
    rng: jax.Array,
    *,
    gen_model,
    disc_model,
    arch: str = "scp",
    criterion: Callable,
    comp_type: str = "pow",
    n_fft: int = 400,
    hop: int = 100,
    gan_active: bool = True,
    loss_weights: tuple = (0.1, 0.9, 0.2, 0.05),
    gen_tx: optax.GradientTransformation,
    compute_dtype=None,
) -> tuple:
    """Generator update (function.py:206-277).  Returns (state, GenAux).
    ``compute_dtype=jnp.bfloat16`` runs the generator fwd/bwd in bf16
    with fp32 master params, fp32 losses, and fp32 optimizer math."""
    rng_drop, rng_disc = jax.random.split(rng)

    def loss_fn(gen_params):
        params = gen_params
        extra = state.gen.extra
        if compute_dtype is not None:
            cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda x: x.astype(compute_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
            # params are cast; batch_stats stay fp32 so the momentum-0.9
            # running-stat update accumulates in true fp32 (casting them to
            # bf16 loses small relative increments entirely — AMP practice
            # is fp32 statistics)
            params = cast(params)
            extra = {k: (v if k == "batch_stats" else cast(v))
                     for k, v in extra.items()}
        variables = {"params": params, **extra}
        losses, aux, new_stats = _generator_losses(
            gen_model, variables, clean, noisy, rng_drop,
            arch=arch, criterion=criterion, comp_type=comp_type,
            n_fft=n_fft, hop=hop, train=True, compute_dtype=compute_dtype,
        )
        if gan_active:
            d_fake = disc_model.apply(
                state.disc.variables(),
                aux["clean_mag"],
                aux["est_mag"],
                deterministic=False,
                rngs={"dropout": rng_disc},
            )
            gan_loss = criterion(
                d_fake.reshape(-1), jnp.ones(d_fake.shape[0], d_fake.dtype)
            )
        else:
            gan_loss = jnp.zeros((), clean.dtype)
        w = loss_weights
        total = (
            w[0] * losses["loss_ri"]
            + w[1] * losses["loss_mag"]
            + w[2] * losses["time_loss"]
            + (w[3] * gan_loss if gan_active else 0.0)
        )
        losses["gan_loss"] = gan_loss
        losses["loss"] = total
        return total, (losses, aux, new_stats)

    (loss, (losses, aux, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.gen.params)
    updates, new_opt = gen_tx.update(grads, state.gen.opt_state, state.gen.params)
    new_params = optax.apply_updates(state.gen.params, updates)
    gen = ModuleState(
        params=new_params,
        extra={**state.gen.extra, "batch_stats": new_stats},
        opt_state=new_opt,
        step=state.gen.step + 1,
    )
    aux_out = GenAux(
        est_audio=jax.lax.stop_gradient(aux["est_audio"]),
        clean_audio=aux["clean_audio"],
        noisy_audio=aux["noisy_audio"],
        est_mag=jax.lax.stop_gradient(aux["est_mag"]),
        clean_mag=aux["clean_mag"],
        noisy_mag=aux["noisy_mag"],
        metrics={k: v for k, v in losses.items()},
    )
    return state.replace(gen=gen), aux_out


def _flat(tree) -> jnp.ndarray:
    return jnp.concatenate([jnp.ravel(x) for x in jax.tree_util.tree_leaves(tree)])


def _sc_weights_from_gram(gram: jnp.ndarray) -> jnp.ndarray:
    """SCP-GAN weight algebra (function.py:705-760) from the 3x3 Gram
    matrix of the flattened (grad_c, grad_e, grad_n) rows; nested
    jnp.where replaces the .item() branch logic.  Returns [w_c, w_e, w_n]."""
    CdotE = gram[0, 1]
    CdotN = gram[0, 2]
    EdotN = gram[1, 2]
    EdotE = gram[1, 1] + 1e-14
    NdotN = gram[2, 2] + 1e-14

    w_c = jnp.ones(())
    w_e = jnp.where(CdotE > 0, 1.0, -CdotE / EdotE)
    s = CdotN + w_e * EdotN  # dot(w_c*gC + w_e*gE, gN)
    w_n_pos_branch = -(CdotN + EdotN) / NdotN
    w_n_neg_branch = -CdotN / NdotN + CdotE * EdotN / (EdotE * NdotN)
    w_n = jnp.where(
        s > 0, 1.0, jnp.where(CdotE > 0, w_n_pos_branch, w_n_neg_branch)
    )
    return jnp.stack([w_c, w_e, w_n])


def self_correcting_weights(grad_c, grad_e, grad_n):
    """SCP-GAN's closed-form gradient-combination weights
    (function.py:705-760), fully traced: flat-grad dot products + nested
    jnp.where replacing the .item() branch logic."""
    g = jnp.stack([_flat(grad_c), _flat(grad_e), _flat(grad_n)])
    w = _sc_weights_from_gram(g @ g.T)
    return w[0], w[1], w[2]


@functools.partial(
    jax.jit,
    static_argnames=("disc_model", "arch", "criterion", "disc_tx"),
)
def gan_discriminator_step(
    state: GanTrainState,
    aux: GenAux,
    pesq_est: jnp.ndarray,
    pesq_clean: jnp.ndarray,
    pesq_noisy: jnp.ndarray,
    rng: jax.Array,
    *,
    disc_model,
    arch: str = "scp",
    criterion: Callable,
    disc_tx: optax.GradientTransformation,
) -> tuple:
    """Discriminator update (function.py:279-313).

    ``pesq_*`` are the host-computed normalized PESQ labels
    ((pesq-1)/3.5, discriminator.py:26-32): est vs clean, clean vs clean,
    noisy vs clean.  For arch cp/cmgan only ``pesq_est`` is used.
    Returns (state, disc_loss).
    """
    r1, r2, r3 = jax.random.split(rng, 3)
    spectral = state.disc.extra.get("spectral", {})

    def d_apply(params, x, y, drop_rng):
        return disc_model.apply(
            {"params": params, "spectral": spectral},
            x, y,
            deterministic=False,
            rngs={"dropout": drop_rng},
        ).reshape(-1)

    def loss_e(params):
        return criterion(d_apply(params, aux.clean_mag, aux.est_mag, r1), pesq_est)

    if arch in ("scp", "sc"):
        # the three loss terms ((clean,clean), (clean,est), (clean,noisy))
        # are independent fwd/bwd passes over the same small conv stack —
        # vmap them into ONE 3B-batch pass (in_axes=None on params makes
        # every grad leaf come back with a leading [3] axis), then take the
        # self-correcting weights from the 3x3 Gram matrix of the flattened
        # grads.  Same algebra as three serial value_and_grads, one
        # dispatch chain and 3x the conv batch for the MXU.
        def loss_one(params, other_mag, label, drop_rng):
            return criterion(
                d_apply(params, aux.clean_mag, other_mag, drop_rng), label
            )

        others = jnp.stack([aux.clean_mag, aux.est_mag, aux.noisy_mag])
        labels = jnp.stack([pesq_clean, pesq_est, pesq_noisy])
        rngs3 = jnp.stack([r2, r1, r3])
        losses, grads3 = jax.vmap(
            jax.value_and_grad(loss_one), in_axes=(None, 0, 0, 0)
        )(state.disc.params, others, labels, rngs3)
        g = jnp.concatenate(
            [x.reshape(3, -1) for x in jax.tree_util.tree_leaves(grads3)],
            axis=1,
        )
        w = _sc_weights_from_gram(g @ g.T)
        grads = jax.tree_util.tree_map(
            lambda x: jnp.tensordot(w, x, axes=1), grads3
        )
        disc_loss = jnp.dot(w, losses)
    else:
        ones = jnp.ones_like(pesq_est)

        def loss_total(params):
            lc = criterion(d_apply(params, aux.clean_mag, aux.clean_mag, r2), ones)
            return lc + loss_e(params)

        disc_loss, grads = jax.value_and_grad(loss_total)(state.disc.params)

    updates, new_opt = disc_tx.update(grads, state.disc.opt_state, state.disc.params)
    new_params = optax.apply_updates(state.disc.params, updates)

    # refresh the spectral-norm power-iteration state once per step (torch
    # updates u on every forward; one update per step converges to the same
    # fixed point without threading state through the grad closures)
    _, sp_updates = disc_model.apply(
        {"params": new_params, "spectral": spectral},
        aux.clean_mag, aux.est_mag,
        deterministic=True,
        update_stats=True,
        mutable=["spectral"],
    )
    disc = ModuleState(
        params=new_params,
        extra={**state.disc.extra, "spectral": sp_updates["spectral"]},
        opt_state=new_opt,
        step=state.disc.step + 1,
    )
    return state.replace(disc=disc), disc_loss


def make_fused_gan_train_step(
    *,
    gen_model,
    disc_model,
    gen_tx,
    disc_tx,
    arch: str = "scp",
    criterion: Callable,
    comp_type: str = "pow",
    n_fft: int = 400,
    hop: int = 100,
    gan_active: bool = True,
    loss_weights: tuple = (0.1, 0.9, 0.2, 0.05),
    sample_rate: int = 16000,
    compute_dtype=None,
):
    """Single-dispatch GAN train step: the whole generator + discriminator
    update is ONE jitted call, with the PESQ labels entering through a
    ``jax.experimental.io_callback`` to the native C++ batch engine.

    This is the io_callback alternative sketched in SURVEY.md §7.6 to the
    default two-phase pipeline (gan_generator_step + host labels +
    gan_discriminator_step).  The fused form minimizes dispatch overhead
    and keeps step semantics in one compiled program, but requires a
    backend with host send/recv callbacks: axon-tunneled TPUs reject
    io_callback with UNIMPLEMENTED (docs/TRAIN_BENCH.md), so two-phase
    stays the cli/main_gan default (--step-mode switches).

    Returns ``step(state, clean, noisy, rng, q_clean=None, q_noisy=None)
    -> (state, metrics)``.  ``q_clean`` / ``q_noisy`` are the normalized
    PESQ labels the data collator precomputes (as cli/main_gan does —
    PESQ(clean, clean) and PESQ(clean, noisy) never change across epochs);
    when omitted they are computed through io_callback too.
    """
    from jax.experimental import io_callback

    def host_labels(clean, est):
        from speech_enhancement_tpu.metrics.pesq import batch_pesq_raw

        scores = batch_pesq_raw(np.asarray(clean), np.asarray(est),
                                sample_rate)
        return ((scores - 1.0) / 3.5).astype(np.float32)

    def step(state: GanTrainState, clean, noisy, rng,
             q_clean=None, q_noisy=None):
        rng_gen, rng_disc = jax.random.split(rng)
        state, aux = gan_generator_step(
            state, clean, noisy, rng_gen,
            gen_model=gen_model, disc_model=disc_model, arch=arch,
            criterion=criterion, comp_type=comp_type, gan_active=gan_active,
            loss_weights=loss_weights, gen_tx=gen_tx,
            compute_dtype=compute_dtype,
        )
        if gan_active:
            b = clean.shape[0]
            spec = jax.ShapeDtypeStruct((b,), jnp.float32)
            length = aux.est_audio.shape[-1]
            q_est = io_callback(host_labels, spec, aux.clean_audio[:, :length],
                                aux.est_audio)
            if q_clean is None:
                q_clean = io_callback(host_labels, spec,
                                      aux.clean_audio[:, :length],
                                      aux.clean_audio[:, :length])
            if q_noisy is None:
                q_noisy = io_callback(host_labels, spec,
                                      aux.clean_audio[:, :length],
                                      aux.noisy_audio[:, :length])
            state, disc_loss = gan_discriminator_step(
                state, aux, q_est, q_clean, q_noisy, rng_disc,
                disc_model=disc_model, arch=arch, criterion=criterion,
                disc_tx=disc_tx,
            )
        else:
            disc_loss = jnp.zeros(())
        return state, {**aux.metrics, "disc_loss": disc_loss}

    return jax.jit(step)


@functools.partial(
    jax.jit,
    static_argnames=(
        "gen_model", "disc_model", "arch", "criterion", "comp_type",
        "n_fft", "hop", "gan_active", "loss_weights", "per_example",
    ),
)
def gan_eval_step(
    state: GanTrainState,
    clean: jnp.ndarray,
    noisy: jnp.ndarray,
    *,
    gen_model,
    disc_model,
    arch: str = "scp",
    criterion: Callable,
    comp_type: str = "pow",
    n_fft: int = 400,
    hop: int = 100,
    gan_active: bool = True,
    loss_weights: tuple = (0.1, 0.9, 0.2, 0.05),
    per_example: bool = False,
):
    """validate_gan equivalent (function.py:346-451) minus the PESQ-label
    disc loss term (computed by the host wrapper): returns
    (gen metrics dict, GenAux).

    ``per_example=True``: every loss comes back as a [B] vector so the
    caller can mask pad rows of a ragged (padded-to-mesh-multiple) tail
    batch exactly — the reference validates every utterance
    (main_gan.py:287-298) and so must we."""
    losses, aux, _ = _generator_losses(
        gen_model, state.gen.variables(), clean, noisy, jax.random.PRNGKey(0),
        arch=arch, criterion=criterion, comp_type=comp_type,
        n_fft=n_fft, hop=hop, train=False, per_example=per_example,
    )
    d_fake = disc_model.apply(
        state.disc.variables(), aux["clean_mag"], aux["est_mag"],
        deterministic=True,
    ).reshape(-1)
    if per_example:
        gan_loss = jax.vmap(criterion)(d_fake, jnp.ones_like(d_fake))
    else:
        gan_loss = criterion(d_fake, jnp.ones_like(d_fake))
    w = loss_weights
    total = (
        w[0] * losses["loss_ri"]
        + w[1] * losses["loss_mag"]
        + w[2] * losses["time_loss"]
        + (w[3] * gan_loss if gan_active else 0.0)
    )
    losses["gan_loss"] = gan_loss
    losses["loss"] = total
    d_real = disc_model.apply(
        state.disc.variables(), aux["clean_mag"], aux["clean_mag"],
        deterministic=True,
    ).reshape(-1)
    aux_out = GenAux(
        est_audio=aux["est_audio"],
        clean_audio=aux["clean_audio"],
        noisy_audio=aux["noisy_audio"],
        est_mag=aux["est_mag"],
        clean_mag=aux["clean_mag"],
        noisy_mag=aux["noisy_mag"],
        metrics={**losses, "d_fake": d_fake, "d_real": d_real},
    )
    return losses, aux_out
