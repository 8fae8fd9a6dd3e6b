"""Shared builders for the multi-host train-step test: the SAME model,
batch, and step sequence run (a) single-process over 8 virtual devices and
(b) 2 processes x 4 devices each — results must match
(tests/test_distributed.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

L = 2000
B = 8


def build():
    from speech_enhancement_tpu.models import Discriminator, TSCNet
    from speech_enhancement_tpu.train import build_optimizer, create_gan_state

    gen = TSCNet(num_channel=8, num_features=201)
    disc = Discriminator(ndf=4)
    state0 = create_gan_state(
        jax.random.PRNGKey(0), gen, disc, optax.sgd(1e-3), optax.sgd(1e-3),
        length=L,
    )
    gen_tx = build_optimizer("sgd", 1e-3, state0.gen.params)
    disc_tx = build_optimizer("sgd", 2e-3, state0.disc.params)
    state = create_gan_state(
        jax.random.PRNGKey(0), gen, disc, gen_tx, disc_tx, length=L
    )
    return gen, disc, gen_tx, disc_tx, state


def make_batch():
    rng = np.random.default_rng(42)
    clean = 0.1 * rng.standard_normal((B, L)).astype(np.float32)
    noisy = clean + 0.02 * rng.standard_normal((B, L)).astype(np.float32)
    q_est = np.linspace(0.4, 0.9, B).astype(np.float32)
    q_clean = np.ones(B, np.float32)
    q_noisy = np.linspace(0.2, 0.5, B).astype(np.float32)
    return clean, noisy, q_est, q_clean, q_noisy


def run_steps(gen, disc, gen_tx, disc_tx, state, clean, noisy, q_est,
              q_clean, q_noisy):
    """One generator update + one self-correcting discriminator update;
    returns (gen loss, disc loss, disc-param checksum) as floats — all
    replicated outputs, readable on every process."""
    from speech_enhancement_tpu.train import (
        gan_discriminator_step,
        gan_generator_step,
        l2_loss,
    )

    state, aux = gan_generator_step(
        state, clean, noisy, jax.random.PRNGKey(1),
        gen_model=gen, disc_model=disc, arch="scp", criterion=l2_loss,
        gan_active=True, gen_tx=gen_tx,
    )
    state, disc_loss = gan_discriminator_step(
        state, aux, jnp.asarray(q_est), jnp.asarray(q_clean),
        jnp.asarray(q_noisy), jax.random.PRNGKey(2),
        disc_model=disc, arch="scp", criterion=l2_loss, disc_tx=disc_tx,
    )
    checksum = sum(
        float(jnp.sum(jnp.abs(x)))
        for x in jax.tree_util.tree_leaves(state.disc.params)
    )
    return float(aux.metrics["loss"]), float(disc_loss), checksum
