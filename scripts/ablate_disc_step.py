"""Discriminator-phase ablation: vmapped 3-grad step vs serial 3x
value_and_grad, timed in ONE process back-to-back (process-level timing
drift on the tunneled runtime is ±5%, larger than the effect — see
docs/TRAIN_BENCH.md round-4b notes).

Times ONLY the scp disc update (the part the round-4b vmap change
touches) at the full training shape: batch 8 x 1 s -> mags [8, 161, 201],
TSCNet-64's discriminator (ndf=16).  Inputs vary per step (the axon
runtime memoizes identical buffers); one device->host read fences each
timed block (block_until_ready is a no-op on this runtime).

Usage (TPU): python scripts/ablate_disc_step.py [--steps 30]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import optax


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    from speech_enhancement_tpu.models import Discriminator
    from speech_enhancement_tpu.train import l2_loss
    from speech_enhancement_tpu.train.gan import (
        GenAux,
        _sc_weights_from_gram,
        gan_discriminator_step,
        self_correcting_weights,
    )
    from speech_enhancement_tpu.train.state import GanTrainState, ModuleState

    B, T, F = args.batch, 161, 201
    disc = Discriminator(ndf=16)
    rng = np.random.default_rng(0)
    cm = jnp.asarray(np.abs(rng.standard_normal((B, T, F))).astype(np.float32))
    vs = jax.jit(disc.init)(jax.random.PRNGKey(0), cm, cm)
    tx = optax.adamw(1e-3)
    dstate = ModuleState(params=vs["params"], extra={"spectral": vs["spectral"]},
                         opt_state=tx.init(vs["params"]), step=0)
    state0 = GanTrainState(gen=dstate, disc=dstate)

    n = args.warmup + args.steps
    mags = [
        tuple(
            jnp.asarray(np.abs(rng.standard_normal((B, T, F))).astype(np.float32))
            for _ in range(3)
        )
        for _ in range(n)
    ]
    qs = [
        tuple(jnp.asarray(rng.uniform(0.2, 0.9, B).astype(np.float32))
              for _ in range(3))
        for _ in range(n)
    ]

    def aux_of(m):
        z = jnp.zeros((B, 8))
        return GenAux(est_audio=z, clean_audio=z, noisy_audio=z,
                      est_mag=m[0], clean_mag=m[1], noisy_mag=m[2], metrics={})

    # serial twin of the pre-round-4b gan_discriminator_step scp arm
    @functools.partial(jax.jit, static_argnames=())
    def serial_step(state, est_mag, clean_mag, noisy_mag, qe, qc, qn, key):
        r1, r2, r3 = jax.random.split(key, 3)
        spectral = state.disc.extra["spectral"]

        def d_apply(params, x, y, r):
            return disc.apply({"params": params, "spectral": spectral}, x, y,
                              deterministic=False, rngs={"dropout": r}
                              ).reshape(-1)

        lc, gc = jax.value_and_grad(
            lambda q: l2_loss(d_apply(q, clean_mag, clean_mag, r2), qc)
        )(state.disc.params)
        le, ge = jax.value_and_grad(
            lambda q: l2_loss(d_apply(q, clean_mag, est_mag, r1), qe)
        )(state.disc.params)
        ln, gn = jax.value_and_grad(
            lambda q: l2_loss(d_apply(q, clean_mag, noisy_mag, r3), qn)
        )(state.disc.params)
        w_c, w_e, w_n = self_correcting_weights(gc, ge, gn)
        grads = jax.tree_util.tree_map(
            lambda a, b, c: w_c * a + w_e * b + w_n * c, gc, ge, gn)
        updates, new_opt = tx.update(grads, state.disc.opt_state,
                                     state.disc.params)
        new_params = optax.apply_updates(state.disc.params, updates)
        _, sp = disc.apply({"params": new_params, "spectral": spectral},
                           clean_mag, est_mag, deterministic=True,
                           update_stats=True, mutable=["spectral"])
        disc_new = ModuleState(params=new_params,
                               extra={"spectral": sp["spectral"]},
                               opt_state=new_opt, step=state.disc.step + 1)
        return state.replace(disc=disc_new), w_c * lc + w_e * le + w_n * ln

    def run_vmapped():
        state, key = state0, jax.random.PRNGKey(1)
        t0 = None
        for i in range(n):
            if i == args.warmup:
                float(jnp.ravel(jax.tree_util.tree_leaves(
                    state.disc.params)[0])[0])
                t0 = time.perf_counter()
            key, k = jax.random.split(key)
            state, loss = gan_discriminator_step(
                state, aux_of(mags[i]), qs[i][0], qs[i][1], qs[i][2], k,
                disc_model=disc, arch="scp", criterion=l2_loss, disc_tx=tx)
        float(loss)
        return (time.perf_counter() - t0) * 1000 / args.steps

    def run_serial():
        state, key = state0, jax.random.PRNGKey(1)
        t0 = None
        for i in range(n):
            if i == args.warmup:
                float(jnp.ravel(jax.tree_util.tree_leaves(
                    state.disc.params)[0])[0])
                t0 = time.perf_counter()
            key, k = jax.random.split(key)
            m = mags[i]
            state, loss = serial_step(state, m[0], m[1], m[2],
                                      qs[i][0], qs[i][1], qs[i][2], k)
        float(loss)
        return (time.perf_counter() - t0) * 1000 / args.steps

    # interleave arms twice each: A B A B — drift shows up as within-arm
    # spread, the effect as a consistent between-arm gap
    out = {}
    for name, fn in (("vmapped", run_vmapped), ("serial", run_serial),
                     ("vmapped2", run_vmapped), ("serial2", run_serial)):
        out[name] = round(fn(), 1)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"ms_per_disc_step": out}))


if __name__ == "__main__":
    main()
