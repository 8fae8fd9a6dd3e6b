"""GAN train-step throughput: two-phase (sync / async labels) vs fused.

Measures steps/s of the full-size SCP-GAN training step (TSCNet-64 +
metric discriminator, batch 8 x 1 s — the hardware-validated training
config) in the three dispatch modes the framework offers:

- ``sync``  — gan_generator_step, host PESQ labels, gan_discriminator_step
              (reference semantics: function.py:218-313, strictly serial)
- ``async`` — same two jitted phases, but the PESQ labels for step N are
              computed on a host thread while step N+1's generator phase
              runs (cli/main_gan.py --async-disc pipeline)
- ``fused`` — ONE jitted dispatch: generator update + io_callback PESQ
              labels + self-correcting discriminator update
              (train/gan.py::make_fused_gan_train_step)

Writes docs/TRAIN_BENCH.md and prints one JSON line per mode.  The winner
is what cli/main_gan should default to.

Usage (TPU): python scripts/bench_train_step.py [--steps 20] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

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

SR = 16000


def _fence(tree):
    """True device barrier: on current axon runtimes block_until_ready
    returns before execution finishes, so read one element instead."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    float(jnp.ravel(leaf)[0])


def make_batches(rng: np.ndarray, n: int, batch: int, length: int):
    """Speech-ish tones (PESQ needs voiced energy), distinct per step —
    the axon runtime memoizes repeated executions on identical buffers."""
    t = np.arange(length) / SR
    out = []
    for i in range(n):
        f0 = 160.0 + 10.0 * (i % 7)
        tone = (0.3 * np.sin(2 * np.pi * f0 * t) *
                (0.55 + 0.45 * np.sin(2 * np.pi * 3.1 * t)))
        clean = np.stack([tone * (1.0 + 0.01 * j) for j in range(batch)])
        noisy = clean + 0.05 * rng.standard_normal((batch, length))
        out.append((clean.astype(np.float32), noisy.astype(np.float32)))
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=1.0)
    p.add_argument("--fused-attention", action="store_true",
                   help="Pallas fused attention in the generator "
                        "(custom_vjp backward)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 generator fwd/bwd (compute_dtype)")
    p.add_argument("--gen-only", action="store_true",
                   help="skip the discriminator phase (cost split)")
    p.add_argument("--stub-labels", action="store_true",
                   help="replace host PESQ q_est labels with precomputed "
                        "random vectors (cost split: isolates the host "
                        "label wait from the device phases)")
    p.add_argument("--arch", default="scp", choices=["scp", "cmgan"],
                   help="scp = 3-gradient self-correcting disc step")
    p.add_argument("--modes", nargs="+", default=None,
                   help="subset of sync/async/pipelined/fused to run")
    args = p.parse_args()
    if args.gen_only and (args.modes or ["sync"]) != ["sync"]:
        p.error("--gen-only is only meaningful with --modes sync "
                "(the async/pipelined/fused runners always execute the "
                "discriminator phase)")

    from speech_enhancement_tpu.metrics.pesq import batch_pesq_raw
    from speech_enhancement_tpu.models import Discriminator, TSCNet
    from speech_enhancement_tpu.train import (
        build_optimizer,
        create_gan_state,
        gan_discriminator_step,
        gan_generator_step,
        l2_loss,
        make_fused_gan_train_step,
    )

    length = int(args.seconds * SR)
    gen = TSCNet(num_channel=64, num_features=201,
                 fused_attention=args.fused_attention)
    disc = Discriminator(ndf=16)

    import jax.numpy as _jnp

    compute_dtype = _jnp.bfloat16 if args.bf16 else None

    import optax

    probe = create_gan_state(
        jax.random.PRNGKey(0), gen, disc, optax.sgd(1e-3), optax.sgd(1e-3),
        length=length,
    )
    gen_tx = build_optimizer("adamw", 5e-4, probe.gen.params)
    disc_tx = build_optimizer("adamw", 1e-3, probe.disc.params)
    # reuse the probe's params (identical seed) — a second
    # create_gan_state would pay two more full jitted inits
    state0 = probe.replace(
        gen=probe.gen.replace(opt_state=gen_tx.init(probe.gen.params)),
        disc=probe.disc.replace(opt_state=disc_tx.init(probe.disc.params)),
    )

    rng = np.random.default_rng(0)
    n_total = args.warmup + args.steps
    batches = make_batches(rng, n_total, args.batch, length)
    # collator-precomputed labels (PESQ(clean,clean)=ceiling, PESQ(clean,noisy))
    q_clean = jnp.asarray(
        (batch_pesq_raw(batches[0][0], batches[0][0]) - 1.0) / 3.5, jnp.float32
    )
    q_noisy = jnp.asarray(
        (batch_pesq_raw(batches[0][0], batches[0][1]) - 1.0) / 3.5, jnp.float32
    )

    if args.stub_labels:
        _stub = [jnp.asarray(rng.uniform(0.2, 0.9, args.batch)
                             .astype(np.float32)) for _ in range(n_total)]
        import itertools

        _stub_i = itertools.count()

        def q_est_of(clean, aux):
            # still fetch est_audio (the device->host read the real path
            # pays) but skip the PESQ computation itself
            np.asarray(aux.est_audio)
            return _stub[next(_stub_i) % n_total]
    else:
        def q_est_of(clean, aux):
            est = np.asarray(aux.est_audio)
            return jnp.asarray(
                (batch_pesq_raw(clean[:, : est.shape[1]], est) - 1.0) / 3.5,
                jnp.float32,
            )

    results = {}

    # ---- two-phase, synchronous labels
    def run_sync():
        state, key = state0, jax.random.PRNGKey(1)
        t0 = None
        for i, (clean, noisy) in enumerate(batches):
            if i == args.warmup:
                _fence(state.gen.params)
                t0 = time.perf_counter()
            key, kg, kd = jax.random.split(key, 3)
            state, aux = gan_generator_step(
                state, jnp.asarray(clean), jnp.asarray(noisy), kg,
                gen_model=gen, disc_model=disc, arch=args.arch,
                criterion=l2_loss, gan_active=True, gen_tx=gen_tx,
                compute_dtype=compute_dtype,
            )
            if args.gen_only:
                continue
            q_est = q_est_of(clean, aux)
            state, _ = gan_discriminator_step(
                state, aux, q_est, q_clean, q_noisy, kd,
                disc_model=disc, arch=args.arch, criterion=l2_loss,
                disc_tx=disc_tx,
            )
        _fence(state.disc.params)
        return time.perf_counter() - t0

    # ---- two-phase, async labels (one-deep pipeline, as cli --async-disc)
    def run_async():
        state, key = state0, jax.random.PRNGKey(1)
        pool = ThreadPoolExecutor(max_workers=1)
        pending = None
        t0 = None
        for i, (clean, noisy) in enumerate(batches):
            if i == args.warmup:
                _fence(state.gen.params)
                t0 = time.perf_counter()
            key, kg, kd = jax.random.split(key, 3)
            if pending is not None:
                p_aux, fut, p_kd = pending
                state, _ = gan_discriminator_step(
                    state, p_aux, fut.result(), q_clean, q_noisy, p_kd,
                    disc_model=disc, arch=args.arch, criterion=l2_loss,
                    disc_tx=disc_tx,
                )
            state, aux = gan_generator_step(
                state, jnp.asarray(clean), jnp.asarray(noisy), kg,
                gen_model=gen, disc_model=disc, arch=args.arch,
                criterion=l2_loss, gan_active=True, gen_tx=gen_tx,
                compute_dtype=compute_dtype,
            )
            pending = (aux, pool.submit(q_est_of, clean, aux), kd)
        p_aux, fut, p_kd = pending
        state, _ = gan_discriminator_step(
            state, p_aux, fut.result(), q_clean, q_noisy, p_kd,
            disc_model=disc, arch=args.arch, criterion=l2_loss,
            disc_tx=disc_tx,
        )
        _fence(state.disc.params)
        pool.shutdown()
        return time.perf_counter() - t0

    # ---- two-phase, two-deep pipeline: disc update lags TWO batches so
    # the host PESQ labels get a full gen-step of device time to finish
    # off the critical path (strict alternation serializes
    # gen -> est transfer -> host PESQ -> disc -> next gen; see
    # docs/TRAIN_BENCH.md round-4b cost split).  Semantics deviation:
    # the gen step's gan_loss sees disc params two updates stale.
    def run_pipelined():
        from collections import deque

        state, key = state0, jax.random.PRNGKey(1)
        pool = ThreadPoolExecutor(max_workers=2)
        pending = deque()
        t0 = None
        for i, (clean, noisy) in enumerate(batches):
            if i == args.warmup:
                _fence(state.gen.params)
                t0 = time.perf_counter()
            key, kg, kd = jax.random.split(key, 3)
            if len(pending) == 2:
                p_aux, fut, p_kd = pending.popleft()
                state, _ = gan_discriminator_step(
                    state, p_aux, fut.result(), q_clean, q_noisy, p_kd,
                    disc_model=disc, arch=args.arch, criterion=l2_loss,
                    disc_tx=disc_tx,
                )
            state, aux = gan_generator_step(
                state, jnp.asarray(clean), jnp.asarray(noisy), kg,
                gen_model=gen, disc_model=disc, arch=args.arch,
                criterion=l2_loss, gan_active=True, gen_tx=gen_tx,
                compute_dtype=compute_dtype,
            )
            pending.append((aux, pool.submit(q_est_of, clean, aux), kd))
        while pending:
            p_aux, fut, p_kd = pending.popleft()
            state, _ = gan_discriminator_step(
                state, p_aux, fut.result(), q_clean, q_noisy, p_kd,
                disc_model=disc, arch=args.arch, criterion=l2_loss,
                disc_tx=disc_tx,
            )
        _fence(state.disc.params)
        pool.shutdown()
        return time.perf_counter() - t0

    # ---- fused single dispatch
    def run_fused():
        step = make_fused_gan_train_step(
            gen_model=gen, disc_model=disc, gen_tx=gen_tx, disc_tx=disc_tx,
            arch=args.arch, criterion=l2_loss, gan_active=True,
        )
        state, key = state0, jax.random.PRNGKey(1)
        t0 = None
        for i, (clean, noisy) in enumerate(batches):
            if i == args.warmup:
                _fence(state.gen.params)
                t0 = time.perf_counter()
            key, k = jax.random.split(key)
            state, metrics = step(
                state, jnp.asarray(clean), jnp.asarray(noisy), k,
                q_clean, q_noisy,
            )
        _fence(state.disc.params)
        return time.perf_counter() - t0

    errors = {}
    mode_fns = {"sync": run_sync, "async": run_async,
                "pipelined": run_pipelined, "fused": run_fused}
    selected = args.modes or list(mode_fns)
    for name in selected:
        fn = mode_fns[name]
        try:
            dt = fn()
        except Exception as e:  # e.g. axon: no host send/recv callbacks
            errors[name] = f"{type(e).__name__}: {str(e).splitlines()[0]}"
            print(json.dumps({"mode": name, "error": errors[name]}))
            continue
        sps = args.steps / dt
        results[name] = sps
        print(json.dumps({
            "mode": name, "steps_per_sec": round(sps, 3),
            "ms_per_step": round(1000 * dt / args.steps, 1),
            "batch": args.batch, "utt_seconds": args.seconds,
            "arch": args.arch, "bf16": args.bf16,
            "fused_attention": args.fused_attention,
            "gen_only": args.gen_only,
        }))

    if args.gen_only or args.modes or args.bf16 or args.fused_attention \
            or args.arch != "scp":
        return  # ablation run: JSON lines only, keep TRAIN_BENCH.md canonical
    winner = max(results, key=results.get)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = "".join(
        f"| {m} | {results[m]:.3f} | {1000 / results[m]:.1f} |\n"
        for m in ("sync", "async", "pipelined", "fused") if m in results
    ) + "".join(
        f"| {m} | n/a | n/a ({errors[m]}) |\n"
        for m in ("sync", "async", "pipelined", "fused") if m in errors
    )
    with open(os.path.join(here, "docs", "TRAIN_BENCH.md"), "w") as f:
        f.write(
            "# GAN train-step dispatch benchmark\n\n"
            f"Full-size SCP-GAN (TSCNet-64 + metric discriminator), batch "
            f"{args.batch} x {args.seconds:.0f}s, {args.steps} measured "
            "steps on one TPU chip.  Modes: two-phase with synchronous "
            "host PESQ labels, two-phase with the --async-disc one-deep "
            "label pipeline (cli/main_gan.py), and the single-dispatch "
            "io_callback step (train/gan.py::make_fused_gan_train_step).  "
            "Reference cost center: function.py:283-301.\n\n"
            "| mode | steps/s | ms/step |\n|---|---|---|\n" + rows
            + f"\nWinner: **{winner}** — cli/main_gan defaults accordingly "
            "(override with --step-mode).\n"
        )
    print(json.dumps({"winner": winner, "errors": errors}))


if __name__ == "__main__":
    main()
