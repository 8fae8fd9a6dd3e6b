"""On-chip benchmark of the diffusion paths (VERDICT r3 next #8).

GAN training/serving are hardware-proven; this measures the remaining
compute paths on the TPU with read-fenced timing (block_until_ready is a
no-op on axon — only a device->host read is a barrier):

* DiffuSE waveform train step (`train.diffusion.diffuse_step`) —
  reference core/function.py:45-125, batch 16 x 1 s, fp32 and bf16;
* diffusion-TSCNet train step (`tsc_diffusion_step`) —
  function.py:128-203, batch 8 x 1 s, fp32 and bf16;
* DiffuSE reverse sampler (`sample_waveform` lax.scan) — full 50-step
  and --fast 6-step (inference_diffuse.py:192-227), batch 8 x 2 s;
* TSC reverse sampler (`sample_tsc`) — 50 TSCNet applies per utterance
  (inference_diffuse.py:230-269), batch 8 x 2 s.

Writes docs/DIFFUSION_BENCH.md and prints one JSON line per row.

Usage (TPU): python scripts/bench_diffusion.py [--steps 10]
"""

from __future__ import annotations

import argparse
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

SR = 16000


def _fence(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    float(jnp.ravel(jnp.abs(leaf) if jnp.issubdtype(leaf.dtype, jnp.complexfloating)
                    else leaf)[0])


def _speechish(rng, batch, length, i=0):
    t = np.arange(length) / SR
    tone = 0.3 * np.sin(2 * np.pi * (150 + 7 * i) * t) * (
        0.55 + 0.45 * np.sin(2 * np.pi * 3.0 * t))
    clean = np.stack([tone * (1 + 0.01 * j) for j in range(batch)])
    noisy = clean + 0.05 * rng.standard_normal((batch, length))
    return (jnp.asarray(clean, jnp.float32), jnp.asarray(noisy, jnp.float32))


def _time(fn, n, warmup=2):
    for _ in range(warmup):
        _fence(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        _fence(fn())
    return (time.perf_counter() - t0) / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--report", default="docs/DIFFUSION_BENCH.md")
    ap.add_argument("--rows", nargs="+", default=None,
                    help="subset: diffuse_step tsc_step sampler tsc_sampler")
    ap.add_argument("--sampler-batch", type=int, default=8,
                    help="batch size for the reverse-sampler rows")
    args = ap.parse_args()
    rows_wanted = args.rows or ["diffuse_step", "tsc_step", "sampler",
                                "tsc_sampler"]

    import optax

    from speech_enhancement_tpu.models import DiffuSE, DiffusionTSCNet
    from speech_enhancement_tpu.train import build_optimizer
    from speech_enhancement_tpu.train.diffusion import (
        diffuse_step,
        inference_schedule,
        linear_noise_schedule,
        sample_tsc,
        sample_waveform,
        tsc_diffusion_step,
    )
    from speech_enhancement_tpu.train.state import ModuleState

    schedule = jnp.asarray(linear_noise_schedule(50), jnp.float32)
    results = []
    rng = np.random.default_rng(0)

    def record(name, ms, extra=None):
        row = {"path": name, "ms": round(ms * 1e3, 1), **(extra or {})}
        results.append(row)
        print(json.dumps(row), flush=True)

    # ---- DiffuSE waveform train step ------------------------------------
    if "diffuse_step" in rows_wanted:
        batch, length = 16, SR
        model = DiffuSE(num_steps=50)
        clean, noisy = _speechish(rng, batch, length)
        from speech_enhancement_tpu.ops import stft

        spec_shape = jnp.abs(stft(noisy, 400, 100))[:, :-1, :]
        init = jax.jit(lambda k: model.init(
            k, noisy, spec_shape, jnp.zeros((batch,))))
        variables = init(jax.random.PRNGKey(0))
        tx = build_optimizer("adamw", 2e-4, variables["params"])
        state = ModuleState(params=variables["params"],
                            extra={k: v for k, v in variables.items()
                                   if k != "params"},
                            opt_state=tx.init(variables["params"]), step=0)
        # criterion must be ONE stable callable: it is a static argname of
        # the jitted diffuse_step, so a fresh lambda per call would force a
        # full retrace every step (measured 18.5 s/"step" round 4)
        l2 = lambda a, b: jnp.mean((a - b) ** 2)  # noqa: E731
        for tag, cd in (("fp32", None), ("bf16", jnp.bfloat16)):
            i = [0]

            def step():
                i[0] += 1
                c, n = _speechish(rng, batch, length, i[0])
                s, loss = diffuse_step(
                    state, c, n, schedule, jax.random.PRNGKey(i[0]),
                    model=model, criterion=l2, tx=tx, compute_dtype=cd,
                )
                return loss

            record(f"DiffuSE train step ({tag}, B=16, 1 s)",
                   _time(step, args.steps))

    # ---- diffusion TSCNet train step ------------------------------------
    if "tsc_step" in rows_wanted:
        batch, length = 8, SR
        model = DiffusionTSCNet(num_channel=64, num_features=201,
                                num_steps=50)
        clean, noisy = _speechish(rng, batch, length)
        from speech_enhancement_tpu.ops import compressed_stft

        spec = compressed_stft(noisy, 400, 100)
        init = jax.jit(lambda k: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(9)},
            spec, spec, jnp.zeros((batch,))))
        variables = init(jax.random.PRNGKey(0))
        tx = build_optimizer("adamw", 2e-4, variables["params"])
        state = ModuleState(params=variables["params"],
                            extra={k: v for k, v in variables.items()
                                   if k != "params"},
                            opt_state=tx.init(variables["params"]), step=0)
        for tag, cd in (("fp32", None), ("bf16", jnp.bfloat16)):
            i = [0]

            def step():
                i[0] += 1
                c, n = _speechish(rng, batch, length, i[0])
                s, loss = tsc_diffusion_step(
                    state, c, n, schedule, jax.random.PRNGKey(i[0]),
                    model=model, tx=tx, compute_dtype=cd,
                )
                return loss

            record(f"TSC-diffusion train step ({tag}, B=8, 1 s)",
                   _time(step, args.steps))

    # ---- DiffuSE reverse samplers ---------------------------------------
    if "sampler" in rows_wanted:
        batch, length = args.sampler_batch, 2 * SR
        model = DiffuSE(num_steps=50)
        _, noisy = _speechish(rng, batch, length)
        from speech_enhancement_tpu.ops import stft

        spec_shape = jnp.abs(stft(noisy, 400, 100))[:, :-1, :]
        init = jax.jit(lambda k: model.init(
            k, jnp.zeros((batch, 100 * spec_shape.shape[1])), spec_shape,
            jnp.zeros((batch,))))
        variables = init(jax.random.PRNGKey(0))
        fast_beta = [0.0001, 0.001, 0.01, 0.05, 0.2, 0.35]
        for tag, sched in (
            ("full 50-step", inference_schedule(np.asarray(schedule))),
            ("--fast 6-step", inference_schedule(
                np.asarray(schedule), fast_beta, fast=True)),
        ):
            sample = jax.jit(lambda n, k: sample_waveform(
                model, variables, n, sched, k))
            i = [0]

            def run():
                i[0] += 1
                _, n = _speechish(rng, batch, length, i[0])
                return sample(n, jax.random.PRNGKey(i[0]))

            sec = _time(run, max(3, args.steps // 3))
            record(f"DiffuSE sampler {tag} (B={batch}, 2 s)", sec,
                   {"utt_per_s": round(batch / sec, 2)})

    # ---- TSC reverse sampler --------------------------------------------
    if "tsc_sampler" in rows_wanted:
        batch, length = args.sampler_batch, 2 * SR
        model = DiffusionTSCNet(num_channel=64, num_features=201,
                                num_steps=50)
        _, noisy = _speechish(rng, batch, length)
        from speech_enhancement_tpu.ops import compressed_stft

        spec = compressed_stft(noisy, 400, 100)
        init = jax.jit(lambda k: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(9)},
            spec, spec, jnp.zeros((batch,))))
        variables = init(jax.random.PRNGKey(0))
        sched = inference_schedule(np.asarray(schedule))
        sample = jax.jit(lambda n, k: sample_tsc(
            model, variables, n, sched, k))
        i = [0]

        def run():
            i[0] += 1
            _, n = _speechish(rng, batch, length, i[0])
            return sample(n, jax.random.PRNGKey(i[0]))

        sec = _time(run, 3)
        record(f"TSC sampler full 50-step (B={batch}, 2 s)", sec,
               {"utt_per_s": round(batch / sec, 2)})

    # ---- report ---------------------------------------------------------
    lines = [
        "# Diffusion paths on one TPU v5e chip",
        "",
        "Read-fenced timings from `scripts/bench_diffusion.py` "
        "(device->host read per call; inputs varied across iterations "
        "to defeat the axon runtime's buffer memoization).",
        "",
        "| path | ms/call | utt/s |",
        "|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['path']} | {r['ms']} | {r.get('utt_per_s', '—')} |")
    with open(args.report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.report}")


if __name__ == "__main__":
    main()
