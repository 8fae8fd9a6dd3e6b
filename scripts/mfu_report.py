"""MFU accounting: analytic FLOPs (XLA cost model) / measured step time /
v5e peak, for the serving step and both GAN train phases.

The perf story so far is utt/s against a north star; this script turns it
into a roofline argument: what fraction of the v5e's bf16 MXU peak each
hot path actually sustains, and therefore whether "no cheap lever left"
(the round-3 negative-results ledger) is a hardware bound or a software
one.  FLOPs come from the compiled executable's own cost analysis
(``jitted.lower(...).compile().cost_analysis()['flops']`` — the XLA HLO
cost model, verified exact on plain matmuls), so they track the real
compiled program including fusions, not a hand count.

Peak: one v5e chip = 197 TFLOP/s bf16 (394 int8).  fp32 paths here still
run their matmuls as single-pass bf16 on the MXU (default_matmul_precision
'bfloat16' serving; fp32 training uses fp32 convs) — MFU is reported
against the bf16 peak for all modes, which UNDERSTATES fp32-mode MFU; the
bound discussion in docs/TRAIN_BENCH.md handles that.

Usage (TPU): python scripts/mfu_report.py [--serving] [--train] [--steps 10]
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
V5E_BF16_PEAK = 197e12


def _fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.ravel(leaf)[0])


WARMUP = 3


def _measure(fn, args_list, warmup=WARMUP):
    """args_list[:warmup] are consumed for warmup and EXCLUDED from the
    timed loop: re-executing an already-run buffer set would let the
    runtime's execution memoization serve it for free and understate the
    step time (CLAUDE.md: always vary inputs across timing iterations)."""
    assert len(args_list) > warmup, "need fresh inputs for the timed loop"
    for a in args_list[:warmup]:
        _fence(fn(*a))
    timed = args_list[warmup:]
    t0 = time.perf_counter()
    for a in timed:
        _fence(fn(*a))
    return (time.perf_counter() - t0) / len(timed)


def _flops(jitted, *args) -> float:
    return float(jitted.lower(*args).compile().cost_analysis()["flops"])


def serving_report(steps: int):
    """bf16 + fused attention, batch 32, 2 s — the bench.py config."""
    from speech_enhancement_tpu.enhance import Enhancer
    from speech_enhancement_tpu.models import TSCNet
    from speech_enhancement_tpu.ops import compressed_stft

    batch, length = 32, 2 * SR
    model = TSCNet(num_channel=64, num_features=201, fused_attention=True)
    spec = compressed_stft(jnp.zeros((1, length)), 400, 100)
    init = jax.jit(lambda rngs, s: model.init(rngs, s, deterministic=True))
    variables = init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec,
    )
    enh = Enhancer(model, variables, compute_dtype=jnp.bfloat16)

    step = jax.jit(lambda v, x: enh._step(v, x))
    x0 = jnp.zeros((batch, length), jnp.float32)
    # FLOPs from the NON-fused compile of the identical math: the cost
    # model cannot see through the Pallas custom call (it credits the
    # fused step 2.69e12 vs 2.83e12 fully counted — less than the 5.1e11
    # of attention math the kernel executes), so count every op via the
    # XLA-attention twin and time the fused path (docs/MFU.md).
    ref_model = TSCNet(num_channel=64, num_features=201,
                       fused_attention=False)
    ref_enh = Enhancer(ref_model, variables, compute_dtype=jnp.bfloat16)
    ref_step = jax.jit(lambda v, x: ref_enh._step(v, x))
    flops = _flops(ref_step, enh.variables, x0)

    rng = np.random.default_rng(0)
    t = np.arange(length) / SR
    batches = []
    for i in range(steps + WARMUP):
        tone = 0.3 * np.sin(2 * np.pi * (150 + 5 * i) * t)
        b = np.stack([tone * (1 + 0.01 * j) for j in range(batch)])
        batches.append(
            (jnp.asarray(b + 0.05 * rng.standard_normal((batch, length)),
                         jnp.float32),),
        )
    sec = _measure(lambda x: step(enh.variables, x), batches)
    return {
        "path": "serving (bf16+fused, B=32, 2 s)",
        "flops_per_step": flops,
        "ms": sec * 1e3,
        "tflops_per_s": flops / sec / 1e12,
        "mfu_pct_bf16_peak": 100 * flops / sec / V5E_BF16_PEAK,
    }


def train_report(steps: int, bf16: bool):
    """Generator + discriminator phases, batch 8 x 1 s (the training
    config)."""
    import optax

    from speech_enhancement_tpu.models import Discriminator, TSCNet
    from speech_enhancement_tpu.train import (
        build_optimizer,
        create_gan_state,
        gan_discriminator_step,
        gan_generator_step,
        l2_loss,
    )

    batch, length = 8, SR
    gen = TSCNet(num_channel=64, num_features=201)
    disc = Discriminator(ndf=16)
    compute_dtype = jnp.bfloat16 if bf16 else None

    probe = create_gan_state(jax.random.PRNGKey(0), gen, disc,
                             optax.sgd(1e-3), optax.sgd(1e-3), length=length)
    gen_tx = build_optimizer("adamw", 5e-4, probe.gen.params)
    disc_tx = build_optimizer("adamw", 1e-3, probe.disc.params)
    # reuse the probe's params — a second create_gan_state would pay two
    # more full jitted inits just to swap optimizers
    state = probe.replace(
        gen=probe.gen.replace(opt_state=gen_tx.init(probe.gen.params)),
        disc=probe.disc.replace(opt_state=disc_tx.init(probe.disc.params)),
    )

    import functools

    gen_step = functools.partial(
        gan_generator_step, gen_model=gen, disc_model=disc, arch="scp",
        criterion=l2_loss, gan_active=True, gen_tx=gen_tx,
        compute_dtype=compute_dtype,
    )
    disc_step = functools.partial(
        gan_discriminator_step, disc_model=disc, arch="scp",
        criterion=l2_loss, disc_tx=disc_tx,
    )

    rng = np.random.default_rng(0)
    t = np.arange(length) / SR
    tone = 0.3 * np.sin(2 * np.pi * 155 * t)
    clean = jnp.asarray(np.stack([tone * (1 + 0.01 * j) for j in range(batch)]),
                        jnp.float32)
    noisy = clean + jnp.asarray(
        0.05 * rng.standard_normal((batch, length)), jnp.float32)
    key = jax.random.PRNGKey(0)

    jg = jax.jit(gen_step, static_argnames=())
    gen_flops = _flops(jg, state, clean, noisy, key)
    gen_args = [(state, clean + 1e-4 * i, noisy + 1e-4 * i,
                 jax.random.PRNGKey(i)) for i in range(steps + WARMUP)]
    gen_sec = _measure(jg, gen_args)

    _, aux = jg(state, clean, noisy, key)
    q = jnp.full((batch,), 0.6, jnp.float32)
    jd = jax.jit(disc_step)
    disc_flops = _flops(jd, state, aux, q, q, q, key)
    disc_args = [(state, aux, q + 0.001 * i, q, q, jax.random.PRNGKey(i))
                 for i in range(steps + WARMUP)]
    disc_sec = _measure(jd, disc_args)

    tag = "bf16" if bf16 else "fp32"
    return [
        {
            "path": f"train gen phase ({tag}, B=8, 1 s)",
            "flops_per_step": gen_flops,
            "ms": gen_sec * 1e3,
            "tflops_per_s": gen_flops / gen_sec / 1e12,
            "mfu_pct_bf16_peak": 100 * gen_flops / gen_sec / V5E_BF16_PEAK,
        },
        {
            "path": f"train disc phase (scp 3-grad, B=8, 1 s)",
            "flops_per_step": disc_flops,
            "ms": disc_sec * 1e3,
            "tflops_per_s": disc_flops / disc_sec / 1e12,
            "mfu_pct_bf16_peak": 100 * disc_flops / disc_sec / V5E_BF16_PEAK,
        },
    ]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--serving", action="store_true")
    p.add_argument("--train", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 train phases (default fp32)")
    args = p.parse_args()
    if not (args.serving or args.train):
        args.serving = args.train = True

    rows = []
    if args.serving:
        rows.append(serving_report(args.steps))
    if args.train:
        rows.extend(train_report(args.steps, args.bf16))
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
