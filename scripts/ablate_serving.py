"""Serving cost ablation: zero out one conformer submodule and re-time.

Micro-timings of single jits are unreliable on this host (tunnel dispatch
overhead, runtime memoization), so cost centers are measured end-to-end:
monkeypatch one submodule class to return zeros and compare whole-pipeline
throughput against the full model (CLAUDE.md methodology).  Each variant
is a fresh compile (~5 min over the tunnel on first run).

Usage (TPU): python scripts/ablate_serving.py --zero none
             python scripts/ablate_serving.py --zero time_attn
  --zero one of: none, time_attn, freq_attn, attn, conv, ff, tscb
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

BATCH = 32
LENGTH = 32000
WARMUP = 3
ITERS = 10


def apply_ablation(which: str) -> None:
    import flax.linen as nn

    from speech_enhancement_tpu.models import conformer as cm
    from speech_enhancement_tpu.models import generator as gm

    def zero_call(self, x, deterministic=True):
        return jnp.zeros_like(x)

    if which == "none":
        return
    if which in ("time_attn", "freq_attn", "attn"):
        orig = cm.ShawAttention.__call__

        def attn_call(self, x, deterministic=True):
            # time conformer attends over n~321 (2s); freq over n=101
            is_time = x.shape[1] > 128
            if (which == "attn" or (which == "time_attn") == is_time):
                return jnp.zeros_like(x)
            return orig(self, x, deterministic)

        cm.ShawAttention.__call__ = attn_call
    elif which == "conv":
        cm.ConvModule.__call__ = zero_call
    elif which == "ff":
        cm.FeedForward.__call__ = zero_call
    elif which == "tscb":
        gm.TSCB.__call__ = zero_call
    else:
        raise SystemExit(f"unknown ablation {which}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--zero", default="none")
    p.add_argument("--batch-tile", type=int, default=None,
                   help="override the fused-attention auto batch tile")
    p.add_argument("--quantized", action="store_true",
                   help="int8 encoder/decoder convs (ops/int8.py)")
    p.add_argument("--no-fused", action="store_true",
                   help="XLA attention instead of the Pallas kernel")
    p.add_argument("--fused-relayout", action="store_true",
                   help="Pallas axis-swap kernel for the TSCB time<->freq "
                        "fold (ops/pallas_relayout.py probe)")
    p.add_argument("--fused-stft", action="store_true",
                   help="Pallas hop-block STFT/iSTFT kernels")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--batch", type=int, default=BATCH)
    args = p.parse_args()

    apply_ablation(args.zero)
    if args.batch_tile:
        from speech_enhancement_tpu.ops import pallas_attention as pa

        pa._auto_batch_tile = lambda *a, **k: args.batch_tile

    from speech_enhancement_tpu.enhance import Enhancer
    from speech_enhancement_tpu.models import TSCNet
    from speech_enhancement_tpu.ops import compressed_stft

    model = TSCNet(num_channel=64, num_features=201,
                   fused_attention=not args.no_fused,
                   quantized_convs=args.quantized,
                   fused_relayout=args.fused_relayout)
    spec = compressed_stft(jnp.zeros((1, LENGTH)), 400, 100)
    init = jax.jit(lambda rngs, s: model.init(rngs, s, deterministic=True))
    variables = init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec,
    )
    enhancer = Enhancer(
        model, variables, 400, 100,
        compute_dtype=jnp.bfloat16 if args.precision == "bf16" else None,
        fused_stft=args.fused_stft,
    )
    fn = enhancer._get_compiled(LENGTH)

    rng = np.random.default_rng(0)
    base = 0.1 * rng.standard_normal((args.batch, LENGTH)).astype(np.float32)
    xs = [jnp.asarray(base * (1.0 + 0.001 * i)) for i in range(WARMUP + ITERS)]
    # per-iteration one-element host read: block_until_ready is a no-op on
    # current axon runtimes, so a read is the only true per-batch barrier
    # (serialized timing — comparable to the round-2 325.3 ms methodology)
    for i in range(WARMUP):
        float(fn(xs[i])[0, 0])
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        float(fn(xs[i])[0, 0])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "zero": args.zero,
        "quantized": args.quantized,
        "fused": not args.no_fused,
        "fused_stft": args.fused_stft,
        "fused_relayout": args.fused_relayout,
        "precision": args.precision,
        "batch": args.batch,
        "ms_per_batch": round(1000 * dt / ITERS, 1),
        "utt_per_sec": round(args.batch * ITERS / dt, 2),
    }))


if __name__ == "__main__":
    main()
