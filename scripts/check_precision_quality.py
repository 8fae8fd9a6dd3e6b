"""Perceptual-transparency check for the fast serving modes.

Enhances speech-like synthetic utterances with the full-size TSCNet-64 in
fp32 (the exact mode) and in each fast mode (bf16, bf16+fused attention,
bf16+fused+int8 convs), then scores PESQ(fp32 output, fast output) with
the native engine plus relative waveform RMS.  The round-2 bf16 gate was
PESQ >= 4.5 on the full-size generator (measured 4.64); the same gate
applies to int8 (VERDICT.md next-round item 1).

Usage (TPU): python scripts/check_precision_quality.py [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

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


def speechy_batch(batch: int, length: int) -> np.ndarray:
    """Voiced-sounding synthetic utterances (PESQ needs speech energy):
    AM-modulated harmonic stacks with per-row F0 jitter + noise floor."""
    rng = np.random.default_rng(7)
    t = np.arange(length) / SR
    rows = []
    for i in range(batch):
        f0 = 120.0 + 15.0 * (i % 5)
        x = sum(
            (0.4 / h) * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6))
            for h in range(1, 6)
        )
        x *= 0.55 + 0.45 * np.sin(2 * np.pi * (2.5 + 0.3 * i) * t)
        x += 0.01 * rng.standard_normal(length)
        rows.append(0.3 * x / np.abs(x).max())
    return np.stack(rows).astype(np.float32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--modes", nargs="+",
                   default=["bf16", "bf16_fused", "bf16_fused_int8"])
    args = p.parse_args()

    from speech_enhancement_tpu.enhance import Enhancer
    from speech_enhancement_tpu.metrics.pesq import pesq
    from speech_enhancement_tpu.models import TSCNet
    from speech_enhancement_tpu.ops import compressed_stft

    length = int(args.seconds * SR)
    spec = compressed_stft(jnp.zeros((1, length)), 400, 100)

    def build(fused: bool, quantized: bool):
        model = TSCNet(num_channel=64, num_features=201,
                       fused_attention=fused, quantized_convs=quantized)
        init = jax.jit(lambda r, s: model.init(r, s, deterministic=True))
        return model, init

    # one shared param tree: quantization/fusion flags don't change it
    base_model, init = build(False, False)
    variables = init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec,
    )

    noisy = speechy_batch(args.batch, length) + 0.02 * np.random.default_rng(
        1
    ).standard_normal((args.batch, length)).astype(np.float32)

    MODES = {
        "fp32": dict(fused=False, quantized=False, dtype=None),
        "bf16": dict(fused=False, quantized=False, dtype=jnp.bfloat16),
        "bf16_fused": dict(fused=True, quantized=False, dtype=jnp.bfloat16),
        "bf16_fused_int8": dict(fused=True, quantized=True,
                                dtype=jnp.bfloat16),
        "fp32_int8": dict(fused=False, quantized=True, dtype=None),
    }

    def enhance(mode):
        cfg = MODES[mode]
        model, _ = build(cfg["fused"], cfg["quantized"])
        enh = Enhancer(model, variables, 400, 100,
                       compute_dtype=cfg["dtype"])
        return np.stack(enh.enhance(list(noisy), batch_size=args.batch))

    ref = enhance("fp32")
    results = {}
    for mode in args.modes:
        out = enhance(mode)
        scores = [pesq(SR, r, o) for r, o in zip(ref, out)]
        rel = float(np.sqrt(np.mean((ref - out) ** 2) / np.mean(ref**2)))
        results[mode] = {
            "pesq_vs_fp32_mean": round(float(np.mean(scores)), 3),
            "pesq_vs_fp32_min": round(float(np.min(scores)), 3),
            "rel_rms": round(rel, 4),
        }
        print(json.dumps({"mode": mode, **results[mode]}))
    print(json.dumps({"gate_pesq": 4.5, "all": results}))


if __name__ == "__main__":
    main()
