"""Fused-attention kernel internal cost split (timing-only variants).

Monkeypatches ops/pallas_attention._attn_kernel with semantically WRONG
but shape-identical variants to isolate where the kernel's time goes,
then times the full serving pipeline end-to-end (micro-timings are
unreliable on this host — CLAUDE.md methodology):

- ``full``       the real kernel (baseline)
- ``nobias``     skip the Shaw bias matmul + per-head transpose
- ``notranspose``skip only the per-head bias transpose (adds raw biasT
                 slices misaligned — wrong math, same matmul work)
- ``nosoftmax``  replace softmax with a scale (keeps QK^T and AV)
- ``noqk``       skip QK^T (bias-only logits)

Usage (TPU): python scripts/ablate_attention_kernel.py --variant nobias
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


def make_variant(which: str):
    def kernel(q_ref, k_ref, v_ref, rel_ref, out_ref, *, rows, n, h, d,
               scale):
        if which in ("full", "notranspose", "nosoftmax", "noqk"):
            parts = [
                jnp.transpose(q_ref[:, :, hh * d:(hh + 1) * d], (1, 0, 2))
                for hh in range(h)
            ]
            qT = jnp.concatenate(parts, axis=1)
            biasT = jax.lax.dot_general(
                qT, rel_ref[...], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        outs = []
        for hh in range(h):
            sl = slice(hh * d, (hh + 1) * d)
            if which == "noqk":
                dots = jnp.zeros((rows, n, n), jnp.float32)
            else:
                dots = jax.lax.dot_general(
                    q_ref[:, :, sl], k_ref[:, :, sl],
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            if which == "nobias":
                pass
            elif which == "notranspose":
                # consume biasT with a single linear pass (axis-0 reduce +
                # broadcast add) instead of the [n, rows, n] -> [rows, n, n]
                # sublane-shuffle transpose: isolates the transpose cost
                approx = jnp.sum(
                    biasT[:, hh * rows:(hh + 1) * rows, :], axis=0
                ) * (1.0 / n)  # [rows, n]
                dots = dots + approx[:, None, :]
            else:
                bias = jnp.transpose(
                    biasT[:, hh * rows:(hh + 1) * rows, :], (1, 0, 2)
                )
                dots = dots + bias
            dots = dots * scale
            if which == "nosoftmax":
                attn = (dots * (1.0 / n)).astype(v_ref.dtype)
            else:
                m = jnp.max(dots, axis=2, keepdims=True)
                e = jnp.exp(dots - m)
                s = jnp.sum(e, axis=2, keepdims=True)
                attn = (e / s).astype(v_ref.dtype)
            outs.append(jax.lax.dot_general(
                attn, v_ref[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ))
        out_ref[...] = jnp.concatenate(outs, axis=2).astype(out_ref.dtype)

    return kernel


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="full",
                   choices=["full", "nobias", "notranspose", "nosoftmax",
                            "noqk"])
    args = p.parse_args()

    from speech_enhancement_tpu.ops import pallas_attention as pa

    if args.variant != "full":
        pa._attn_kernel = make_variant(args.variant)

    from speech_enhancement_tpu.enhance import Enhancer
    from speech_enhancement_tpu.models import TSCNet
    from speech_enhancement_tpu.ops import compressed_stft

    model = TSCNet(num_channel=64, num_features=201, fused_attention=True)
    spec = compressed_stft(jnp.zeros((1, LENGTH)), 400, 100)
    init = jax.jit(lambda rngs, s: model.init(rngs, s, deterministic=True))
    variables = init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec,
    )
    enhancer = Enhancer(model, variables, 400, 100,
                        compute_dtype=jnp.bfloat16)
    fn = enhancer._get_compiled(LENGTH)

    rng = np.random.default_rng(0)
    base = 0.1 * rng.standard_normal((BATCH, LENGTH)).astype(np.float32)
    xs = [jnp.asarray(base * (1.0 + 0.001 * i)) for i in range(WARMUP + ITERS)]
    for i in range(WARMUP):
        float(fn(xs[i])[0, 0])
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        float(fn(xs[i])[0, 0])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "variant": args.variant,
        "ms_per_batch": round(1000 * dt / ITERS, 1),
    }))


if __name__ == "__main__":
    main()
