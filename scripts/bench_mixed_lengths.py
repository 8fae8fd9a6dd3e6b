"""Mixed-length serving benchmark: the real VoiceBank-like workload.

bench.py measures uniform 2 s utterances (one bucket, steady state);
real test sets mix lengths (VoiceBank 824-utterance set spans ~1-10 s,
mean ~2.5 s).  This drives the full `Enhancer.enhance` path — length
sorting, bucket padding, per-bucket executables, one-deep dispatch
pipeline — over a synthetic length distribution and reports end-to-end
utterances/sec and realtime factor (audio-seconds enhanced per second).

Usage (TPU): python scripts/bench_mixed_lengths.py [--n 256]
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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--trials", type=int, default=3)
    args = p.parse_args()

    from speech_enhancement_tpu.enhance import Enhancer
    from speech_enhancement_tpu.models import TSCNet
    from speech_enhancement_tpu.ops import compressed_stft

    model = TSCNet(num_channel=64, num_features=201, fused_attention=True)
    spec = compressed_stft(jnp.zeros((1, 16000)), 400, 100)
    init = jax.jit(lambda rngs, s: model.init(rngs, s, deterministic=True))
    variables = init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec,
    )
    enhancer = Enhancer(model, variables, 400, 100,
                        compute_dtype=jnp.bfloat16)

    # VoiceBank-like length distribution: lognormal around ~2.5 s,
    # clipped to [1, 8] s (README.md:21 test-set scale)
    rng = np.random.default_rng(0)
    secs = np.clip(rng.lognormal(np.log(2.3), 0.45, args.n), 1.0, 8.0)
    utts = [
        (0.1 * rng.standard_normal(int(s * SR))).astype(np.float32)
        for s in secs
    ]
    audio_seconds = float(sum(len(u) for u in utts)) / SR

    # warmup compiles every bucket this workload touches
    enhancer.enhance(utts, batch_size=args.batch_size)
    best = float("inf")
    for t in range(args.trials):
        # fresh signals each trial (runtime memoizes identical buffers)
        trial_utts = [u * (1.0 + 0.001 * (t + 1)) for u in utts]
        t0 = time.perf_counter()
        out = enhancer.enhance(trial_utts, batch_size=args.batch_size)
        # Enhancer.enhance drains through np.asarray — a true barrier
        assert len(out) == args.n
        best = min(best, time.perf_counter() - t0)

    from speech_enhancement_tpu.enhance import round_to_bucket

    buckets = sorted({
        round_to_bucket(len(u), enhancer.quantum, enhancer.hop) for u in utts
    })
    print(json.dumps({
        "n_utterances": args.n,
        "mean_seconds": round(float(secs.mean()), 2),
        "bucket_seconds": [b / SR for b in buckets],
        "utt_per_sec": round(args.n / best, 2),
        "audio_seconds_per_sec": round(audio_seconds / best, 1),
        "realtime_factor": round(audio_seconds / best, 1),
    }))


if __name__ == "__main__":
    main()
