"""Training-to-quality proxy for the STANDALONE cdiffuse path.

The integrated diffusion systems have scripts/train_diffusion_proxy.py;
this is the same end-to-end evidence for the vendored mini-framework
(reference cdiffuse/__main__.py + cdiffuse/inference.py): train the
upstream DiffuSE variant (no GroupNorm) with ``cli.cdiffuse``'s
step-granular DiffuSELearner on the synthetic speech-like corpus, then
sweep its per-pass step checkpoints through ``cli.cdiffuse_inference``'s
sampler — reverse loop starting FROM the noisy waveform with per-step
clamp and the final-step gamma=0.2 noisy blend (cdiffuse/inference.py:
136-163) — and the 6-metric harness, writing
``docs/cdiffuse_proxy_run.md``.

Context for reading the numbers: the reference's published CDiffuSE
VoiceBank rows (inference_gan.py:169-170, PESQ 2.2-2.3) came from
~10^5-10^6 steps; this proxy is 10^3-10^4 steps, so it demonstrates the
train -> step-checkpoint -> sample -> metrics loop learns and improves
over the noisy input, not that it reaches the published ceiling.

Usage (TPU, ~70 min at the defaults):
  python scripts/train_cdiffuse_proxy.py --root /tmp/cdiffuse_proxy
"""

from __future__ import annotations

import argparse
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

from train_quality_proxy import (  # noqa: E402
    SR,
    make_corpus,
    write_proxy_report,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/cdiffuse_proxy")
    ap.add_argument("--train-pairs", type=int, default=320)
    ap.add_argument("--test-pairs", type=int, default=24)
    ap.add_argument("--max-steps", type=int, default=6000,
                    help="the integrated waveform arm needed ~2000 steps "
                         "to cross the noisy baseline "
                         "(docs/diffusion_waveform_proxy_run.md)")
    ap.add_argument("--eval-every", type=int, default=600,
                    help="sweep checkpoints every k steps (plus the first "
                         "pass and the last step); must be a multiple of "
                         "the per-pass step count to land on saved "
                         "checkpoints")
    ap.add_argument("--batch-size", type=int, default=16,
                    help="cdiffuse/params.py default")
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--fast", action="store_true",
                    help="sweep with the 6-step --fast schedule instead of "
                         "the full 50-step sampler")
    ap.add_argument("--train-seed", type=int, default=3)
    ap.add_argument("--report", default="docs/cdiffuse_proxy_run.md")
    args = ap.parse_args()

    rng = np.random.default_rng(7)  # same corpus as the GAN/diffusion proxies
    print("synthesizing corpus ...", flush=True)
    make_corpus(args.root, args.train_pairs, args.test_pairs, args.seconds,
                rng)

    from speech_enhancement_tpu.cli import cdiffuse, cdiffuse_inference
    from speech_enhancement_tpu.data import load_wav
    from speech_enhancement_tpu.metrics import compute_metrics

    model_dir = os.path.join(args.root, "model")
    print("training cdiffuse (full-size, upstream no-GroupNorm variant) ...",
          flush=True)
    cdiffuse.main([
        model_dir, f"{args.root}/train/clean", f"{args.root}/train/noisy",
        "--max-steps", str(args.max_steps),
        "--batch-size", str(args.batch_size),
        "--seed", str(args.train_seed), "-j", "4",
    ])

    noisy_dir = os.path.join(args.root, "test", "noisy")
    clean_dir = os.path.join(args.root, "test", "clean")
    noisy_paths = sorted(
        os.path.join(noisy_dir, f)
        for f in os.listdir(noisy_dir) if f.endswith(".wav")
    )
    base = np.zeros(6)
    cleans = {}
    for p in noisy_paths:
        clean, _ = load_wav(os.path.join(clean_dir, os.path.basename(p)), SR)
        noisy, _ = load_wav(p, SR)
        cleans[p] = clean
        base += np.array(compute_metrics(clean, noisy, SR, 0))
    base /= len(noisy_paths)

    steps_per_pass = args.train_pairs // args.batch_size
    sweep = sorted(set(
        [steps_per_pass]
        + list(range(args.eval_every, args.max_steps + 1, args.eval_every))
        + [args.max_steps]
    ))
    print(f"sweeping step checkpoints {sweep} ...", flush=True)
    rows = []
    for step in sweep:
        ckpt = os.path.join(model_dir, f"checkpoint_{step:04d}")
        if not os.path.isdir(ckpt):
            print(f"  (no checkpoint at step {step}, skipping)", flush=True)
            continue
        m = np.zeros(6)
        for p in noisy_paths:
            noisy, _ = load_wav(p, SR)
            est = cdiffuse_inference.predict(noisy, ckpt, fast=args.fast)
            m += np.array(compute_metrics(cleans[p], est, SR, 0))
        # one model per swept checkpoint is enough; keep the cache from
        # holding every swept params copy
        cdiffuse_inference._model_cache.clear()
        m /= len(noisy_paths)
        rows.append((step, m))
        print(f"step {step}: pesq {m[0]:.3f} stoi {m[5]:.3f}", flush=True)
    if not rows:
        raise SystemExit(
            f"no restorable checkpoints found under {model_dir} for sweep "
            f"steps {sweep} — learner checkpoint layout mismatch?"
        )

    schedule = "6-step --fast" if args.fast else "full 50-step"
    lines = [
        "# CDiffuSE standalone training-to-quality proxy run "
        "(synthetic corpus)",
        "",
        "Full-size upstream DiffuSE (30x64 residual stack, no GroupNorm) "
        "trained with the",
        "step-granular `cli.cdiffuse` learner on the synthetic speech-like "
        f"corpus ({args.train_pairs}",
        f"train pairs, {args.seconds:.0f}s, 0-10 dB SNR pink noise, "
        f"{args.max_steps} steps of batch {args.batch_size} x 1s crops,",
        "adam lr 2e-4 — cdiffuse/learner.py:182), sampled per utterance "
        "with the",
        f"{schedule} reverse schedule via `cli.cdiffuse_inference`: the "
        "loop starts FROM",
        "the noisy waveform, clamps at every step, and blends gamma=0.2 "
        "noisy at the",
        "final step (reference cdiffuse/inference.py:136-163).  Generated by",
        "`scripts/train_cdiffuse_proxy.py` on one TPU v5e chip.",
    ]
    tag = "_fast" if args.fast else ""
    return write_proxy_report(
        args.report, lines, base, rows, "step",
        os.path.join(args.root, f"cdiffuse{tag}.json"),
        {
            "fast": bool(args.fast), "max_steps": args.max_steps,
            "seed": args.train_seed, "batch_size": args.batch_size,
        },
        "per_step",
    )


if __name__ == "__main__":
    raise SystemExit(main())
