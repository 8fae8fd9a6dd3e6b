"""Training-to-quality proxy for the DIFFUSION paths.

The GAN recipe has scripts/train_quality_proxy.py; this is the same
end-to-end evidence for the diffusion systems (reference
main_diffuse.py / inference_diffuse.py): train ``cli.main_diffuse``
(-a tsc-diffuse or diffuse) from scratch on the synthetic speech-like
corpus, then sweep checkpoints through ``cli.inference_diffuse``'s
reverse sampler (full 50-step schedule, or --fast 6-step) and the
6-metric harness, writing ``docs/diffusion_proxy_run.md``.

Context for reading the numbers: the reference's published CDiffuSE
VoiceBank results (inference_gan.py:169-170, PESQ 2.2-2.3) came from
~10^5-10^6 training steps; a proxy run is 10^3-10^4 steps, so this
script demonstrates that the train->checkpoint->sample->metrics loop
learns and improves over the noisy input — not that it reaches the
published ceiling.

Usage (TPU, ~25 min at the defaults):
  python scripts/train_diffusion_proxy.py --root /tmp/diffusion_proxy
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
    ap.add_argument("--root", default="/tmp/diffusion_proxy")
    ap.add_argument("--arch", default="tsc-diffuse",
                    choices=["diffuse", "tsc-diffuse"])
    ap.add_argument("--train-pairs", type=int, default=320)
    ap.add_argument("--test-pairs", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--eval-every", type=int, default=10,
                    help="sweep every k-th checkpoint (plus the last)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--lr", default="2e-4",
                    help="adamw lr (the cdiffuse learner default, "
                         "cdiffuse/learner.py:182)")
    ap.add_argument("--fast", action="store_true",
                    help="sweep with the 6-step --fast schedule instead "
                         "of the full 50-step sampler")
    ap.add_argument("--train-seed", type=int, default=3)
    ap.add_argument("--report", default=None,
                    help="default is arch-dependent so the two arch arms "
                         "never clobber each other's committed record")
    args = ap.parse_args()
    if args.report is None:
        args.report = ("docs/diffusion_proxy_run.md"
                       if args.arch == "tsc-diffuse"
                       else "docs/diffusion_waveform_proxy_run.md")

    rng = np.random.default_rng(7)  # same corpus as the GAN proxy
    print("synthesizing corpus ...", flush=True)
    make_corpus(args.root, args.train_pairs, args.test_pairs, args.seconds,
                rng)

    from speech_enhancement_tpu.cli import inference_diffuse, main_diffuse
    from speech_enhancement_tpu.data import load_wav
    from speech_enhancement_tpu.metrics import compute_metrics

    cfg = "speech_enhancement_tpu/config/baseline.yaml"
    out = os.path.join(args.root, "run")
    opts = [
        "--opts",
        "DATA.TRAIN_CLEAN_DIR", f"{args.root}/train/clean",
        "DATA.TRAIN_NOISY_DIR", f"{args.root}/train/noisy",
        "DATA.TEST_CLEAN_DIR", f"{args.root}/test/clean",
        "DATA.TEST_NOISY_DIR", f"{args.root}/test/noisy",
        "DATA.BATCH_SIZE", str(args.batch_size),
    ]

    print(f"training {args.arch} (full-size) ...", flush=True)
    main_diffuse.main([
        "-a", args.arch, "--cfg", cfg, "--output", out,
        "--epochs", str(args.epochs), "--optimizer", "adamw",
        "--lr", args.lr, "--seed", str(args.train_seed), "-j", "4",
        "-p", "20",
    ] + opts)

    noisy_dir = os.path.join(args.root, "test", "noisy")
    clean_dir = os.path.join(args.root, "test", "clean")
    noisy_paths = sorted(
        os.path.join(noisy_dir, f)
        for f in os.listdir(noisy_dir) if f.endswith(".wav")
    )
    base = np.zeros(6)
    for p in noisy_paths:
        # join on the basename, NOT p.replace("noisy","clean"): a --root
        # containing the substring "noisy" would corrupt the whole path
        clean, _ = load_wav(os.path.join(clean_dir, os.path.basename(p)), SR)
        noisy, _ = load_wav(p, SR)
        base += np.array(compute_metrics(clean, noisy, SR, 0))
    base /= len(noisy_paths)

    print("sweeping checkpoints ...", flush=True)
    iargs, icfg = inference_diffuse.parse_option([
        "-a", args.arch, "--output", os.path.join(args.root, "enhanced"),
        "--model_path", "unused", "--cfg", cfg,
    ] + (["--fast"] if args.fast else []) + opts)
    ckpt_dir = os.path.join(out, args.arch, "default")
    sweep = sorted(set(
        list(range(0, args.epochs, args.eval_every)) + [args.epochs - 1]
    ))
    rows = []
    for epoch in sweep:
        mp = os.path.join(ckpt_dir, f"checkpoint_{epoch:04d}")
        if not os.path.isdir(mp):
            continue
        m = inference_diffuse.inference(iargs, icfg, mp, noisy_paths)
        m /= len(noisy_paths)
        rows.append((epoch, m))
        print(f"epoch {epoch}: pesq {m[0]:.3f} stoi {m[5]:.3f}", flush=True)
    if not rows:
        raise SystemExit(
            f"no restorable checkpoints found under {ckpt_dir} for sweep "
            f"epochs {sweep} — training output layout mismatch?"
        )

    schedule = "6-step --fast" if args.fast else "full 50-step"
    lines = [
        "# Diffusion training-to-quality proxy run (synthetic corpus)",
        "",
        f"Full-size {args.arch} trained from scratch with "
        "`cli.main_diffuse` on the",
        f"synthetic speech-like corpus ({args.train_pairs} train pairs, "
        f"{args.seconds:.0f}s, 0-10 dB SNR pink noise,",
        f"{args.epochs} epochs x "
        f"{args.train_pairs // args.batch_size} steps, adamw lr {args.lr}),",
        f"sampled with the {schedule} reverse schedule via "
        "`cli.inference_diffuse`",
        "(reference inference_diffuse.py:117-269).  Generated by",
        "`scripts/train_diffusion_proxy.py` on one TPU v5e chip.",
    ]
    tag = "_fast" if args.fast else ""
    return write_proxy_report(
        args.report, lines, base, rows, "epoch",
        os.path.join(args.root, f"diffusion_{args.arch}{tag}.json"),
        {
            "arch": args.arch, "fast": bool(args.fast),
            "epochs": args.epochs, "seed": args.train_seed,
            "lr": args.lr, "batch_size": args.batch_size,
        },
        "per_epoch",
    )


if __name__ == "__main__":
    raise SystemExit(main())
