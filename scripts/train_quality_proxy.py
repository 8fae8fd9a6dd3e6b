"""Training-to-quality proxy: prove the SCP-GAN recipe improves PESQ/STOI.

No VoiceBank-DEMAND data exists in this environment, so this script
validates the full training recipe (not just the step functions) on a
synthetic corpus: speech-like harmonic carriers (pitch train + formant
emphasis + syllabic envelope) degraded by lowpass-filtered noise at
0-10 dB SNR.  It drives the REAL entry points end to end —
``cli.main_gan`` for training and ``cli.inference_gan``'s checkpoint
sweep for evaluation (reference inference_gan.py:134-152) — then writes
``docs/quality_proxy_run.md`` and exits non-zero unless enhanced PESQ and
STOI beat the noisy baseline.

Usage (TPU, ~20-30 min including compiles):
  python scripts/train_quality_proxy.py --root /tmp/quality_proxy
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

SR = 16000


# two synthetic "speakers": a low-pitch profile (the original corpus) and
# a higher-pitch one with shifted formant ranges — VoiceBank-DEMAND mixes
# speakers, and an arch ranking measured on one voice could be
# speaker-specific (VERDICT r4 weak #4)
SPEAKERS = (
    dict(f0=(90, 220), formants=([400, 900, 2200], [800, 1800, 3200])),
    dict(f0=(165, 330), formants=([550, 1100, 2500], [950, 2100, 3700])),
)


def synth_speech(rng: np.random.Generator, seconds: float,
                 speaker: int = 0) -> np.ndarray:
    """Speech-like carrier: harmonic pulse train with random f0 contour,
    formant-shaped spectrum, and a syllabic (2-6 Hz) amplitude envelope."""
    prof = SPEAKERS[speaker]
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0 = rng.uniform(*prof["f0"]) * (
        1 + 0.08 * np.sin(2 * np.pi * rng.uniform(1, 3) * t)
    )
    phase = 2 * np.pi * np.cumsum(f0) / SR
    sig = np.zeros(n)
    formants = rng.uniform(*prof["formants"])
    for k in range(1, 40):
        fk = k * np.mean(f0)
        if fk > 4000:
            break
        # formant emphasis: resonance-shaped harmonic amplitudes
        amp = sum(1.0 / (1.0 + ((fk - F) / 220.0) ** 2) for F in formants)
        sig += (amp / k ** 0.5) * np.sin(k * phase + rng.uniform(0, 2 * np.pi))
    # syllabic envelope with soft pauses (never fully silent: the collator's
    # PESQ silence gate and normalize_batch need energy)
    env = 0.15 + 0.85 * np.clip(
        np.sin(2 * np.pi * rng.uniform(2, 6) * t + rng.uniform(0, 2 * np.pi)),
        0, None,
    )
    sig *= env
    return (0.05 * sig / (np.sqrt((sig ** 2).mean()) + 1e-9)).astype(np.float32)


NOISE_FAMILIES = ("pink", "white", "band", "babble")


def synth_noise(rng: np.random.Generator, n: int,
                family: str = "pink") -> np.ndarray:
    """One noise utterance of the given family.  ``pink`` (one-pole
    lowpassed white) is the original corpus; ``white``/``band``
    (random-passband bandpass)/``babble`` (a sum of competing synthetic
    voices, amplitude-modulated and non-stationary like cafe noise)
    approximate the spread of VoiceBank-DEMAND's 10 recorded noise types
    (reference README.md:21)."""
    if family == "white":
        out = rng.standard_normal(n)
    elif family == "band":
        from scipy import signal as sps

        lo = rng.uniform(300, 1200)
        hi = lo + rng.uniform(800, 2800)
        b, a = sps.butter(4, [lo / (SR / 2), hi / (SR / 2)], "band")
        out = sps.lfilter(b, a, rng.standard_normal(n))
    elif family == "babble":
        out = np.zeros(n)
        for _ in range(4):
            v = synth_speech(rng, n / SR, speaker=int(rng.integers(2)))
            out[: len(v)] += v[:n]
    else:  # pink
        w = rng.standard_normal(n + 1)
        a = 0.9
        out = np.empty(n + 1)
        out[0] = w[0]
        for i in range(1, n + 1):
            out[i] = a * out[i - 1] + (1 - a) * w[i]
        out = out[1:]
    return (out / (np.sqrt((out ** 2).mean()) + 1e-9)).astype(np.float32)


def make_corpus(root: str, n_train: int, n_test: int, seconds: float,
                rng: np.random.Generator, corpus: str = "pink") -> None:
    """``corpus='pink'``: the original single-speaker pink-noise corpus
    (kept so new arms stay comparable to earlier recorded runs);
    ``'rich'``: both speakers and all four noise families interleaved
    deterministically, so train AND test cover every (speaker, noise)
    cell."""
    from speech_enhancement_tpu.data import save_wav

    for split, count in (("train", n_train), ("test", n_test)):
        cdir = os.path.join(root, split, "clean")
        ndir = os.path.join(root, split, "noisy")
        os.makedirs(cdir, exist_ok=True)
        os.makedirs(ndir, exist_ok=True)
        for i in range(count):
            if corpus == "rich":
                speaker = i % len(SPEAKERS)
                family = NOISE_FAMILIES[i % len(NOISE_FAMILIES)]
            else:
                speaker, family = 0, "pink"
            clean = synth_speech(rng, seconds, speaker=speaker)
            noise = synth_noise(rng, len(clean), family=family)
            snr_db = rng.uniform(0, 10)
            rms_c = np.sqrt((clean ** 2).mean())
            noise *= rms_c / (10 ** (snr_db / 20))
            save_wav(os.path.join(cdir, f"u{i:04d}.wav"), clean, SR)
            save_wav(os.path.join(ndir, f"u{i:04d}.wav"),
                     (clean + noise).astype(np.float32), SR)


def write_proxy_report(report_path: str, preamble: list[str],
                       base: np.ndarray, rows: list, row_label: str,
                       record_path: str, record_fields: dict,
                       per_key: str, require_stoi: bool = False) -> int:
    """Shared report/summary/record writer for the three proxy scripts.

    Builds the 6-metric markdown table (noisy baseline + one row per
    swept checkpoint), the ``Best <label> N: PESQ X vs noisy Y (Δ Z)``
    summary line that tests/test_quality_proxy.py and
    tests/test_diffusion_proxy.py regex-parse, and the machine-readable
    JSON record; prints the summary and the PASS/FAIL gate (PESQ must
    beat noisy; ``require_stoi`` adds STOI >= noisy).  Returns the
    process exit code.  Kept in ONE place so a format tweak cannot
    silently break the pinned regex in two of the three scripts.
    """
    import json

    if not rows:
        raise SystemExit(
            "no restorable checkpoints found to sweep — training output "
            "layout mismatch or an aborted run?"
        )
    lines = list(preamble) + [
        "",
        "| checkpoint | PESQ | CSIG | CBAK | COVL | SSNR | STOI |",
        "|---|---|---|---|---|---|---|",
        "| noisy (baseline) | " + " | ".join(f"{v:.3f}" for v in base) + " |",
    ]
    for key, m in rows:
        lines.append(f"| {row_label} {key} | " +
                     " | ".join(f"{v:.3f}" for v in m) + " |")
    best = max(rows, key=lambda r: r[1][0])
    lines += [
        "",
        f"Best {row_label} {best[0]}: PESQ {best[1][0]:.3f} vs noisy "
        f"{base[0]:.3f} (Δ {best[1][0] - base[0]:+.3f}); "
        f"STOI {best[1][5]:.3f} vs {base[5]:.3f} "
        f"(Δ {best[1][5] - base[5]:+.3f}).",
    ]
    report_dir = os.path.dirname(report_path)
    if report_dir:
        os.makedirs(report_dir, exist_ok=True)
    with open(report_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[-2:]))

    record_dir = os.path.dirname(record_path)
    if record_dir:
        os.makedirs(record_dir, exist_ok=True)
    with open(record_path, "w") as f:
        json.dump({
            **record_fields,
            "noisy": [float(v) for v in base],
            per_key: {str(k): [float(v) for v in m] for k, m in rows},
        }, f, indent=1)

    ok = best[1][0] > base[0] and (not require_stoi or best[1][5] >= base[5])
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/quality_proxy")
    ap.add_argument("--train-pairs", type=int, default=320)
    ap.add_argument("--test-pairs", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--report", default="docs/quality_proxy_run.md")
    ap.add_argument("--precision", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--fused-attention", action="store_true",
                    help="train with the fused Pallas attention "
                         "(forward + flash-style backward) — the round-4 "
                         "recommended TPU training config together with "
                         "--precision bf16")
    ap.add_argument("--arch", default="scp",
                    choices=["scp", "cp", "sc", "cmgan"],
                    help="arch arm for the A/B on the quality proxy "
                         "(reference core/function.py:231-254, 292-305); "
                         "per-epoch metrics also land in <root>/ab_<arch>."
                         "json for scripts-side comparison tables")
    ap.add_argument("--train-seed", type=int, default=3,
                    help="main_gan --seed (init + loader stream); vary for "
                         "seed-robustness runs — the corpus itself stays "
                         "fixed (rng 7) so runs share the train/test data")
    ap.add_argument("--corpus", default="pink", choices=["pink", "rich"],
                    help="'pink': original single-speaker pink-noise "
                         "corpus (comparable to earlier recorded runs); "
                         "'rich': 2 speakers x 4 noise families (pink/"
                         "white/band/babble) — closer to VoiceBank-"
                         "DEMAND's noise-type spread")
    ap.add_argument("--step-mode", default=None,
                    choices=["two-phase", "async", "pipelined", "fused"],
                    help="main_gan --step-mode passthrough: quality A/B of "
                         "the two-deep pipelined dispatch (disc updates lag "
                         "two batches) against the reference-faithful async")
    args = ap.parse_args()

    rng = np.random.default_rng(7)
    print("synthesizing corpus ...", flush=True)
    make_corpus(args.root, args.train_pairs, args.test_pairs, args.seconds,
                rng, corpus=args.corpus)

    from speech_enhancement_tpu.cli import inference_gan, main_gan
    from speech_enhancement_tpu.data import load_wav
    from speech_enhancement_tpu.metrics import compute_metrics

    cfg = "speech_enhancement_tpu/config/scp.yaml"
    out = os.path.join(args.root, "run")
    opts = [
        "--opts",
        "DATA.TRAIN_CLEAN_DIR", f"{args.root}/train/clean",
        "DATA.TRAIN_NOISY_DIR", f"{args.root}/train/noisy",
        "DATA.TEST_CLEAN_DIR", f"{args.root}/test/clean",
        "DATA.TEST_NOISY_DIR", f"{args.root}/test/noisy",
        "DATA.BATCH_SIZE", str(args.batch_size),
    ]

    print(f"training {args.arch}-GAN (full-size) ...", flush=True)
    main_gan.main([
        "-a", args.arch, "--cfg", cfg, "--output", out,
        "--epochs", str(args.epochs), "--optimizer", "adamw",
        "--lr", "5e-4", "--criterion", "mse", "--gen-first",
        "--seed", str(args.train_seed), "-j", "4", "-p", "20",
        "--precision", args.precision,
    ] + (["--fused-attention"] if args.fused_attention else [])
      + (["--step-mode", args.step_mode] if args.step_mode else []) + opts)

    # noisy baseline on the test set
    import glob as _glob
    noisy_paths = sorted(_glob.glob(f"{args.root}/test/noisy/*.wav"))
    base = np.zeros(6)
    for p in noisy_paths:
        # join on the basename, NOT p.replace("noisy","clean"): a --root
        # containing the substring "noisy" would corrupt the whole path
        clean, _ = load_wav(os.path.join(args.root, "test", "clean",
                                         os.path.basename(p)), SR)
        noisy, _ = load_wav(p, SR)
        base += np.array(compute_metrics(clean, noisy, SR, 0))
    base /= len(noisy_paths)

    print("sweeping checkpoints ...", flush=True)
    iargs, icfg = inference_gan.parse_option([
        "--output", os.path.join(args.root, "enhanced"),
        "--model_path", "unused", "--cfg", cfg, "--batch-size", "24",
    ] + opts)
    ckpt_dir = os.path.join(out, args.arch, "default")
    rows = []
    for epoch in range(args.epochs):
        mp = os.path.join(ckpt_dir, f"checkpoint_{epoch:04d}")
        if not os.path.isdir(mp):
            continue
        m = inference_gan.inference(iargs, icfg, mp, noisy_paths)
        m /= len(noisy_paths)
        rows.append((epoch, m))
        print(f"epoch {epoch}: pesq {m[0]:.3f} stoi {m[5]:.3f}", flush=True)

    preamble = [
        "# Training-to-quality proxy run (synthetic corpus)",
        "",
        f"Full-size {args.arch.upper()}-GAN trained from scratch with "
        "`cli.main_gan` on a",
        f"synthetic speech-like corpus ({args.train_pairs} train pairs, "
        f"{args.seconds:.0f}s, 0-10 dB SNR, "
        + ("2 speakers x 4 noise families" if args.corpus == "rich"
           else "pink noise") + "), evaluated with the",
        "`cli.inference_gan` checkpoint sweep on held-out pairs",
        "(reference inference_gan.py:134-152). Generated by",
        f"`scripts/train_quality_proxy.py` on one TPU v5e chip "
        f"({args.precision} training).",
    ]
    # machine-readable per-arch record for the A/B comparison table
    tag = f"_{args.step_mode}" if args.step_mode else ""
    if args.corpus != "pink":
        tag += f"_{args.corpus}"
    if args.train_seed != 3:  # seed-robustness arms don't clobber the base record
        tag += f"_s{args.train_seed}"
    return write_proxy_report(
        args.report, preamble, base, rows, "epoch",
        os.path.join(args.root, f"ab_{args.arch}{tag}.json"),
        {
            "arch": args.arch, "precision": args.precision,
            "fused_attention": bool(args.fused_attention),
            "step_mode": args.step_mode, "corpus": args.corpus,
            "epochs": args.epochs, "seed": args.train_seed,
        },
        "per_epoch", require_stoi=True,
    )


if __name__ == "__main__":
    raise SystemExit(main())
