"""Turn-key VoiceBank-DEMAND quality-parity runbook (VERDICT r2 #9).

Given the four VoiceBank-DEMAND directories, this runs the full reference
recipe per system — 100-epoch training (SCP-GAN and/or CMGAN, disc lr =
2x gen lr, MSE criterion, reference loss weights) and the 824-utterance
best-PESQ checkpoint sweep (inference_gan.py:129-152) — and emits a
BASELINE.md-format table comparing against the reference's published
numbers (inference_gan.py:168-187).  A data drop converts to parity
numbers with zero additional engineering:

    python scripts/run_quality_parity.py \
        --train-clean .../clean_trainset_28spk_wav \
        --train-noisy .../noisy_trainset_28spk_wav \
        --test-clean  .../clean_testset_wav \
        --test-noisy  .../noisy_testset_wav \
        --arch scp cmgan --epochs 100 -o runs/parity

Training is restartable (--resume auto is passed through), so a
preempted run continues from the last checkpoint.  Use --dry-run to
print the exact CLI commands without executing.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REFERENCE_ROWS = {
    # best published run per system (BASELINE.md / inference_gan.py:168-187)
    "cmgan": (3.387, 4.623, 3.914, 4.103, 10.879, 0.957),
    "scp": (3.163, 4.371, 3.760, 3.838, 10.163, 0.954),
    "sc": (3.287, 4.539, 3.860, 4.007, None, None),
}
METRIC_NAMES = ("PESQ", "CSIG", "CBAK", "COVL", "SSNR", "STOI")


def build_config(out_dir: str, args) -> str:
    """Write the run's YAML overlay: reference recipe + the data drop."""
    cfg_path = os.path.join(out_dir, "parity.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            "BASE: ['scp.yaml']\n"
            "DATA:\n"
            f"  TRAIN_CLEAN_DIR: '{os.path.abspath(args.train_clean)}'\n"
            f"  TRAIN_NOISY_DIR: '{os.path.abspath(args.train_noisy)}'\n"
            f"  TEST_CLEAN_DIR: '{os.path.abspath(args.test_clean)}'\n"
            f"  TEST_NOISY_DIR: '{os.path.abspath(args.test_noisy)}'\n"
        )
    return cfg_path


def commands_for(arch: str, cfg: str, out_dir: str, args) -> list[list[str]]:
    """The exact CLI invocations of the reference recipe for one system."""
    model_dir = os.path.join(out_dir, arch)
    loss_weights = ("[0.3,0.7,0.2,0.05]" if arch in ("scp", "sc")
                    else "[0.1,0.9,0.2,0.05]")  # scp.yaml:6 vs baseline
    train = [
        sys.executable, "-m", "speech_enhancement_tpu.cli.main_gan",
        "-a", arch, "--cfg", cfg, "--output", model_dir, "--tag", "parity",
        "--epochs", str(args.epochs), "-b", str(args.batch_size),
        "--criterion", "mse", "--gen-first", "--resume", "auto",
        "--step-mode", args.step_mode,
        "--precision", args.train_precision,
        "--opts", "LOSS_WEIGHTS", loss_weights,
    ]
    sweep = [
        sys.executable, "-m", "speech_enhancement_tpu.cli.inference_gan",
        "--cfg", cfg, "--output", os.path.join(model_dir, "enhanced"),
        "--model_path", os.path.join(model_dir, arch, "parity"),
        "--validate-epochs",
        "--start", str(max(0, args.epochs - args.sweep_last)),
        "--end", str(args.epochs),
        "--batch-size", "32", "--precision", args.precision,
    ]
    return [train, sweep]


def parse_sweep_output(text: str):
    """Best epoch + its 6-metric row from the inference_gan sweep output."""
    best_epoch = None
    m = re.search(r"Best epoch: (\d+)\s+best PESQ: ([\d.]+)", text)
    if m:
        best_epoch = int(m.group(1))
    rows = re.findall(
        r"Epoch: (\d+)\n"
        r"pesq: ([\d.]+)\s+csig: ([\d.]+)\s+cbak: ([\d.]+)\s+"
        r"covl: ([\d.]+)\s+ssnr: ([-\d.]+)\s+stoi: ([\d.]+)",
        text,
    )
    by_epoch = {int(r[0]): tuple(float(v) for v in r[1:]) for r in rows}
    if best_epoch is None and by_epoch:
        best_epoch = max(by_epoch, key=lambda e: by_epoch[e][0])
    return best_epoch, by_epoch.get(best_epoch)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--train-clean", required=True)
    p.add_argument("--train-noisy", required=True)
    p.add_argument("--test-clean", required=True)
    p.add_argument("--test-noisy", required=True)
    p.add_argument("--arch", nargs="+", default=["scp", "cmgan"],
                   choices=["scp", "cp", "sc", "cmgan"])
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=8,
                   help="8 x 1 s crops: the hardware-validated v5e config")
    p.add_argument("--sweep-last", type=int, default=20,
                   help="checkpoint sweep covers the last N epochs")
    p.add_argument("--step-mode", default="async",
                   choices=["two-phase", "async"],
                   help="async overlaps host PESQ labels (docs/TRAIN_BENCH.md)")
    p.add_argument("--train-precision", default="bf16",
                   choices=["fp32", "bf16"],
                   help="bf16 is quality-transparent on the proxy corpus "
                        "(docs/quality_proxy_run.md) and 1.37x faster")
    p.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    p.add_argument("-o", "--output", default="runs/parity")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()

    out_dir = os.path.abspath(args.output)
    os.makedirs(out_dir, exist_ok=True)
    cfg = build_config(out_dir, args)

    # persistent XLA compile cache for every child process: without it a
    # 2-arch run recompiles TSCNet-64 four times (and again on every
    # --resume auto restart) at 4-8 min each (CLAUDE.md environment rule)
    child_env = dict(os.environ)
    child_env.setdefault("JAX_COMPILATION_CACHE_DIR",
                         os.path.join(HERE, ".jax_cache"))

    results = {}
    for arch in args.arch:
        for cmd in commands_for(arch, cfg, out_dir, args):
            print("$", " ".join(cmd), flush=True)
            if args.dry_run:
                continue
            is_sweep = "--validate-epochs" in cmd
            if is_sweep:
                # capture the sweep to parse metric rows
                proc = subprocess.run(cmd, text=True, capture_output=True,
                                      env=child_env)
                sys.stdout.write(proc.stdout[-4000:])
                sys.stderr.write(proc.stderr[-4000:])
                code = proc.returncode
            else:
                # stream the (possibly 100-epoch) training log live
                code = subprocess.run(cmd, env=child_env).returncode
            if code != 0:
                raise SystemExit(f"{arch}: command failed ({code})")
            if is_sweep:
                best_epoch, row = parse_sweep_output(proc.stdout)
                results[arch] = {"best_epoch": best_epoch, "metrics": row}
    if args.dry_run:
        return

    # BASELINE.md-format report
    lines = [
        "# VoiceBank-DEMAND quality parity\n",
        "| System | Metric | This framework | Reference best | Delta |",
        "|---|---|---|---|---|",
    ]
    for arch, res in results.items():
        ref = REFERENCE_ROWS.get(arch)
        row = res["metrics"]
        if row is None:
            continue
        for name, got, want in zip(METRIC_NAMES, row, ref or [None] * 6):
            delta = f"{got - want:+.3f}" if want is not None else "n/a"
            want_s = f"{want:.3f}" if want is not None else "n/a"
            lines.append(f"| {arch} (epoch {res['best_epoch']}) | {name} | "
                         f"{got:.3f} | {want_s} | {delta} |")
    report = os.path.join(out_dir, "quality_parity_results.md")
    with open(report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nreport written to {report}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
