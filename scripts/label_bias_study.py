"""PESQ-engine label-bias sensitivity study (VERDICT r4 next #3).

The native PESQ engine (native/pesq) is calibrated to published anchors
but cannot be validated bit-exactly against the ITU binary offline
(docs/pesq_validation.md).  Every discriminator label flows through
``metrics.pesq.batch_pesq_raw``; this study bounds the *downstream* cost
of a plausible engine-vs-ITU deviation by training short proxy arms with
deliberately perturbed labels — constant bias ±0.1 / ±0.3 MOS and
zero-mean noise σ=0.1 — via the SE_TPU_PESQ_LABEL_BIAS/NOISE env knobs,
and reporting final trained PESQ/STOI deltas vs the unperturbed control.

The EVALUATION path (metrics.composite.compute_metrics -> metrics.pesq
.pesq) is untouched by the knobs, so all arms are scored by the same
unperturbed engine; only what the discriminator *learns from* changes.

Usage (TPU, ~1.5 h for all 6 arms):
  python scripts/label_bias_study.py --root /tmp/label_bias
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

ARMS = [
    # (name, bias MOS, noise sigma MOS)
    ("control", 0.0, 0.0),
    ("bias+0.1", 0.1, 0.0),
    ("bias-0.1", -0.1, 0.0),
    ("bias+0.3", 0.3, 0.0),
    ("bias-0.3", -0.3, 0.0),
    ("noise0.1", 0.0, 0.1),
]


def run_arm(name: str, bias: float, noise: float, root: str,
            epochs: int) -> dict:
    arm_root = os.path.join(root, name.replace("+", "p").replace("-", "m"))
    record = os.path.join(arm_root, "ab_scp.json")
    if os.path.exists(record):
        print(f"[{name}] record exists, skipping", flush=True)
    else:
        env = dict(os.environ)
        env["SE_TPU_PESQ_LABEL_BIAS"] = str(bias)
        env["SE_TPU_PESQ_LABEL_NOISE"] = str(noise)
        cmd = [
            sys.executable, os.path.join(HERE, "train_quality_proxy.py"),
            "--root", arm_root, "--epochs", str(epochs),
            "--arch", "scp", "--precision", "bf16", "--fused-attention",
            "--report", os.path.join(arm_root, "report.md"),
        ]
        print(f"[{name}] bias={bias} noise={noise} ...", flush=True)
        r = subprocess.run(cmd, env=env, cwd=REPO)
        if r.returncode != 0 and not os.path.exists(record):
            raise SystemExit(f"arm {name} failed (rc={r.returncode})")
    with open(record) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/label_bias")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--report", default="docs/label_bias_study.md")
    args = ap.parse_args()

    results = {}
    for name, bias, noise in ARMS:
        results[name] = run_arm(name, bias, noise, args.root, args.epochs)

    ctrl = results["control"]["per_epoch"]
    ctrl_best = max(v[0] for v in ctrl.values())
    ctrl_best_stoi = max(v[5] for v in ctrl.values())
    lines = [
        "# PESQ label-bias sensitivity study",
        "",
        "Each arm is an 8-epoch full-size SCP-GAN proxy run "
        "(`scripts/train_quality_proxy.py`, bf16 + fused attention, "
        "pipelined step mode, same corpus/seed) with the discriminator's "
        "PESQ labels deliberately perturbed through "
        "`SE_TPU_PESQ_LABEL_BIAS/NOISE` (injected in "
        "`metrics.pesq.batch_pesq_raw`, i.e. BOTH the train labels and "
        "the best-checkpoint validation disc loss).  All arms are "
        "evaluated by the same UNPERTURBED engine.  Context: the "
        "engine's own anchor-conformance bound is "
        "docs/pesq_validation.md — this table converts a hypothetical "
        "engine-vs-ITU deviation into trained-quality cost.",
        "",
        "| arm | bias (MOS) | noise σ (MOS) | best PESQ | Δ vs control "
        "| best STOI | Δ | final-epoch PESQ |",
        "|---|---|---|---|---|---|---|---|",
    ]
    record = {}
    for name, bias, noise in ARMS:
        pe = results[name]["per_epoch"]
        best = max(v[0] for v in pe.values())
        best_stoi = max(v[5] for v in pe.values())
        final = pe[max(pe, key=int)][0]
        lines.append(
            f"| {name} | {bias:+.1f} | {noise:.1f} | {best:.3f} | "
            f"{best - ctrl_best:+.3f} | {best_stoi:.3f} | "
            f"{best_stoi - ctrl_best_stoi:+.3f} | {final:.3f} |"
        )
        record[name] = {"bias": bias, "noise": noise, "best_pesq": best,
                        "best_stoi": best_stoi, "final_pesq": final,
                        "per_epoch": pe}
    # headline = the PERTURBED arm farthest from control (min over all
    # arms would nonsensically pick the control itself whenever every
    # perturbed arm happens to beat it)
    worst = max((r for k, r in record.items() if k != "control"),
                key=lambda r: abs(r["best_pesq"] - ctrl_best))
    lines += [
        "",
        f"Largest |Δ| across perturbed arms: ΔPESQ "
        f"{worst['best_pesq'] - ctrl_best:+.3f} (bias {worst['bias']:+.1f}"
        f", σ {worst['noise']:.1f}).",
        "",
        "Synthetic proxy corpus — a sensitivity bound, not a VoiceBank "
        "claim.",
    ]
    os.makedirs(os.path.dirname(args.report) or ".", exist_ok=True)
    with open(args.report, "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.splitext(args.report)[0] + ".json", "w") as f:
        json.dump({"noisy": results["control"]["noisy"], "arms": record},
                  f, indent=1)
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
