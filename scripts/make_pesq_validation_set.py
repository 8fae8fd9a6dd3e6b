"""Build (and score) the PESQ cross-validation set.

The repo's PESQ engine (native/pesq/pesq.cc) is a from-scratch
P.862-family implementation calibrated to published anchors — NOT the ITU
reference code the upstream repo uses via the ``pesq`` pip package
(reference utils/compute_metrics.py:61, models/discriminator.py:17-32).
To bound the deviation, this script deterministically synthesizes a
diverse degraded corpus from fixed seeds and — when the real ``pesq``
package is importable (run this on a machine with internet access) —
scores every pair with ITU P.862 and writes the results to
``tests/fixtures/pesq_reference_scores.json``.

With the fixture present, ``tests/test_pesq.py::test_against_itu_fixture``
pins the native engine to |ΔMOS| bounds against those scores.  Without
it, the test skips (this build environment has no network and no ITU
code anywhere on disk, so the fixture cannot be produced here).

The degradations cover the conditions the framework actually feeds the
engine: additive noise at 0-30 dB SNR (white/pink/babble-ish), lowpass
filtering, level changes, clipping, small time shifts, and
enhancement-style residual artifacts.

Usage:
  python scripts/make_pesq_validation_set.py [--score] [--n 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000


def _speech_like(rng: np.random.Generator, seconds: float = 4.0) -> np.ndarray:
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0 = rng.uniform(90, 230) * (1 + 0.1 * np.sin(2 * np.pi * rng.uniform(1, 4) * t))
    phase = 2 * np.pi * np.cumsum(f0) / SR
    sig = np.zeros(n)
    formants = rng.uniform([350, 900, 2100], [850, 1900, 3300])
    for k in range(1, 44):
        fk = k * float(np.mean(f0))
        if fk > 4200:
            break
        amp = sum(1.0 / (1.0 + ((fk - F) / 200.0) ** 2) for F in formants)
        sig += (amp / k ** 0.5) * np.sin(k * phase + rng.uniform(0, 2 * np.pi))
    env = 0.1 + 0.9 * np.clip(
        np.sin(2 * np.pi * rng.uniform(2, 5) * t + rng.uniform(0, 2 * np.pi)), 0, None)
    sig *= env
    return (0.05 * sig / np.sqrt((sig ** 2).mean() + 1e-12)).astype(np.float64)


def _degrade(rng: np.random.Generator, clean: np.ndarray, kind: str,
             severity: float) -> np.ndarray:
    n = len(clean)
    rms = np.sqrt((clean ** 2).mean())
    if kind == "white":
        noise = rng.standard_normal(n)
    elif kind == "pink":
        w = rng.standard_normal(n + 1)
        noise = np.empty(n + 1)
        noise[0] = w[0]
        for i in range(1, n + 1):
            noise[i] = 0.9 * noise[i - 1] + 0.1 * w[i]
        noise = noise[1:]
    elif kind == "babble":
        noise = sum(_speech_like(np.random.default_rng(int(rng.integers(1 << 30))),
                                 n / SR) for _ in range(4))
        noise = noise[:n]
    elif kind == "lowpass":
        # one-pole lowpass of the SIGNAL itself + mild noise
        a = 0.5 + 0.45 * severity
        out = np.empty(n)
        out[0] = clean[0]
        for i in range(1, n):
            out[i] = a * out[i - 1] + (1 - a) * clean[i]
        return out + 0.01 * rms * rng.standard_normal(n)
    elif kind == "clip":
        th = np.quantile(np.abs(clean), 1.0 - 0.4 * severity)
        return np.clip(clean, -th, th)
    elif kind == "residual":
        # enhancement-style artifact: attenuated noise + spectral ripple
        noise = rng.standard_normal(n)
        snr_db = 25 - 20 * severity
        noise *= rms / (10 ** (snr_db / 20))
        return clean * (1 + 0.05 * severity * np.sin(
            2 * np.pi * 3.0 * np.arange(n) / SR)) + 0.3 * noise
    else:
        raise ValueError(kind)
    snr_db = 30 - 30 * severity  # 30 .. 0 dB
    noise = noise / np.sqrt((noise ** 2).mean() + 1e-12)
    return clean + noise * rms / (10 ** (snr_db / 20))


KINDS = ["white", "pink", "babble", "lowpass", "clip", "residual"]


def build_pairs(n: int):
    pairs = []
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        clean = _speech_like(rng)
        kind = KINDS[i % len(KINDS)]
        severity = float(rng.uniform(0.1, 1.0))
        deg = _degrade(rng, clean, kind, severity)
        pairs.append({"seed": 1000 + i, "kind": kind,
                      "severity": round(severity, 4),
                      "clean": clean, "deg": deg})
    return pairs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=102)
    ap.add_argument("--score", action="store_true",
                    help="score with the real `pesq` package and write the fixture")
    ap.add_argument("--out", default="tests/fixtures/pesq_reference_scores.json")
    args = ap.parse_args()

    pairs = build_pairs(args.n)
    print(f"built {len(pairs)} deterministic pairs "
          f"({', '.join(KINDS)} x severities)")

    if not args.score:
        # sanity: run the native engine over the set
        from speech_enhancement_tpu.metrics.pesq import pesq
        scores = [pesq(SR, p["clean"], p["deg"]) for p in pairs[:12]]
        print("native engine sample scores:",
              [round(s, 3) for s in scores])
        return 0

    try:
        from pesq import pesq as itu_pesq  # ITU P.862 via the pip package
    except ImportError:
        print("ERROR: the `pesq` package is not installed; run this on a "
              "machine with `pip install pesq`.", file=sys.stderr)
        return 1

    records = []
    for p in pairs:
        mos = float(itu_pesq(SR, p["clean"], p["deg"], "wb"))
        records.append({"seed": p["seed"], "kind": p["kind"],
                        "severity": p["severity"], "itu_pesq_wb": mos})
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"sample_rate": SR, "mode": "wb", "n": len(records),
                   "generator": "scripts/make_pesq_validation_set.py",
                   "records": records}, f, indent=1)
    print(f"wrote {args.out} ({len(records)} reference scores)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
