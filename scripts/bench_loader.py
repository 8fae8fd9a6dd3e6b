"""DataLoader + Collator feed-rate benchmark (VERDICT r2 #8).

Synthesizes a VoiceBank-shaped corpus (speech-like wavs, 2-4 s), then
measures host batches/s of the full pipeline — wav load, crop/tile with
the 10x PESQ silence retry, and the two batch-PESQ label passes — at the
hardware-validated training batch (8 x 1 s) and the serving batch (32).
Compares against the measured train step (0.57 s/step at batch 8, i.e.
the loader must sustain >= 1.75 batches/s to keep the TPU fed).

Usage: python scripts/bench_loader.py [--n-utts 96] [--epochs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000


def synth_corpus(root: str, n: int) -> tuple[str, str]:
    from speech_enhancement_tpu.data import save_wav

    clean_dir = os.path.join(root, "clean")
    noisy_dir = os.path.join(root, "noisy")
    os.makedirs(clean_dir)
    os.makedirs(noisy_dir)
    rng = np.random.default_rng(0)
    for i in range(n):
        dur = rng.uniform(2.0, 4.0)
        t = np.arange(int(dur * SR)) / SR
        f0 = 110.0 + 15.0 * (i % 8)
        x = sum((0.5 / h) * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6))
                for h in range(1, 5))
        x *= 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(2, 4) * t)
        x = (0.4 * x / np.abs(x).max()).astype(np.float32)
        noise = 0.05 * rng.standard_normal(len(x)).astype(np.float32)
        save_wav(os.path.join(clean_dir, f"p{i:03d}.wav"), x, SR)
        save_wav(os.path.join(noisy_dir, f"p{i:03d}.wav"), x + noise, SR)
    return clean_dir, noisy_dir


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-utts", type=int, default=96)
    p.add_argument("--epochs", type=int, default=2)
    args = p.parse_args()

    from speech_enhancement_tpu.data import Collator, DataLoader, VoicebankDataset

    with tempfile.TemporaryDirectory() as root:
        clean_dir, noisy_dir = synth_corpus(root, args.n_utts)
        ds = VoicebankDataset(clean_dir, noisy_dir)

        results = []
        for batch_size, workers in ((8, 4), (8, 8), (32, 8)):
            collator = Collator(crop_len=1, precompute_labels=True,
                                rng=np.random.default_rng(1))
            loader = DataLoader(ds, batch_size, collator, num_workers=workers)
            # warm epoch populates OS caches / builds libpesq
            for _ in loader:
                pass
            t0 = time.perf_counter()
            n_batches = 0
            for epoch in range(args.epochs):
                loader.set_epoch(epoch + 1)
                for batch in loader:
                    assert batch.pesq_clean is not None
                    n_batches += 1
            dt = time.perf_counter() - t0
            bps = n_batches / dt
            rec = {
                "batch_size": batch_size, "workers": workers,
                "batches_per_sec": round(bps, 2),
                "utts_per_sec": round(bps * batch_size, 1),
                "sustains_057s_train_step": bool(bps >= 1.0 / 0.57),
            }
            results.append(rec)
            print(json.dumps(rec))
        print(json.dumps({"train_step_requirement_batches_per_sec": 1.75,
                          "all": results}))


if __name__ == "__main__":
    main()
