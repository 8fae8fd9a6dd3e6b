"""VoiceBank-DEMAND dataset + crop/tile collator + host-sharded loader.

Re-designs datasets/voicebank_dataset.py for a TPU input pipeline:

* filename pairing and 16 kHz loading as in the reference (:36-43);
* the Collator's crop/tile with up-to-10 PESQ silence retries (:69-109)
  — but the PESQ silence check now runs through the native C++ engine,
  and the per-batch clean/clean and clean/noisy PESQ labels the GAN
  discriminator needs every step are *precomputed here on the host*, so
  the device never waits for them (only the clean/enhanced labels are a
  true mid-step host computation);
* instead of torch DataLoader + DistributedSampler, a thread-prefetched
  iterator over per-host shards of the file list: each host feeds its own
  devices, epoch reshuffles are seeded by (seed, epoch) like
  sampler.set_epoch (main_gan.py:278-279).
"""

from __future__ import annotations

import queue
import threading
from glob import glob
from typing import Iterator, NamedTuple

import numpy as np

from speech_enhancement_tpu.data.audio_io import load_wav


class VoicebankDataset:
    """Pairs noisy/clean wavs by directory substitution
    (voicebank_dataset.py:21-60)."""

    def __init__(
        self,
        clean_path: str,
        noisy_path: str,
        samples_per_frame: int = 100,
        crop_frames: int = 160,
        random_crop: bool = False,
        sample_rate: int = 16000,
    ):
        self.clean_path = clean_path
        self.noisy_path = noisy_path
        self.samples_per_frame = samples_per_frame
        self.crop_frames = crop_frames
        self.random_crop = random_crop
        self.sample_rate = sample_rate
        self.data_paths = sorted(glob(f"{noisy_path}/*.wav", recursive=True))

    def __len__(self) -> int:
        return len(self.data_paths)

    def __getitem__(self, idx: int,
                    rng: np.random.Generator | None = None) -> dict:
        """``rng`` (optional) makes the random crop deterministic: the
        DataLoader passes a per-batch Generator keyed by
        (seed, epoch, shard, batch) so the stream is reproducible at any
        worker count.  Bare ``ds[idx]`` falls back to the global rng."""
        noisy_file = self.data_paths[idx]
        clean_file = noisy_file.replace(self.noisy_path, self.clean_path)
        clean, _ = load_wav(clean_file, self.sample_rate)
        noisy, _ = load_wav(noisy_file, self.sample_rate)
        if self.random_crop:
            L = self.crop_frames * self.samples_per_frame
            hi = max(1, len(clean) - L)
            start = (int(rng.integers(0, hi)) if rng is not None
                     else np.random.randint(0, hi))
            clean = clean[start : start + L]
            noisy = noisy[start : start + L]
        return {"audio": clean, "noisy": noisy}


class Batch(NamedTuple):
    """One fixed-shape host batch.  ``pesq_clean`` / ``pesq_noisy`` are the
    precomputed normalized PESQ labels ((pesq-1)/3.5) for the
    discriminator's L_C / L_N terms (function.py:293-301)."""

    audio: np.ndarray
    noisy: np.ndarray
    pesq_clean: np.ndarray | None
    pesq_noisy: np.ndarray | None


class Collator:
    """Crop/tile records to a fixed length with PESQ silence retry
    (voicebank_dataset.py:62-117)."""

    # PESQ(x, x) self-anchor, lazily pinned by one engine call, keyed by
    # sample_rate (wideband vs narrowband anchors differ).  Class-level:
    # shared across collator instances and worker threads; benign race —
    # every writer stores the same constant for a given rate.
    _pesq_self_anchor: dict[int, float] = {}

    def __init__(
        self,
        samples_per_frame: int = 100,
        crop_frames: int = 160,
        crop_len: int = 1,
        rng: np.random.Generator | None = None,
        silence_check: bool = True,
        precompute_labels: bool = False,
        sample_rate: int = 16000,
    ):
        self.crop_len = samples_per_frame * crop_frames * crop_len
        self.rng = rng or np.random.default_rng()
        self.silence_check = silence_check
        self.precompute_labels = precompute_labels
        self.sample_rate = sample_rate

    def _recrop(
        self, record: dict, rng: np.random.Generator | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        rng = rng if rng is not None else self.rng
        clean, noisy = record["audio"], record["noisy"]
        length = len(clean)
        if length < self.crop_len:
            units = self.crop_len // length
            rem = self.crop_len % length
            clean = np.concatenate([clean] * units + [clean[:rem]])
            noisy = np.concatenate([noisy] * units + [noisy[:rem]])
        else:
            start = int(rng.integers(0, length - self.crop_len + 1))
            clean = clean[start : start + self.crop_len]
            noisy = noisy[start : start + self.crop_len]
        return clean, noisy

    def collate(self, minibatch: list[dict],
                rng: np.random.Generator | None = None) -> Batch:
        """``rng`` (optional) overrides the collator's own generator for
        this call — the DataLoader passes a per-batch Generator so
        concurrent workers never share (thread-unsafe) rng state."""
        from speech_enhancement_tpu.metrics.pesq import batch_pesq_raw, pesq_loss

        cleans, noisys = [], []
        for record in minibatch:
            clean = noisy = None
            for _ in range(10):  # ten chances to avoid a silent crop
                c, n = self._recrop(record, rng)
                if not self.silence_check or pesq_loss(c, n, self.sample_rate) != -1:
                    clean, noisy = c, n
                    break
            if clean is not None:
                cleans.append(clean)
                noisys.append(noisy)
        if not cleans:
            return Batch(
                np.zeros((0, self.crop_len), np.float32),
                np.zeros((0, self.crop_len), np.float32),
                None, None,
            )
        audio = np.stack(cleans).astype(np.float32)
        noisy = np.stack(noisys).astype(np.float32)
        pesq_clean = pesq_noisy = None
        if self.precompute_labels:
            # labels are computed on the RMS-normalized signals the train
            # step sees (function.py:647-659 normalization happens on
            # device; PESQ is level-aligned so normalization is a no-op
            # for the score — use the raw crops directly)
            if self.silence_check:
                # PESQ(x, x) is a CONSTANT for any non-silent x (every
                # disturbance term is exactly zero -> the fixed 4.644
                # self-anchor), and the silence retry above already
                # guaranteed non-silent crops — so one engine call pins the
                # constant and the whole q_clean batch pass is skipped
                # (halves the label cost; labels are the loader's
                # bottleneck, docs/LOADER_BENCH.md)
                anchor = Collator._pesq_self_anchor.get(self.sample_rate)
                if anchor is None:
                    # exclude_noise: this one score is cached for the whole
                    # process — a frozen random draw would be a constant
                    # clean-label bias, not the per-label noise the study's
                    # noise knob models (the bias knob still applies)
                    anchor = float(
                        batch_pesq_raw(audio[:1], audio[:1],
                                       self.sample_rate,
                                       exclude_noise=True)[0]
                    )
                    Collator._pesq_self_anchor[self.sample_rate] = anchor
                pesq_clean = np.full(
                    len(cleans), (anchor - 1.0) / 3.5, np.float32,
                )
            else:
                pesq_clean = (
                    (batch_pesq_raw(audio, audio, self.sample_rate) - 1.0)
                    / 3.5
                ).astype(np.float32)
            pesq_noisy = ((batch_pesq_raw(audio, noisy, self.sample_rate) - 1.0)
                          / 3.5).astype(np.float32)
        return Batch(audio, noisy, pesq_clean, pesq_noisy)


class DataLoader:
    """Host-sharded, thread-prefetched batch iterator.

    Replaces torch DataLoader + DistributedSampler: this host sees
    ``shard_id / num_shards`` of the shuffled file list each epoch
    (per-epoch reshuffle seeded like set_epoch), loads + collates on
    worker threads, and yields fixed-shape numpy batches ready to be
    device_put against the mesh's data axis.
    """

    def __init__(
        self,
        dataset: VoicebankDataset,
        batch_size: int,
        collator: Collator,
        shuffle: bool = True,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
        num_workers: int = 4,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collator = collator
        self.shuffle = shuffle
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idx)
        if self.num_shards > 1 and len(idx) % self.num_shards:
            # pad to a multiple of the shard count by wrapping (torch
            # DistributedSampler semantics): every shard then has the
            # SAME length, so per-process batch counts match and jitted
            # collective steps stay in lockstep — strided sharding of a
            # ragged index list gives shard 0 one extra element, which
            # can mean one extra batch on some processes (a hang inside
            # a global-mesh eval/train step)
            total = -(-len(idx) // self.num_shards) * self.num_shards
            idx = np.concatenate([idx, idx[: total - len(idx)]])
        return idx[self.shard_id :: self.num_shards]

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_rng(self, batch_index: int) -> np.random.Generator:
        """Deterministic per-batch generator: keyed by
        (seed, epoch, shard, batch) so the emitted stream is identical for
        any num_workers and any thread schedule."""
        return np.random.default_rng(
            np.random.SeedSequence(
                (self.seed, self.epoch, self.shard_id, batch_index)
            )
        )

    def __iter__(self) -> Iterator[Batch]:
        idx = self._indices()
        n_batches = len(self)
        batches = [
            idx[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        out_q: queue.Queue = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()
        # capability probes (once, not per batch): does the dataset /
        # collator accept the per-batch rng?
        import inspect

        ds_takes_rng = "rng" in inspect.signature(
            self.dataset.__getitem__
        ).parameters
        co_takes_rng = "rng" in inspect.signature(
            self.collator.collate
        ).parameters

        def worker(batch_ids: list[int]):
            for b in batch_ids:
                if stop.is_set():
                    return
                try:
                    rng = self._batch_rng(b)
                    records = [
                        self.dataset.__getitem__(int(i), rng)
                        if ds_takes_rng else self.dataset[int(i)]
                        for i in batches[b]
                    ]
                    out_q.put((
                        b,
                        self.collator.collate(records, rng)
                        if co_takes_rng else self.collator.collate(records),
                    ))
                except Exception as exc:  # surface worker failures
                    out_q.put((b, exc))
                    return

        # round-robin batch assignment keeps ordering deterministic per slot
        threads = [
            threading.Thread(
                target=worker, args=(list(range(w, n_batches, self.num_workers)),),
                daemon=True,
            )
            for w in range(min(self.num_workers, max(n_batches, 1)))
        ]
        for t in threads:
            t.start()
        try:
            received: dict[int, Batch] = {}
            next_emit = 0
            for _ in range(n_batches):
                while next_emit not in received:
                    b, batch = out_q.get()
                    if isinstance(batch, Exception):
                        raise batch
                    received[b] = batch
                yield received.pop(next_emit)
                next_emit += 1
        finally:
            stop.set()
