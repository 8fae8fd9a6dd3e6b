"""Precomputed-spectrogram dataset pipeline (cdiffuse layout)."""

import numpy as np
import pytest

from speech_enhancement_tpu.data import NumpyDataset, SpecCollator, from_path, save_wav
from speech_enhancement_tpu.data.preprocess import preprocess_dir


@pytest.fixture(scope="module")
def spec_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("npds")
    clean = root / "clean"
    noisy = root / "noisy"
    specs = root / "specs"
    clean.mkdir()
    noisy.mkdir()
    rng = np.random.default_rng(0)
    t = np.arange(40000) / 16000
    for i in range(3):
        c = (0.4 * np.sin(2 * np.pi * (220 + 30 * i) * t)).astype(np.float32)
        save_wav(clean / f"p{i}.wav", c)
        save_wav(noisy / f"p{i}.wav",
                 c + 0.05 * rng.standard_normal(len(t)).astype(np.float32))
    preprocess_dir(str(noisy), str(specs), se=True, max_workers=2)
    return str(clean), str(noisy), str(specs)


def test_numpy_dataset_reads_triples(spec_dataset):
    clean, noisy, specs = spec_dataset
    ds = NumpyDataset(clean, noisy, [specs])
    assert len(ds) == 3
    rec = ds[0]
    assert rec["spectrogram"].shape[1] == 201
    assert len(rec["audio"]) == 40000


def test_spec_collator_aligned_crop(spec_dataset):
    clean, noisy, specs = spec_dataset
    ds = NumpyDataset(clean, noisy, [specs])
    col = SpecCollator(100, 60, np.random.default_rng(1))
    batch = col.collate([ds[0], ds[1]])
    assert batch.spectrogram.shape == (2, 60, 201)
    assert batch.audio.shape == (2, 6000)


def test_from_path_loader(spec_dataset):
    clean, noisy, specs = spec_dataset
    loader = from_path(clean, noisy, [specs], batch_size=2, crop_frames=60,
                       num_workers=1)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0].spectrogram.shape == (2, 60, 201)
