"""Standalone cdiffuse components: learner, preprocess, CLI."""

import numpy as np
import pytest

from speech_enhancement_tpu.data import save_wav
from speech_enhancement_tpu.data.preprocess import (
    make_spectrum,
    mel_transform,
    preprocess_dir,
)


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cd")
    clean = root / "clean"
    noisy = root / "noisy"
    clean.mkdir()
    noisy.mkdir()
    rng = np.random.default_rng(0)
    t = np.arange(20000) / 16000
    for i in range(3):
        c = (0.4 * np.sin(2 * np.pi * (200 + 30 * i) * t)).astype(np.float32)
        c *= 0.5 + 0.5 * np.sin(2 * np.pi * 2 * t)
        save_wav(clean / f"p{i}.wav", c)
        save_wav(noisy / f"p{i}.wav",
                 c + 0.05 * rng.standard_normal(len(t)).astype(np.float32))
    return root


def test_make_spectrum_shape(wav_dir):
    Sxx, phase, length = make_spectrum(str(wav_dir / "clean" / "p0.wav"))
    assert Sxx.shape[0] == 201
    assert phase.shape == Sxx.shape
    assert length == 20000
    assert np.all(Sxx >= 0)  # log1p of magnitudes


def test_make_spectrum_silent_input_is_finite():
    """Peak normalization must not NaN a silent signal (the reference's
    cdiffuse/preprocess.py:48 divides by max(|y|) unconditionally)."""
    Sxx, phase, length = make_spectrum(y=np.zeros(4000, np.float32))
    assert np.all(np.isfinite(Sxx))
    assert length == 4000


def test_mel_transform_range():
    rng = np.random.default_rng(1)
    y = 0.3 * rng.standard_normal(16000).astype(np.float32)
    mel = mel_transform(y)
    assert mel.shape[0] == 80
    assert np.all((mel >= 0) & (mel <= 1))


def test_preprocess_dir(wav_dir, tmp_path):
    out = tmp_path / "specs"
    files = preprocess_dir(str(wav_dir / "clean"), str(out), se=True,
                           max_workers=2)
    assert len(files) == 3
    spec = np.load(files[0])
    assert spec.shape[0] == 201


@pytest.mark.slow
def test_cdiffuse_cli_short_run(wav_dir, tmp_path, monkeypatch):
    import speech_enhancement_tpu.cli.cdiffuse as cd

    # shrink the model for CPU speed
    small = dict(cd.PARAMS, residual_layers=2, residual_channels=32,
                 batch_size=2, crop_mel_frames=20)
    monkeypatch.setattr(cd, "PARAMS", small)
    model_dir = tmp_path / "model"
    cd.main([
        str(model_dir), str(wav_dir / "clean"), str(wav_dir / "noisy"),
        "--max-steps", "2", "--batch-size", "2", "-j", "1",
    ])
    assert (model_dir / "weights").exists()
    assert (model_dir / "summary.jsonl").exists()


def test_learner_advances_loader_epoch(tmp_path, monkeypatch):
    """The learner must set_epoch(pass) on every dataset pass: DataLoader
    draws ALL crop/shuffle randomness from (seed, epoch, shard, batch),
    so a never-advancing epoch feeds byte-identical batches — the same
    fixed crop of every utterance — for the whole run.  Resume derives
    the starting pass from the restored step."""
    import types

    from speech_enhancement_tpu.data.voicebank import Batch
    from speech_enhancement_tpu.train import learner as learner_mod

    calls = []

    class FakeLoader:
        def set_epoch(self, e):
            calls.append(e)

        def __len__(self):
            return 2

        def __iter__(self):
            a = np.zeros((1, 100), np.float32)
            for _ in range(2):
                yield Batch(audio=a, noisy=a, pesq_clean=None,
                            pesq_noisy=None)

    monkeypatch.setattr(
        learner_mod, "diffuse_step",
        lambda state, *a, **k: (state, np.float32(0.1), np.float32(0.0)),
    )
    mk = lambda: learner_mod.DiffuSELearner(  # noqa: E731
        str(tmp_path), model=None,
        state=types.SimpleNamespace(step=0), tx=None,
        dataset=FakeLoader(), noise_schedule=None, criterion=None,
        summary_every=10_000,
    )
    lr = mk()
    monkeypatch.setattr(lr, "save_to_checkpoint", lambda *a, **k: None)
    lr.train(max_steps=5)
    assert calls == [0, 1, 2], calls

    # resumed at step 4 with 2 batches/pass -> starts at pass 2, not 0
    calls.clear()
    lr2 = mk()
    monkeypatch.setattr(lr2, "save_to_checkpoint", lambda *a, **k: None)
    lr2.step = 4
    lr2.train(max_steps=5)
    assert calls[0] == 2, calls

def test_learner_midpass_resume_skips_consumed_batches(tmp_path, monkeypatch):
    """A checkpoint saved mid-pass (e.g. a max_steps stop) must resume at
    the next unseen batch: the loader is deterministic on
    (seed, epoch, shard, batch), so replaying the pass from batch 0 would
    re-train byte-identical crops and misalign step vs data position."""
    import types

    from speech_enhancement_tpu.data.voicebank import Batch
    from speech_enhancement_tpu.train import learner as learner_mod

    consumed = []

    class FakeLoader:
        def __init__(self):
            self.epoch = 0

        def set_epoch(self, e):
            self.epoch = e

        def __len__(self):
            return 2

        def __iter__(self):
            for i in range(2):
                a = np.full((1, 100), float(10 * self.epoch + i),
                            np.float32)
                yield Batch(audio=a, noisy=a, pesq_clean=None,
                            pesq_noisy=None)

    monkeypatch.setattr(
        learner_mod, "diffuse_step",
        lambda state, audio, *a, **k: (
            consumed.append(float(audio[0, 0])) or
            (state, np.float32(0.1), np.float32(0.0))
        ),
    )
    mk = lambda: learner_mod.DiffuSELearner(  # noqa: E731
        str(tmp_path), model=None,
        state=types.SimpleNamespace(step=0), tx=None,
        dataset=FakeLoader(), noise_schedule=None, criterion=None,
        summary_every=10_000,
    )
    lr = mk()
    monkeypatch.setattr(lr, "save_to_checkpoint", lambda *a, **k: None)
    lr.train(max_steps=3)  # stops mid-pass: batch (1, 0) was the last step
    assert consumed == [0.0, 1.0, 10.0], consumed

    # resume at step 3 = pass 1, batch 1: the next batch is (1, 1) — and
    # the skip must reset afterwards (pass 2 starts at batch 0)
    consumed.clear()
    lr2 = mk()
    monkeypatch.setattr(lr2, "save_to_checkpoint", lambda *a, **k: None)
    lr2.step = 3
    lr2.train(max_steps=6)
    assert consumed == [11.0, 20.0, 21.0], consumed


def test_learner_resume_continues_rng_stream(tmp_path, monkeypatch):
    """The per-step rng is fold_in(base, step): a resumed run draws the
    exact noise/timestep keys the continuous run would have drawn at the
    same steps (a split chain would restart the stream from PRNGKey(seed)
    while the data stream advances)."""
    import types

    from speech_enhancement_tpu.data.voicebank import Batch
    from speech_enhancement_tpu.train import learner as learner_mod

    class FakeLoader:
        def set_epoch(self, e):
            pass

        def __len__(self):
            return 2

        def __iter__(self):
            a = np.zeros((1, 100), np.float32)
            for _ in range(2):
                yield Batch(audio=a, noisy=a, pesq_clean=None,
                            pesq_noisy=None)

    keys = []
    monkeypatch.setattr(
        learner_mod, "diffuse_step",
        lambda state, audio, noisy, sched, rng, **k: (
            keys.append(np.asarray(rng).tolist()) or
            (state, np.float32(0.1), np.float32(0.0))
        ),
    )
    mk = lambda: learner_mod.DiffuSELearner(  # noqa: E731
        str(tmp_path), model=None,
        state=types.SimpleNamespace(step=0), tx=None,
        dataset=FakeLoader(), noise_schedule=None, criterion=None,
        summary_every=10_000,
    )
    lr = mk()
    monkeypatch.setattr(lr, "save_to_checkpoint", lambda *a, **k: None)
    lr.train(max_steps=6, rng_seed=5)
    continuous, _ = keys[:], keys.clear()

    lr2 = mk()
    monkeypatch.setattr(lr2, "save_to_checkpoint", lambda *a, **k: None)
    lr2.step = 3  # as if restored from a mid-pass checkpoint
    lr2.train(max_steps=6, rng_seed=5)
    assert keys == continuous[3:], (keys, continuous)
