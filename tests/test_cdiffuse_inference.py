"""Standalone CDiffuSE inference CLI (model cache + reverse sampling)."""

import numpy as np
import pytest

from speech_enhancement_tpu.data import save_wav


@pytest.mark.slow
def test_cdiffuse_inference_cli(tmp_path, monkeypatch):
    import speech_enhancement_tpu.cli.cdiffuse as cd
    import speech_enhancement_tpu.cli.cdiffuse_inference as ci

    small = dict(residual_layers=2, residual_channels=32,
                 dilation_cycle_length=10, n_specs=201, n_fft=400,
                 hop_samples=100)
    monkeypatch.setattr(cd, "PARAMS", dict(cd.PARAMS, **small,
                                           batch_size=2, crop_mel_frames=20))
    monkeypatch.setattr(ci, "PARAMS", dict(ci.PARAMS, **small))

    # make a tiny trained checkpoint via the standalone trainer
    clean = tmp_path / "clean"
    noisy = tmp_path / "noisy"
    clean.mkdir()
    noisy.mkdir()
    rng = np.random.default_rng(0)
    t = np.arange(8000) / 16000
    for i in range(2):
        c = (0.4 * np.sin(2 * np.pi * (200 + 40 * i) * t)).astype(np.float32)
        save_wav(clean / f"p{i}.wav", c)
        save_wav(noisy / f"p{i}.wav",
                 c + 0.05 * rng.standard_normal(len(t)).astype(np.float32))
    model_dir = tmp_path / "model"
    cd.main([str(model_dir), str(clean), str(noisy), "--max-steps", "1",
             "--batch-size", "2", "-j", "1"])

    out = tmp_path / "enhanced"
    ci._model_cache.clear()
    ci.main(["--model-dir", str(model_dir), "--noisy", str(noisy / "p0.wav"),
             "-o", str(out), "--fast"])
    assert (out / "p0.wav").exists()
    # cache reuse: second call hits the cache (no reload)
    assert len(ci._model_cache) == 1
