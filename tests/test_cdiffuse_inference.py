"""Standalone CDiffuSE inference CLI (model cache + reverse sampling)."""

import numpy as np
import pytest

from speech_enhancement_tpu.data import save_wav


def test_conditioner_featurizations():
    """The converted-checkpoint conditioner builders (reference
    cdiffuse/preprocess.py semantics): shapes line up with hop framing,
    the mel stack lands in [0, 1], and the se spec is amplitude-invariant
    (make_spectrum peak-normalizes before the STFT)."""
    from speech_enhancement_tpu.cli.cdiffuse_inference import (
        _conditioner_for,
        _mel_conditioner,
        _se_conditioner,
    )

    rng = np.random.default_rng(0)
    y = (0.1 * rng.standard_normal(3000)).astype(np.float32)

    se = _se_conditioner(y, 400, 100)
    assert se.shape == (1, 1 + len(y) // 100, 201)
    assert np.isfinite(se).all() and (se >= 0).all()
    np.testing.assert_allclose(se, _se_conditioner(7.3 * y, 400, 100),
                               rtol=1e-5, atol=1e-6)

    mel = _mel_conditioner(y, 400, 100, 80)
    assert mel.shape == (1, 1 + len(y) // 100, 80)
    assert (mel >= 0).all() and (mel <= 1).all()

    # auto-mode dispatch: framework config -> native |STFT| (None);
    # spectral width -> se; narrow width -> mel
    class M:
        def __init__(self, n_specs, hop_length):
            self.n_specs, self.hop_length = n_specs, hop_length

    assert _conditioner_for(M(201, 100), y) is None
    assert _conditioner_for(M(201, 256), y).shape == (1, 1 + len(y) // 256,
                                                      201)
    assert _conditioner_for(M(80, 100), y).shape == (1, 1 + len(y) // 100, 80)
    assert _conditioner_for(M(201, 100), y, "se").shape[-1] == 201
    assert _conditioner_for(M(80, 100), y, "mel").shape[-1] == 80


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
