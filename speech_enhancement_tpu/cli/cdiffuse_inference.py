"""Standalone CDiffuSE inference (cdiffuse/inference.py re-design).

Reverse sampling starting FROM the noisy waveform with the final-step
noisy blend gamma=0.2 and per-step clamp (cdiffuse/inference.py:136-163),
with a model cache keyed by checkpoint path (:35-53).

Usage:
  python -m speech_enhancement_tpu.cli.cdiffuse_inference \
      --model-dir <dir> --noisy <wav-or-dir> -o out [--fast]
"""

from __future__ import annotations

import argparse
import os
from glob import glob
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_enhancement_tpu.data import load_wav, save_wav
from speech_enhancement_tpu.models import DiffuSE
from speech_enhancement_tpu.train import (
    ModuleState,
    inference_schedule,
    sample_waveform,
)
from speech_enhancement_tpu.utils import load_checkpoint

PARAMS = dict(
    n_specs=201,
    n_fft=400,
    hop_samples=100,
    residual_layers=30,
    residual_channels=64,
    dilation_cycle_length=10,
)

_model_cache: dict[str, tuple] = {}
# non-shape-visible hyperparameters restored from a converted
# checkpoint's params.json (dilation cycle + noise schedules the
# reference learner saved, cdiffuse/learner.py:60-72)
_saved_params_cache: dict[str, dict] = {}


def load_model(model_dir: str, params=None):
    """Checkpoint-keyed model cache (cdiffuse/inference.py:35-53)."""
    p = dict(PARAMS, **(params or {}))
    key = os.path.abspath(model_dir)
    if key in _model_cache:
        return _model_cache[key]
    if (Path(model_dir) / "variables").exists():
        # converted reference weights.pt (cli.convert_checkpoint writes
        # the model variables alone — no learner/optimizer state).  The
        # model config is inferred FROM the weights rather than PARAMS:
        # upstream checkpoints carry the vendored 16x upsampler
        # (cdiffuse/model.py:74-77, hop 256) while this framework's
        # trainer uses the hop-consistent 10x10 one — both serve, each
        # with its own self-consistent framing (model.hop_length)
        import json

        import orbax.checkpoint as ocp

        from speech_enhancement_tpu.cli.convert_checkpoint import (
            _infer_diffuse_model,
        )

        raw = ocp.StandardCheckpointer().restore(
            (Path(model_dir) / "variables").resolve()
        )
        saved = {}
        pj = Path(model_dir) / "params.json"
        if pj.exists():
            saved = json.loads(pj.read_text())
        _saved_params_cache[key] = saved
        out = (_infer_diffuse_model(raw, saved), raw)
        _model_cache[key] = out
        return out
    model = DiffuSE(
        dilation_cycle_length=p["dilation_cycle_length"],
        hop_length=p["hop_samples"],
        n_specs=p["n_specs"],
        num_steps=50,
        residual_channels=p["residual_channels"],
        residual_layers=p["residual_layers"],
        use_groupnorm=False,
    )
    crop_len = 160 * p["hop_samples"]
    audio = jnp.zeros((1, crop_len))
    cond = jnp.zeros((1, 160, p["n_specs"]))
    # jitted init (template only — weights come from the checkpoint)
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, audio,
                                    cond, jnp.array([0]))
    tx = optax.adam(2e-4)
    template = ModuleState(
        params=variables["params"],
        extra={k: v for k, v in variables.items() if k != "params"},
        opt_state=tx.init(variables["params"]),
    )
    path = Path(model_dir)
    if (path / "weights").exists():
        path = path / "weights"
    state = load_checkpoint(str(path), template)
    out = (model, {"params": state.params, **state.extra})
    _model_cache[key] = out
    return out


def _se_conditioner(noisy: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """The reference se-mode conditioner (cdiffuse/preprocess.py:33-57):
    exactly ``data.preprocess.make_spectrum`` — peak-normalized waveform,
    centered SYMMETRIC-hamming STFT with win_length == n_fft, log1p
    magnitude — transposed to the conditioner's [1, frames, bins]."""
    from speech_enhancement_tpu.data.preprocess import make_spectrum

    sxx, _, _ = make_spectrum(y=noisy.astype(np.float64),
                              frame_length=n_fft, shift=hop)
    return sxx.T[None].astype(np.float32)


def _mel_conditioner(noisy: np.ndarray, n_fft: int, hop: int,
                     n_mels: int, sr: int = 16000) -> np.ndarray:
    """The reference mel-mode conditioner (cdiffuse/preprocess.py:76-92):
    torchaudio-semantics MelSpectrogram (periodic hann, win_length
    min(4*hop, n_fft), window-normalized, power 1, HTK mel scale,
    f_min 20 / f_max sr/2, no filterbank norm) then
    clip((20*log10(clip(S, 1e-5)) - 20 + 100) / 100, 0, 1).
    Returns [1, frames, n_mels]."""
    win_length = min(4 * hop, n_fft)
    window = 0.5 - 0.5 * np.cos(
        2.0 * np.pi * np.arange(win_length) / win_length)  # periodic hann
    lpad = (n_fft - win_length) // 2
    window = np.pad(window, (lpad, n_fft - win_length - lpad))
    y = noisy.astype(np.float64)
    pad = n_fft // 2
    y = np.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = y[idx] * window
    mag = np.abs(np.fft.rfft(frames, n=n_fft, axis=-1))
    mag = mag / np.sqrt(np.sum(window**2))  # torchaudio normalized=True
    # HTK-scale triangular filterbank (torchaudio melscale_fbanks defaults)
    from speech_enhancement_tpu.data.preprocess import _mel_filterbank

    fbank = _mel_filterbank(sr, n_fft, n_mels, 20.0, sr / 2.0).T
    mel = mag @ fbank
    db = 20.0 * np.log10(np.clip(mel, 1e-5, None)) - 20.0
    return np.clip((db + 100.0) / 100.0, 0.0, 1.0)[None].astype(np.float32)


def _conditioner_for(model, noisy: np.ndarray, mode: str = "auto"):
    """Pick the conditioner featurization the checkpoint was trained on.

    ``auto``: a model matching this framework's learner config (201-bin
    |STFT| at hop 100) uses sample_waveform's native |STFT| (returns
    None); anything else came from a converted upstream checkpoint whose
    conditioner was precomputed by cdiffuse/preprocess.py — spectral
    widths (>=129 bins, se mode's 201/513 linear spectrograms) get the
    log1p make_spectrum featurization at n_fft=(bins-1)*2, narrower ones
    (reference default n_mels=80) the mel stack.  Force with
    ``--conditioner stft|se|mel``."""
    if mode == "stft" or (mode == "auto"
                          and model.n_specs == PARAMS["n_fft"] // 2 + 1
                          and model.hop_length == PARAMS["hop_samples"]):
        return None
    if mode == "se" or (mode == "auto" and model.n_specs >= 129):
        return _se_conditioner(noisy, (model.n_specs - 1) * 2,
                               model.hop_length)
    return _mel_conditioner(noisy, PARAMS["n_fft"], model.hop_length,
                            model.n_specs)


def predict(noisy_signal: np.ndarray, model_dir: str, fast: bool = False,
            seed: int = 23, conditioner: str = "auto") -> np.ndarray:
    model, variables = load_model(model_dir)
    # a converted checkpoint's params.json overrides the reference-default
    # schedules (a non-default upstream training schedule MUST be used at
    # inference or the reverse process is mis-scaled)
    saved = _saved_params_cache.get(os.path.abspath(model_dir), {})
    schedule = inference_schedule(
        np.asarray(saved.get("noise_schedule",
                             np.linspace(1e-4, 0.035, 50)), np.float64),
        np.asarray(saved.get("inference_noise_schedule",
                             [0.0001, 0.001, 0.01, 0.05, 0.2, 0.35]),
                   np.float64),
        fast=fast,
    )
    x = jnp.asarray(noisy_signal[None, :], jnp.float32)
    # frame with the MODEL's hop so the upsampled conditioner lines up
    # with the audio (a converted upstream checkpoint has hop 256; the
    # learner-trained model equals PARAMS['hop_samples']), and build the
    # conditioner with the featurization the checkpoint's width implies
    cond = _conditioner_for(model, noisy_signal, conditioner)
    audio = sample_waveform(model, variables, x, schedule,
                            jax.random.PRNGKey(seed),
                            hop=model.hop_length, n_fft=PARAMS["n_fft"],
                            clamp_every_step=True, conditioner=cond)
    return np.asarray(audio)[0][: len(noisy_signal)]


def main(argv=None):
    parser = argparse.ArgumentParser(description="CDiffuSE inference")
    parser.add_argument("--model-dir", required=True)
    parser.add_argument("--noisy", required=True,
                        help="noisy wav file or directory")
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--conditioner", default="auto",
                        choices=["auto", "stft", "se", "mel"],
                        help="conditioner featurization (auto infers from "
                             "the checkpoint's conditioner width: framework "
                             "|STFT| / reference se log1p spec / mel)")
    args = parser.parse_args(argv)

    paths = (sorted(glob(f"{args.noisy}/*.wav"))
             if os.path.isdir(args.noisy) else [args.noisy])
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    for p in paths:
        noisy, sr = load_wav(p, 16000)
        est = predict(noisy, args.model_dir, fast=args.fast,
                      conditioner=args.conditioner)
        save_wav(out_dir / Path(p).name, est, sr)
        print(f"enhanced {p} -> {out_dir / Path(p).name}")


if __name__ == "__main__":
    main()
