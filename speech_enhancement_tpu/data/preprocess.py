"""Offline spectrogram preprocessing (cdiffuse/preprocess.py re-design).

Two modes:
* SE mode (``make_spectrum``): peak-normalized log1p-magnitude STFT
  (Hamming window) saved as ``<wav>.spec.npy`` — the CDiffuSE
  conditioner features (preprocess.py:33-68);
* vocoder mode (``mel_transform``): normalized mel spectrogram,
  log-compressed and squashed to [0, 1] (preprocess.py:71-93).

Parallel over a process pool like the reference (:116-120), without
librosa/torchaudio: STFT via scipy, mel filterbank computed locally.
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from glob import glob

import numpy as np
from scipy import signal as sp_signal

from speech_enhancement_tpu.data.audio_io import load_wav


def make_spectrum(
    filename: str | None = None,
    y: np.ndarray | None = None,
    feature_type: str = "logmag",
    mode: str | None = None,
    frame_length: int = 400,
    shift: int = 160,
    _max=None,
    _min=None,
):
    """Log1p-magnitude STFT with peak normalization.  Returns
    (features [F, T], phase, length)."""
    if y is None:
        y, sr = load_wav(filename, 16000)
    # Peak-normalize, guarding the all-silent input (the reference's
    # unconditional y / max(|y|) at cdiffuse/preprocess.py:48 emits a NaN
    # spectrogram for a silent wav, which would poison training quietly).
    peak = np.max(np.abs(y)) if len(y) else 0.0
    if peak > 0:
        y = y / peak
    # The reference passes the scipy.signal.hamming CALLABLE to
    # librosa.stft (cdiffuse/preprocess.py:49); librosa invokes a callable
    # as window(win_length), i.e. the SYMMETRIC (sym=True) hamming — not
    # the periodic one get_window's fftbins=True default would give.
    # Pinned against torch.stft framing by
    # tests/test_torch_parity.py::test_se_conditioner_matches_torch_stft.
    window = sp_signal.get_window("hamming", frame_length, fftbins=False)
    # librosa.stft semantics: centered, reflect-padded
    pad = frame_length // 2
    yp = np.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (len(yp) - frame_length) // shift
    idx = np.arange(n_frames)[:, None] * shift + np.arange(frame_length)[None, :]
    frames = yp[idx] * window
    D = np.fft.rfft(frames, axis=1).T  # [F, T]
    phase = np.exp(1j * np.angle(D))
    mag = np.abs(D)
    if feature_type == "logmag":
        Sxx = np.log1p(mag)
    elif feature_type == "lps":
        Sxx = np.log10(mag**2)
    else:
        Sxx = mag
    if mode == "mean_std":
        mean = Sxx.mean(axis=1, keepdims=True)
        std = Sxx.std(axis=1, keepdims=True) + 1e-12
        Sxx = (Sxx - mean) / std
    elif mode == "minmax":
        Sxx = 2 * (Sxx - _min) / (_max - _min) - 1
    return Sxx, phase, len(y)


def _mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float):
    """HTK-style triangular mel filterbank [n_mels, n_fft//2+1]."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    fb = np.zeros((n_mels, len(fft_freqs)))
    for i in range(n_mels):
        lo, ctr, hi = freqs[i : i + 3]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-12)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-12)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    return fb


def mel_transform(
    y: np.ndarray,
    sr: int = 16000,
    n_fft: int = 400,
    hop: int = 100,
    n_mels: int = 80,
) -> np.ndarray:
    """Vocoder-mode mel features squashed to [0, 1] (preprocess.py:71-93)."""
    y = np.clip(y, -1.0, 1.0)
    win_length = hop * 4
    window = sp_signal.get_window("hann", win_length)
    pad = n_fft // 2
    yp = np.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (len(yp) - win_length) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win_length)[None, :]
    frames = yp[idx] * window
    spec = np.abs(np.fft.rfft(frames, n_fft, axis=1)).T  # power=1.0
    spec = spec / np.sqrt((window**2).sum())  # torchaudio normalized=True
    fb = _mel_filterbank(sr, n_fft, n_mels, 20.0, sr / 2.0)
    mel = fb @ spec
    mel = 20 * np.log10(np.clip(mel, 1e-5, None)) - 20
    return np.clip((mel + 100) / 100, 0.0, 1.0)


def spec_transform(filename: str, indir: str, outdir: str, se: bool = True):
    if se:
        Sxx, _, _ = make_spectrum(filename)
    else:
        y, _ = load_wav(filename, 16000)
        Sxx = mel_transform(y)
    out = f"{filename.replace(indir, outdir)}.spec.npy"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.save(out, Sxx.astype(np.float32))
    return out


def preprocess_dir(indir: str, outdir: str, se: bool = True,
                   max_workers: int = 10) -> list[str]:
    """Parallel directory sweep (preprocess.py:116-120)."""
    files = sorted(glob(f"{indir}/**/*.wav", recursive=True))
    os.makedirs(outdir, exist_ok=True)
    with ProcessPoolExecutor(max_workers=max_workers) as ex:
        return list(ex.map(spec_transform, files, [indir] * len(files),
                           [outdir] * len(files), [se] * len(files)))
