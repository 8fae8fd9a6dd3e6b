"""ctypes binding to the native C++ PESQ engine (native/pesq/pesq.cc).

API mirrors the reference's usage surface:
  * ``pesq(fs, ref, deg, 'wb')`` — drop-in for the `pesq` package call in
    utils/compute_metrics.py:61 and discriminator.py:19;
  * ``pesq_loss(clean, noisy)`` — returns -1 on silent/failed input
    (discriminator.py:17-23), the collator's silence-retry trigger;
  * ``batch_pesq(clean_list, noisy_list)`` — normalized (pesq-1)/3.5 label
    batch (discriminator.py:26-32), computed by the C++ thread pool instead
    of joblib processes.

The shared library is built on demand with make (g++); set
SE_TPU_PESQ_LIB to override the path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native" / "pesq"
_LIB_LOCK = threading.Lock()
_LIB = None


def _load_library() -> ctypes.CDLL:
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        lib_path = os.environ.get("SE_TPU_PESQ_LIB")
        if lib_path is None:
            lib_path = str(_NATIVE_DIR / "libpesq.so")
            src = _NATIVE_DIR / "pesq.cc"
            missing = not os.path.exists(lib_path)
            stale = not missing and src.exists() and (
                os.path.getmtime(src) > os.path.getmtime(lib_path)
            )
            if missing or stale:
                try:
                    subprocess.run(
                        ["make", "-C", str(_NATIVE_DIR)],
                        check=True,
                        capture_output=True,
                    )
                except (OSError, subprocess.CalledProcessError) as exc:
                    # a checkout can land pesq.cc with a newer mtime than
                    # the committed .so; if no toolchain is available,
                    # keep using the existing library rather than failing
                    # every PESQ call — but say so: a genuine compile
                    # error must not silently serve scores from stale code
                    if missing:
                        raise
                    import warnings

                    stderr = getattr(exc, "stderr", b"") or b""
                    warnings.warn(
                        "rebuild of native/pesq/libpesq.so failed; using the "
                        "EXISTING (stale vs pesq.cc) library.  make stderr:\n"
                        + stderr.decode(errors="replace"),
                        RuntimeWarning,
                        stacklevel=2,
                    )
        lib = ctypes.CDLL(lib_path)
        lib.pesq_mos.restype = ctypes.c_double
        lib.pesq_mos.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ]
        lib.pesq_batch.restype = None
        lib.pesq_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        _LIB = lib
        return lib


def _as_float32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x), dtype=np.float32)


def pesq(fs: int, ref, deg, mode: str = "wb") -> float:
    """MOS-LQO of (ref, deg); raises on silent/invalid input like the
    `pesq` package does (the reference catches this in pesq_loss)."""
    if mode != "wb":
        raise ValueError("only wideband ('wb') mode is implemented")
    ref = _as_float32(ref)
    deg = _as_float32(deg)
    lib = _load_library()
    score = lib.pesq_mos(
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ref.size,
        deg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), deg.size, int(fs),
    )
    if score < 0:
        raise RuntimeError(f"pesq failed with error code {int(-score)}")
    return float(score)


def pesq_loss(clean, noisy, sr: int = 16000) -> float:
    """PESQ or -1 on failure (silence) — discriminator.py:17-23."""
    try:
        return pesq(sr, clean, noisy, "wb")
    except Exception:
        return -1.0


# Shared across the loader's collate threads and main_gan's async label
# pool; numpy Generators are not thread-safe, so draws take the lock.
_LABEL_RNG = np.random.default_rng(0)
_LABEL_RNG_LOCK = threading.Lock()


def _label_perturbation() -> tuple[float, float]:
    """Deliberate label-perturbation knobs for the PESQ-engine bias
    sensitivity study (docs/label_bias_study.md): every score that flows
    into discriminator labels passes through ``batch_pesq_raw``, while
    the evaluation path (`metrics.composite.compute_metrics`) calls
    ``pesq`` directly — so setting these perturbs TRAINING labels only,
    measuring how much an engine-vs-ITU deviation would move final
    trained quality.  Off (0, 0) unless the env vars are set."""
    bias = float(os.environ.get("SE_TPU_PESQ_LABEL_BIAS", "0") or 0.0)
    noise = float(os.environ.get("SE_TPU_PESQ_LABEL_NOISE", "0") or 0.0)
    return bias, noise


def batch_pesq_raw(clean: np.ndarray, noisy: np.ndarray, fs: int = 16000,
                   n_threads: int = 0,
                   exclude_noise: bool = False) -> np.ndarray:
    """Raw MOS per pair over equal-length [B, L] batches (C++ thread pool).
    Failed rows come back as -1.

    ``exclude_noise`` is for scores that get CACHED as process-wide
    constants (the collator's PESQ(x, x) self-anchor): the study's bias
    knob still applies (a biased engine reads high on every pair, the
    self-pair included), but the zero-mean noise knob must not — one
    random draw frozen into the anchor would perturb every q_clean label
    of a run by the same constant, which is a bias arm, not a noise arm.
    """
    clean = _as_float32(clean)
    noisy = _as_float32(noisy)
    assert clean.shape == noisy.shape and clean.ndim == 2
    b, length = clean.shape
    out = np.empty(b, np.float64)
    lib = _load_library()
    lib.pesq_batch(
        clean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        noisy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, length, int(fs), int(n_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    scores = np.where(out < 0, -1.0, out)
    bias, noise = _label_perturbation()
    if exclude_noise:
        noise = 0.0
    if bias or noise:
        pert = scores + bias
        if noise:
            with _LABEL_RNG_LOCK:
                draw = _LABEL_RNG.standard_normal(scores.shape)
            pert = pert + noise * draw
        # Model "the engine reads high/low by `bias`": the shift must
        # survive at the ceiling too (the engine's self-anchor is ~4.644,
        # so a 4.64 cap would sign-INVERT a positive bias on clean
        # labels).  Clip only to the MOS scale [1, 5]; the -1 failure
        # sentinel must survive untouched (it drives the silence retry).
        scores = np.where(scores < 0, scores, np.clip(pert, 1.0, 5.0))
    return scores


def batch_pesq(clean, noisy, fs: int = 16000) -> np.ndarray:
    """Normalized labels (pesq - 1) / 3.5 (discriminator.py:26-32).

    Silent failures keep the reference behavior: the -1 score flows through
    the normalization."""
    clean = np.stack([_as_float32(c) for c in clean])
    noisy = np.stack([_as_float32(n) for n in noisy])
    scores = batch_pesq_raw(clean, noisy, fs)
    return ((scores - 1.0) / 3.5).astype(np.float32)
