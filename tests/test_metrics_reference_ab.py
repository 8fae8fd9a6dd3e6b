"""LIVE A/B test of the composite-metric stack against the actual
reference implementation (/root/reference/utils/compute_metrics.py).

The reference module is pure numpy/scipy and importable directly; only
its `pesq` import needs stubbing (sys.modules, exactly like
tests/test_torch_parity.py does for torch models).  Both sides get the
same constant PESQ so all six composite outputs are comparable.  This
replaces trust in frozen goldens with a reproducible oracle
(VERDICT r3 weak #2).  Skipped when the reference repo is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = os.environ.get("SE_TPU_REFERENCE", "/root/reference")

if not os.path.isdir(REFERENCE):
    pytest.skip("reference repo not mounted", allow_module_level=True)

PESQ_CONST = 3.0


@pytest.fixture(scope="module")
def ref_metrics():
    mod = types.ModuleType("pesq")
    mod.pesq = lambda *a, **k: PESQ_CONST
    saved = sys.modules.get("pesq")
    sys.modules["pesq"] = mod
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        ref = importlib.import_module("utils.compute_metrics")
        yield ref
    finally:
        sys.path.pop(0)
        if saved is not None:
            sys.modules["pesq"] = saved
        else:
            sys.modules.pop("pesq", None)


def _pairs(n=20):
    """Randomized clean/degraded pairs across lengths and SNRs."""
    rng = np.random.default_rng(20260817)
    fs = 16000
    out = []
    for i in range(n):
        length = int(rng.choice([8000, 12160, 16000, 24000, 32768, 48000]))
        t = np.arange(length) / fs
        f0 = 120 + 40 * rng.random()
        clean = np.zeros(length)
        for harm in range(1, 6):
            clean += rng.random() * np.sin(
                2 * np.pi * f0 * harm * t + rng.random() * 6.28
            )
        clean *= 0.5 + 0.5 * np.sin(2 * np.pi * (2 + 2 * rng.random()) * t)
        clean = 0.1 * clean / np.max(np.abs(clean))
        # broadband floor: a PURE harmonic sum makes the order-16 LPC
        # autocorrelation near-singular, where batched-vs-sequential
        # rounding diverges at ~1e-3 — real speech always has one
        clean = clean + 0.002 * rng.standard_normal(length)
        snr_db = rng.uniform(-5, 30)
        noise = rng.standard_normal(length)
        noise *= np.sqrt(
            np.mean(clean**2) / (np.mean(noise**2) * 10 ** (snr_db / 10))
        )
        out.append((clean, clean + noise, fs))
    return out


def test_component_functions_match_reference(ref_metrics):
    from speech_enhancement_tpu.metrics import composite as ours

    for clean, deg, fs in _pairs(20):
        np.testing.assert_allclose(
            ours.wss(clean, deg, fs), ref_metrics.wss(clean, deg, fs),
            rtol=1e-10, atol=1e-12,
        )
        np.testing.assert_allclose(
            ours.llr(clean, deg, fs), ref_metrics.llr(clean, deg, fs),
            rtol=1e-8, atol=1e-10,
        )
        o_snr, o_seg = ours.snr(clean, deg, fs)
        r_snr, r_seg = ref_metrics.snr(clean, deg, fs)
        np.testing.assert_allclose(o_snr, r_snr, rtol=1e-10)
        np.testing.assert_allclose(o_seg, r_seg, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(
            ours.stoi(clean, deg, fs), ref_metrics.stoi(clean, deg, fs),
            rtol=1e-10,
        )


def test_composite_matches_reference(ref_metrics):
    """End-to-end compute_metrics with a pinned PESQ on both sides: the
    full 6-tuple (incl. the CSIG/CBAK/COVL regressions and the alpha-trim
    sort order) must agree."""
    from speech_enhancement_tpu.metrics.composite import compute_metrics

    for clean, deg, fs in _pairs(6):
        got = compute_metrics(
            clean, deg, fs, pesq_fn=lambda *a, **k: PESQ_CONST
        )
        want = ref_metrics.compute_metrics(clean, deg, fs, 0)
        np.testing.assert_allclose(got, np.asarray(want, np.float64),
                                   rtol=1e-9, atol=1e-11)
