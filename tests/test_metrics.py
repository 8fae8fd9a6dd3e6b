"""Composite metric stack: golden values (frozen from a run validated to
~1e-13 against the reference utils/compute_metrics.py via an ad-hoc oracle)
plus metamorphic properties."""

import numpy as np
import pytest

from speech_enhancement_tpu.metrics.composite import (
    compute_metrics,
    llr,
    snr,
    stoi,
    wss,
)

ALPHA = 0.95


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(42)
    t = np.arange(32000) / 16000
    clean = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.15 * np.sin(2 * np.pi * 880 * t) * np.sin(2 * np.pi * 3 * t)
    ).astype(np.float64)
    clean += 0.01 * rng.standard_normal(32000)
    enh = clean + 0.05 * rng.standard_normal(32000)
    return clean, enh


def _trim_mean(v):
    v = np.sort(v)
    return float(np.mean(v[: round(len(v) * ALPHA)]))


def test_wss_golden(pair):
    clean, enh = pair
    np.testing.assert_allclose(
        _trim_mean(wss(clean, enh, 16000)), 25.065750980102084, rtol=1e-9
    )


def test_llr_golden(pair):
    clean, enh = pair
    np.testing.assert_allclose(
        _trim_mean(llr(clean, enh, 16000)), 0.9427061776065208, rtol=1e-9
    )


def test_snr_golden(pair):
    clean, enh = pair
    overall, seg = snr(clean, enh, 16000)
    np.testing.assert_allclose(overall, 13.062916071842006, rtol=1e-9)
    np.testing.assert_allclose(float(np.mean(seg)), 13.07938768739244, rtol=1e-9)


def test_stoi_golden(pair):
    clean, enh = pair
    np.testing.assert_allclose(stoi(clean, enh, 16000), 0.19028570091248967,
                               rtol=1e-9)


def test_stoi_identity(pair):
    clean, _ = pair
    np.testing.assert_allclose(stoi(clean, clean, 16000), 1.0, atol=1e-9)


def test_wss_identity(pair):
    clean, _ = pair
    assert _trim_mean(wss(clean, clean, 16000)) < 1e-20


def test_llr_identity(pair):
    clean, _ = pair
    assert abs(_trim_mean(llr(clean, clean, 16000))) < 1e-10


def test_metrics_monotone_with_noise(pair):
    """More noise -> worse WSS/SSNR/STOI (metamorphic sanity)."""
    clean, _ = pair
    rng = np.random.default_rng(7)
    noise = rng.standard_normal(len(clean))
    lo = clean + 0.02 * noise
    hi = clean + 0.2 * noise
    assert _trim_mean(wss(clean, lo, 16000)) < _trim_mean(wss(clean, hi, 16000))
    assert np.mean(snr(clean, lo, 16000)[1]) > np.mean(snr(clean, hi, 16000)[1])
    assert stoi(clean, lo, 16000) > stoi(clean, hi, 16000)


def test_compute_metrics_composite_with_stub_pesq(pair):
    clean, enh = pair
    out = compute_metrics(clean, enh, 16000, 0, pesq_fn=lambda fs, c, e, mode: 3.0)
    pesq_mos, csig, cbak, covl, ssnr, st = out
    assert pesq_mos == 3.0
    # regression formulas with the stubbed PESQ (compute_metrics.py:64-72)
    llr_m = 0.9427061776065208
    wss_m = 25.065750980102084
    np.testing.assert_allclose(
        csig, np.clip(3.093 - 1.029 * llr_m + 0.603 * 3.0 - 0.009 * wss_m, 1, 5),
        rtol=1e-6,
    )
    assert 1 <= cbak <= 5 and 1 <= covl <= 5
    np.testing.assert_allclose(ssnr, 13.07938768739244, rtol=1e-6)
    np.testing.assert_allclose(st, 0.19028570091248967, rtol=1e-6)


def test_compute_metrics_length_mismatch(pair):
    clean, enh = pair
    out = compute_metrics(clean, enh[:-37], 16000, 0,
                          pesq_fn=lambda fs, c, e, mode: 2.5)
    assert np.isfinite(out[1])
