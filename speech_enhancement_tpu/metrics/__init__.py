from speech_enhancement_tpu.metrics.composite import (
    compute_metrics,
    llr,
    snr,
    stoi,
    wss,
)

__all__ = ["compute_metrics", "llr", "snr", "stoi", "wss"]
