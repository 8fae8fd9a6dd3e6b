from speech_enhancement_tpu.ops.pallas_stft import pallas_istft, pallas_stft
from speech_enhancement_tpu.ops.stft import (
    batch_stft,
    compressed_stft,
    disassemble_spectrogram,
    frame_signal,
    hamming_window,
    istft,
    normalize_batch,
    overlap_add,
    pack_spec_channels,
    power_compress,
    power_uncompress,
    stft,
    uncompressed_istft,
)

__all__ = [
    "batch_stft",
    "compressed_stft",
    "disassemble_spectrogram",
    "frame_signal",
    "hamming_window",
    "istft",
    "normalize_batch",
    "overlap_add",
    "pack_spec_channels",
    "pallas_istft",
    "pallas_stft",
    "power_compress",
    "power_uncompress",
    "stft",
    "uncompressed_istft",
]
