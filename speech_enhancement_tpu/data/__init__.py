from speech_enhancement_tpu.data.audio_io import load_wav, save_wav
from speech_enhancement_tpu.data.voicebank import (
    Batch,
    Collator,
    DataLoader,
    VoicebankDataset,
)

__all__ = [
    "Batch",
    "Collator",
    "DataLoader",
    "VoicebankDataset",
    "load_wav",
    "save_wav",
]
