from speech_enhancement_tpu.models.conformer import ConformerBlock
from speech_enhancement_tpu.models.discriminator import Discriminator
from speech_enhancement_tpu.models.generator import (
    ComplexDecoder,
    DenseEncoder,
    DilatedDenseNet,
    MaskDecoder,
    SPConvTranspose2d,
    TSCB,
    TSCNet,
)

__all__ = [
    "ComplexDecoder",
    "ConformerBlock",
    "DenseEncoder",
    "DilatedDenseNet",
    "Discriminator",
    "MaskDecoder",
    "SPConvTranspose2d",
    "TSCB",
    "TSCNet",
]
