from speech_enhancement_tpu.models.conformer import ConformerBlock
from speech_enhancement_tpu.models.diffuse import (
    DiffuSE,
    DiffusionEmbedding,
    ResidualBlock,
    SpectrogramUpsampler,
)
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
from speech_enhancement_tpu.models.tsc_diffusion import DiffusionTSCNet, MergeBlock

__all__ = [
    "DiffuSE",
    "DiffusionEmbedding",
    "DiffusionTSCNet",
    "MergeBlock",
    "ResidualBlock",
    "SpectrogramUpsampler",
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
