"""Diffusion TSCNet — the CMGAN backbone adapted to spectrogram-domain
conditional diffusion (reference: models/tsc_diffusion.py).

Two DenseEncoders (diffused input + noisy conditioner), one *shared*
MergeBlock applied before each of the four TSCBs (the reference reuses a
single MergeBlock instance — tsc_diffusion.py:49, :77-80), then the same
mask/complex decoders as CMGAN.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_enhancement_tpu.models.diffuse import DiffusionEmbedding
from speech_enhancement_tpu.models.generator import (
    ComplexDecoder,
    DenseEncoder,
    MaskDecoder,
    TSCB,
    conv2d,
)
from speech_enhancement_tpu.models.layers import bias_init_001, kaiming_normal_init


class MergeBlock(nn.Module):
    """Diffusion-step bias + conditioner gating (tsc_diffusion.py:15-40)."""

    channels: int
    num_steps: int

    @nn.compact
    def __call__(self, x, conditioner, diffusion_step):
        step = DiffusionEmbedding(self.num_steps, name="diffusion_embedding")(
            diffusion_step
        )
        step = nn.Dense(self.channels, kernel_init=kaiming_normal_init(),
                        bias_init=bias_init_001, name="diffusion_projection")(step)
        y = x + step[:, None, None, :]
        y = conv2d(self.channels * 2, (1, 1), name="merge_diffusion")(y)
        cond = conv2d(self.channels * 2, (1, 1), name="conditioner_projection")(
            conditioner
        )
        y = y + cond
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        residual = conv2d(self.channels, (1, 1), name="output_residual")(y)
        return (x + residual) / math.sqrt(2.0)


class DiffusionTSCNet(nn.Module):
    """``__call__(spec, noisy_spec, t)`` with complex ``[B, T, F]`` inputs
    returns ``(final_real, final_imag)`` (tsc_diffusion.py:43-91)."""

    num_channel: int = 64
    num_features: int = 201
    num_steps: int = 50

    @nn.compact
    def __call__(self, spec, noisy_spec, diffusion_step, deterministic: bool = True):
        from speech_enhancement_tpu.models.generator import split_spec

        re, im = split_spec(spec)
        ref = re.astype(jnp.float32)
        imf = im.astype(jnp.float32)
        mag32 = jnp.sqrt(ref * ref + imf * imf)
        phase = jnp.arctan2(imf, ref)
        mag = mag32.astype(re.dtype)
        x_in = jnp.stack([mag, re, im], axis=-1)
        nre, nim = split_spec(noisy_spec)
        nmag = jnp.sqrt(
            nre.astype(jnp.float32) ** 2 + nim.astype(jnp.float32) ** 2
        ).astype(nre.dtype)
        noisy_in = jnp.stack([nmag, nre, nim], axis=-1)

        out = DenseEncoder(self.num_channel, name="dense_encoder")(x_in)
        out_noisy = DenseEncoder(self.num_channel, name="dense_encoder_noisy")(
            noisy_in
        )

        merge = MergeBlock(self.num_channel, self.num_steps, name="merge_block")
        for i in range(4):
            out = merge(out, out_noisy, diffusion_step)
            out = TSCB(self.num_channel, name=f"tscb{i + 1}")(out, deterministic)

        mask = MaskDecoder(self.num_features, self.num_channel,
                           name="mask_decoder")(out)
        out_mag = mask.astype(jnp.float32) * mag32

        complex_out = ComplexDecoder(self.num_channel, name="complex_decoder")(out)
        final_real = (out_mag * jnp.cos(phase)
                      + complex_out[..., 0].astype(jnp.float32))
        final_imag = (out_mag * jnp.sin(phase)
                      + complex_out[..., 1].astype(jnp.float32))
        return final_real, final_imag
