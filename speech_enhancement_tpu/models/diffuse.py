"""DiffuSE — conditional waveform-domain diffusion model (flax, NLC).

Re-design of reference models/DiffuSE.py (diffwave lineage, with the
author's GroupNorm additions at DiffuSE.py:94-98/:102-105) and the
vendored upstream cdiffuse/model.py (no GroupNorm, 16x mel upsampler).

Layout: waveforms are ``[B, L, C]`` (length-major, channels-last) so every
Conv1d lowers to XLA's native NWC convolution; the 30-block residual stack
keeps all activations device-resident and is scan-friendly.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.models.layers import (
    bias_init_001,
    kaiming_normal_init,
    swish,
)


def _build_embedding_table(max_steps: int) -> np.ndarray:
    """Sin/cos table [T, 128]: steps * 10^(dims*4/63) (DiffuSE.py:64-69).

    The whole computation must stay in float32 like torch's (int64 tensor
    * python float promotes to the float32 default dtype there): the
    phase reaches steps * 10^4 ≈ 5e5 radians, where float32 rounding of
    the ARGUMENT shifts sin() by ~0.03 — building the table in float64
    and casting at the end produces a measurably different embedding
    (1.6e-3 rel) than the one reference checkpoints were trained with."""
    steps = np.arange(max_steps, dtype=np.float32)[:, None]
    dims = np.arange(64, dtype=np.float32)[None, :]
    # torch's float32 pow is correctly rounded from the f64 result while
    # numpy's f32 pow is ~1 ulp off — at 10^4 scale that ulp becomes a
    # 0.05 rad phase shift, so compute the factor in f64 and round
    expo = (dims * np.float32(4.0) / np.float32(63.0)).astype(np.float64)
    factor = (np.float64(10.0) ** expo).astype(np.float32)
    table = steps * factor
    return np.concatenate([np.sin(table), np.cos(table)], axis=1).astype(np.float32)


class DiffusionEmbedding(nn.Module):
    """128-dim sin/cos timestep embedding -> two SiLU Linears to 512.

    Supports fractional timesteps via linear interpolation of the table —
    required by the interpolated fast-sampling T values
    (DiffuSE.py:39-69, :57-62).
    """

    max_steps: int
    proj_dim: int = 512

    @nn.compact
    def __call__(self, t):
        table = jnp.asarray(_build_embedding_table(self.max_steps))
        t = jnp.asarray(t)
        if jnp.issubdtype(t.dtype, jnp.integer):
            x = table[t]
        else:
            low = jnp.floor(t).astype(jnp.int32)
            high = jnp.ceil(t).astype(jnp.int32)
            frac = (t - low.astype(t.dtype))[..., None]
            x = table[low] + (table[high] - table[low]) * frac
        x = nn.Dense(self.proj_dim, kernel_init=kaiming_normal_init(),
                     bias_init=bias_init_001, name="projection1")(x)
        x = swish(x)
        x = nn.Dense(self.proj_dim, kernel_init=kaiming_normal_init(),
                     bias_init=bias_init_001, name="projection2")(x)
        return swish(x)


class SpectrogramUpsampler(nn.Module):
    """Two ConvTranspose stages stretching spectrogram frames to sample
    rate: each upsamples time by L = sqrt(hop) (DiffuSE.py:72-87).

    Input ``[B, T_frames, F]`` -> output ``[B, T_frames * hop, F]``.
    Implemented with lax.conv_transpose on a [B, T, F, 1] tensor; torch's
    crop-padding p maps to lax padding (k-1-p, k-1-p).
    """

    hop_length: int = 100

    @nn.compact
    def __call__(self, x):
        L = int(math.isqrt(self.hop_length))
        if L * L != self.hop_length:
            raise ValueError("hop_length must be a square number")
        y = x[..., None]  # [B, T, F, 1]
        for name in ("conv1", "conv2"):
            k_t, k_f = 2 * L, 3
            kernel = self.param(
                name,
                nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
                (k_t, k_f, 1, 1),
            )
            bias = self.param(f"{name}_bias", nn.initializers.zeros, (1,))
            # torch ConvTranspose2d(kernel=[3, 2L], stride=[1, L], pad=[1, L//2])
            # on (freq, time); here (time, freq) with stride (L, 1).
            pad_t = (k_t - 1 - L // 2, k_t - 1 - L // 2)
            pad_f = (k_f - 1 - 1, k_f - 1 - 1)
            y = jax.lax.conv_transpose(
                y, kernel, strides=(L, 1), padding=(pad_t, pad_f),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            y = jax.nn.leaky_relu(y, 0.4)
        return y[..., 0]


class ResidualBlock(nn.Module):
    """Diffwave-style gated residual block with diffusion-step bias and
    spectrogram conditioner (DiffuSE.py:90-121).  ``use_groupnorm``
    distinguishes the author's variant from the vendored upstream one
    (cdiffuse/model.py:86-112)."""

    residual_channels: int
    dilation: int
    use_groupnorm: bool = True

    @nn.compact
    def __call__(self, x, conditioner, diffusion_step):
        # x: [B, L, C]; conditioner: [B, L, n_specs]; diffusion_step: [B, 512]
        c = self.residual_channels
        step = nn.Dense(c, kernel_init=kaiming_normal_init(),
                        bias_init=bias_init_001, name="diffusion_projection")(
            diffusion_step
        )
        y = x + step[:, None, :]
        y = nn.Conv(
            2 * c, (3,), kernel_dilation=(self.dilation,),
            padding=[(self.dilation, self.dilation)],
            kernel_init=kaiming_normal_init(), bias_init=bias_init_001,
            name="dilated_conv",
        )(y)
        if self.use_groupnorm:
            y = nn.GroupNorm(num_groups=(2 * c) // 16, epsilon=1e-5,
                             name="dilated_norm")(y)
        cond = nn.Conv(2 * c, (1,), kernel_init=kaiming_normal_init(),
                       bias_init=bias_init_001, name="conditioner_projection")(
            conditioner
        )
        y = y + cond
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        residual = nn.Conv(c, (1,), kernel_init=kaiming_normal_init(),
                           bias_init=bias_init_001, name="output_residual")(y)
        skip = nn.Conv(c, (1,), kernel_init=kaiming_normal_init(),
                       bias_init=bias_init_001, name="output_projection")(y)
        if self.use_groupnorm:
            skip = nn.GroupNorm(num_groups=c // 16, epsilon=1e-5,
                                name="output_norm")(skip)
        return (x + residual) / math.sqrt(2.0), skip


class DiffuSE(nn.Module):
    """Waveform diffusion model (DiffuSE.py:124-162): input Conv1d ->
    N gated residual blocks (dilation cycle 2^(i mod cycle)) conditioned on
    the upsampled spectrogram + timestep embedding -> skip-sum/sqrt(N) ->
    zero-init output conv predicting the combined noise.

    ``__call__(audio [B, L], spectrogram [B, T, F], t [B])`` -> ``[B, L]``.
    """

    dilation_cycle_length: int = 10
    hop_length: int = 100
    n_specs: int = 201
    num_steps: int = 50
    residual_channels: int = 64
    residual_layers: int = 30
    use_groupnorm: bool = True

    @nn.compact
    def __call__(self, audio, spectrogram, diffusion_step):
        x = audio[..., None]  # [B, L, 1]
        x = nn.Conv(self.residual_channels, (1,),
                    kernel_init=kaiming_normal_init(), bias_init=bias_init_001,
                    name="input_projection")(x)
        x = jax.nn.relu(x)

        step = DiffusionEmbedding(self.num_steps, name="diffusion_embedding")(
            diffusion_step
        )
        cond = SpectrogramUpsampler(self.hop_length,
                                    name="spectrogram_upsampler")(spectrogram)
        cond = cond[:, : x.shape[1], :]

        skip_sum = jnp.zeros_like(x)
        # remat each block: without it the train-step backward keeps every
        # block's gated [B, L, 2c] activations alive — 16.26 GB HBM at
        # batch 16 x 1 s (> the v5e's 15.75 GB, measured round 4); with
        # per-block remat only the inter-block carries are stored, same
        # policy as the generator's scanned TSCB stack.  The blocks can't
        # be nn.scan-stacked because the dilation (2^(i % cycle)) is a
        # static conv config that differs per block — and because the loop
        # is UNROLLED, prevent_cse must stay True (the default): with
        # prevent_cse=False XLA CSEs the backward's recompute against the
        # forward's stored activations and the peak stays at 16.26 GB
        # (measured round 4) as if there were no remat at all.
        block = nn.remat(ResidualBlock)
        for i in range(self.residual_layers):
            x, skip = block(
                self.residual_channels,
                2 ** (i % self.dilation_cycle_length),
                self.use_groupnorm,
                name=f"residual{i}",
            )(x, cond, step)
            skip_sum = skip_sum + skip

        x = skip_sum / math.sqrt(self.residual_layers)
        x = nn.Conv(self.residual_channels, (1,),
                    kernel_init=kaiming_normal_init(), bias_init=bias_init_001,
                    name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(1, (1,), kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="output_projection")(x)
        return x[..., 0]
