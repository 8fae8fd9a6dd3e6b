"""TSCNet — the CMGAN/SCP-GAN conformer generator (flax, channels-last).

Re-design of reference models/generator.py.  Tensors flow as
``[B, T, F, C]`` (time, frequency, channels-last) rather than torch's
``[B, C, T, F]``: channels-last keeps every conv in XLA's native NHWC
lowering and makes the TSCB batch-folds (fold F into batch for the time
conformer, fold T for the freq conformer) pure reshapes.

Input/output interface: the model consumes a complex spectrogram
``[B, T, F]`` (power-compressed by the caller) and emits
``(final_real, final_imag)`` each ``[B, T, F]`` — the mask-decoded
magnitude recombined with noisy phase plus the complex-residual decoder
(generator.py:145-166).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from speech_enhancement_tpu.models.conformer import ConformerBlock
from speech_enhancement_tpu.models.layers import (
    InstanceNorm,
    PReLU,
    bias_init_001,
    kaiming_normal_init,
)


def conv2d(features, kernel_size, strides=(1, 1), padding="VALID", name=None,
           quantized=False, kernel_dilation=(1, 1)):
    cls = nn.Conv
    if quantized:
        from speech_enhancement_tpu.ops.int8 import QuantConv

        cls = QuantConv
    return cls(
        features,
        kernel_size,
        strides=strides,
        padding=padding,
        kernel_dilation=kernel_dilation,
        kernel_init=kaiming_normal_init(),
        bias_init=bias_init_001,
        name=name,
    )


class DilatedDenseNet(nn.Module):
    """4-layer densely-connected block, time-dilated (2^i) with causal time
    padding — pad (pad_len, 0) on T, (1, 1) on F, kernel (2, 3)
    (generator.py:6-32).

    ``quantized``: contract the fat dense convs (Cin up to depth*channels)
    on the int8 MXU (ops/int8.py) — serving-only fast path, identical
    parameter tree."""

    depth: int = 4
    channels: int = 64
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        skip = x
        out = x
        for i in range(self.depth):
            dil = 2**i
            pad_len = 2 + (dil - 1) - 1  # twidth + (dil-1)*(twidth-1) - 1
            y = jnp.pad(skip, ((0, 0), (pad_len, 0), (1, 1), (0, 0)))
            y = conv2d(
                self.channels,
                (2, 3),
                kernel_dilation=(dil, 1),
                name=f"conv{i + 1}",
                quantized=self.quantized,
            )(y)
            y = InstanceNorm(name=f"norm{i + 1}")(y)
            out = PReLU(self.channels, name=f"prelu{i + 1}")(y)
            skip = jnp.concatenate([out, skip], axis=-1)
        return out


class DenseEncoder(nn.Module):
    """1x1 conv -> DilatedDenseNet -> (1,3) conv stride (1,2) halving F
    (generator.py:35-54)."""

    channels: int = 64
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        # conv1 stays float: Cin=3 gives a K=3 contraction — nothing for
        # the int8 MXU to win
        x = conv2d(self.channels, (1, 1), name="conv1")(x)
        x = InstanceNorm(name="norm1")(x)
        x = PReLU(self.channels, name="prelu1")(x)
        x = DilatedDenseNet(4, self.channels, quantized=self.quantized,
                            name="dense")(x)
        x = conv2d(
            self.channels, (1, 3), strides=(1, 2),
            padding=((0, 0), (1, 1)), name="conv2",
            quantized=self.quantized,
        )(x)
        x = InstanceNorm(name="norm2")(x)
        x = PReLU(self.channels, name="prelu2")(x)
        return x


class TSCB(nn.Module):
    """Two-stage conformer: time conformer over [B*F, T, C], then freq
    conformer over [B*T, F, C]; residual around each (generator.py:57-74)."""

    channels: int = 64
    dropout: float = 0.2
    fused_attention: bool = False
    fused_relayout: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, t, f, c = x.shape
        if self.fused_relayout:
            # Pallas axis-swap probe (ops/pallas_relayout.py): replaces
            # the two XLA transposes whose relayout copies the trace
            # attributes ~13.3 ms/step to — measurement-gated flag
            from speech_enhancement_tpu.ops.pallas_relayout import (
                swap_seq_axes,
            )

            fold = lambda a: swap_seq_axes(a)  # noqa: E731
        else:
            fold = lambda a: a.transpose(0, 2, 1, 3)  # noqa: E731
        x_t = fold(x).reshape(b * f, t, c)
        x_t = (
            ConformerBlock(
                dim=c, dim_head=c // 4, heads=4,
                attn_dropout=self.dropout, ff_dropout=self.dropout,
                fused_attention=self.fused_attention,
                name="time_conformer",
            )(x_t, deterministic)
            + x_t
        )
        x_f = fold(x_t.reshape(b, f, t, c)).reshape(b * t, f, c)
        # freq axis stays on XLA even when fused_attention is set: at
        # n~101 the fused kernel loses to XLA's native chain (345.9 vs
        # 336.0 ms/batch measured end-to-end on v5e — tiny batched
        # matmuls are MXU-issue-bound; see ops/pallas_attention.py)
        x_f = (
            ConformerBlock(
                dim=c, dim_head=c // 4, heads=4,
                attn_dropout=self.dropout, ff_dropout=self.dropout,
                fused_attention=False,
                name="freq_conformer",
            )(x_f, deterministic)
            + x_f
        )
        return x_f.reshape(b, t, f, c)


class _TSCBScanCell(nn.Module):
    """nn.scan cell wrapping TSCB: (carry, _) -> (carry, None).
    ``deterministic`` is a module attribute so the rematerialized call
    signature stays purely dynamic-in-carry."""

    channels: int
    dropout: float = 0.2
    fused_attention: bool = False
    deterministic: bool = True
    fused_relayout: bool = False

    @nn.compact
    def __call__(self, carry, _):
        y = TSCB(self.channels, self.dropout, self.fused_attention,
                 fused_relayout=self.fused_relayout,
                 name="block")(carry, self.deterministic)
        return y, None


def tscb_stack(channels: int, depth: int = 4, dropout: float = 0.2,
               fused_attention: bool = False, deterministic: bool = True,
               fused_relayout: bool = False, name: str = "tscb_stack"):
    """Stack of ``depth`` TSCBs as a single scanned + rematerialized block:
    XLA compiles ONE conformer pair instead of ``depth`` (a ~4x compile-time
    cut), and the backward pass recomputes each block's activations instead
    of saving depth x attention logits (without remat the SCP train step
    needs ~26 GB of HBM at batch 8 — over the v5e's 16 GB).  Params carry
    a leading [depth] axis."""
    import jax

    # dots-saveable policy: the backward re-uses the forward's projection /
    # feed-forward matmul outputs (un-batched dots) instead of recomputing
    # them, while attention logits (batched dots) stay unsaved so peak HBM
    # keeps the remat bound.  Measured on v5e (batch 8, bf16+fused, async,
    # same-session controls): 375.4 vs 404-424 ms/step at 1 s crops,
    # 720.3 vs 737-752 at 2 s — wins at every crop, no memory regression.
    cell = nn.remat(
        _TSCBScanCell, prevent_cse=False,
        policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    )
    return nn.scan(
        cell,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        length=depth,
    )(channels, dropout, fused_attention, deterministic, fused_relayout,
      name=name)


class SPConvTranspose2d(nn.Module):
    """Sub-pixel upsampler along F: conv to r*channels then interleave
    (generator.py:77-92)."""

    features: int
    kernel_size: tuple = (1, 3)
    r: int = 1
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        b, t, f, _ = x.shape
        y = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        y = conv2d(self.features * self.r, self.kernel_size, name="conv",
                   quantized=self.quantized)(y)
        f2 = y.shape[2]
        # channel blocks of size `features` are the r sub-pixel phases; merging
        # (F, r) F-major interleaves them along frequency (generator.py:88-91).
        y = y.reshape(b, t, f2, self.r, self.features)
        return y.reshape(b, t, f2 * self.r, self.features)


class MaskDecoder(nn.Module):
    """Dense block -> sub-pixel x2 F-upsample -> conv to 1ch -> norm/PReLU
    -> 1x1 conv -> per-frequency PReLU(init=-0.25) magnitude mask
    (generator.py:95-112).  Output [B, T, F]."""

    num_features: int = 201
    channels: int = 64
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        x = DilatedDenseNet(4, self.channels, quantized=self.quantized,
                            name="dense")(x)
        x = SPConvTranspose2d(self.channels, (1, 3), r=2,
                              quantized=self.quantized, name="sub_pixel")(x)
        # the 1/2-channel output convs stay float: tiny N, and the mask
        # output is precision-critical
        x = conv2d(1, (1, 2), name="conv1")(x)
        x = PReLU(1, name="prelu")(InstanceNorm(name="norm")(x))
        x = conv2d(1, (1, 1), name="final_conv")(x)
        x = x[..., 0]  # [B, T, F]
        return PReLU(self.num_features, init=-0.25, name="prelu_out")(x)


class ComplexDecoder(nn.Module):
    """Dense block -> sub-pixel -> norm/PReLU -> conv to 2ch (re, im)
    (generator.py:115-129).  Output [B, T, F, 2]."""

    channels: int = 64
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        x = DilatedDenseNet(4, self.channels, quantized=self.quantized,
                            name="dense")(x)
        x = SPConvTranspose2d(self.channels, (1, 3), r=2,
                              quantized=self.quantized, name="sub_pixel")(x)
        x = PReLU(self.channels, name="prelu")(InstanceNorm(name="norm")(x))
        x = conv2d(2, (1, 2), name="conv")(x)
        return x


def split_spec(spec):
    """Accept a complex spectrogram or an (re, im) pair — the pair form
    keeps the compute path real-valued so it can run in bfloat16 (there is
    no complex bf16 dtype)."""
    if isinstance(spec, (tuple, list)):
        re, im = spec
    else:
        re, im = jnp.real(spec), jnp.imag(spec)
    return re, im


class TSCNet(nn.Module):
    """CMGAN generator (generator.py:132-166).

    ``__call__(spec)`` with complex ``spec [B, T, F]`` (or an (re, im)
    pair) returns ``(final_real, final_imag)`` each ``[B, T, F]``.
    """

    num_channel: int = 64
    num_features: int = 201
    fused_attention: bool = False
    quantized_convs: bool = False
    fused_relayout: bool = False

    @nn.compact
    def __call__(self, spec, deterministic: bool = True):
        re, im = split_spec(spec)
        # magnitude/phase in float32 even under a bf16 compute dtype — the
        # phase recombination at the output is precision-critical
        ref = re.astype(jnp.float32)
        imf = im.astype(jnp.float32)
        mag32 = jnp.sqrt(ref * ref + imf * imf)
        phase = jnp.arctan2(imf, ref)
        mag = mag32.astype(re.dtype)
        x_in = jnp.stack([mag, re, im], axis=-1)

        out = DenseEncoder(self.num_channel, quantized=self.quantized_convs,
                           name="dense_encoder")(x_in)
        out, _ = tscb_stack(self.num_channel, depth=4,
                            fused_attention=self.fused_attention,
                            deterministic=deterministic,
                            fused_relayout=self.fused_relayout)(out, None)

        mask = MaskDecoder(self.num_features, self.num_channel,
                           quantized=self.quantized_convs,
                           name="mask_decoder")(out)
        out_mag = mask.astype(jnp.float32) * mag32

        complex_out = ComplexDecoder(self.num_channel,
                                     quantized=self.quantized_convs,
                                     name="complex_decoder")(out)
        final_real = out_mag * jnp.cos(phase) + complex_out[..., 0].astype(jnp.float32)
        final_imag = out_mag * jnp.sin(phase) + complex_out[..., 1].astype(jnp.float32)
        return final_real, final_imag
