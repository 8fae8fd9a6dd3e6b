"""int8 quantized convolution for the TSCNet encoder/decoders.

The serving cost ablation (CLAUDE.md) puts encoder/decoders+STFT at 91 ms
of the 325 ms bf16 step, with the fat DilatedDenseNet convs running near
50% MXU utilization — i.e. genuinely compute-bound, so the v5e's 2x int8
MXU throughput (394 bf16 -> 787 int8 TOPS) is a real lever there (unlike
attention, which is issue-bound at K=16 and gains nothing from int8).

Scheme: dynamic symmetric per-tensor activation scales + static symmetric
per-output-channel weight scales, s8 x s8 -> s32 accumulation.  The conv
is expressed as kh*kw shifted-slice dot_generals (an explicit im2col-free
lowering): each tap is a clean [B*T*F, Cin] @ [Cin, Cout] MXU contraction
with K = Cin (64-256 here — full-depth MXU passes), which sidesteps any
question of whether the backend lowers integer `conv_general_dilated`
natively.

Parity note: this quantizes the *serving* path only; parameter trees are
identical to the fp32 model (QuantConv reuses nn.Conv's param names), so
any trained checkpoint restores directly.  Reference has no quantized
path (it serves fp32 torch, inference_gan.py:75-100).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_symmetric(x: jnp.ndarray, axis=None, eps: float = 1e-12):
    """Symmetric linear quantization to int8.

    ``axis=None``: one scale for the whole tensor (dynamic activations);
    ``axis=(0, 1, 2)`` on a [kh, kw, Cin, Cout] kernel: per-output-channel
    scales.  Returns ``(q int8, scale f32)`` with ``x ~= q * scale``.
    """
    amax = jnp.max(jnp.abs(x).astype(jnp.float32), axis=axis,
                   keepdims=axis is not None)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    strides: tuple[int, int] = (1, 1),
    dilation: tuple[int, int] = (1, 1),
    out_dtype=None,
) -> jnp.ndarray:
    """VALID-padding NHWC conv on the int8 MXU.

    ``x``: [B, H, W, Cin] float; ``kernel``: [kh, kw, Cin, Cout] float.
    Quantizes both operands, accumulates in int32 over kh*kw shifted
    dot_generals, and rescales to ``out_dtype`` (default: x.dtype).
    """
    kh, kw, cin, cout = kernel.shape
    b, h, w, _ = x.shape
    sh, sw_ = strides
    dh, dw = dilation
    h_out = (h - (kh - 1) * dh - 1) // sh + 1
    w_out = (w - (kw - 1) * dw - 1) // sw_ + 1

    xq, sx = quantize_symmetric(x)
    wq, sw = quantize_symmetric(kernel, axis=(0, 1, 2))  # [1, 1, 1, Cout]

    acc = None
    for i in range(kh):
        for j in range(kw):
            sl = xq[:, i * dh : i * dh + (h_out - 1) * sh + 1 : sh,
                    j * dw : j * dw + (w_out - 1) * sw_ + 1 : sw_, :]
            part = jax.lax.dot_general(
                sl, wq[i, j],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = part if acc is None else acc + part
    out_dtype = out_dtype or x.dtype
    y = acc.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, cout))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QuantConv(nn.Module):
    """Drop-in for ``nn.Conv`` (same param names/shapes: ``kernel``
    [kh, kw, Cin, Cout], ``bias`` [Cout]) that contracts on the int8 MXU.
    Padding is the caller's job (the generator pads explicitly or uses
    static pad tuples, which are applied here before the VALID conv)."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: object = "VALID"
    kernel_dilation: tuple = (1, 1)
    kernel_init: object = nn.initializers.lecun_normal()
    bias_init: object = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features)
        )
        bias = self.param("bias", self.bias_init, (self.features,))
        if self.padding != "VALID":
            (pt, pb), (pl, pr) = self.padding
            x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        return int8_conv2d(
            x, kernel, bias,
            strides=tuple(self.strides),
            dilation=tuple(self.kernel_dilation),
        )
