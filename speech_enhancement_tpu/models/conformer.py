"""Conformer block (flax) — the TSCB workhorse.

Re-designed from the reference's vendored lucidrains conformer
(models/conformer.py): FF(0.5) -> MHSA with Shaw relative positions ->
conv module (pointwise x2 -> GLU -> depthwise k=31 -> BatchNorm -> swish
-> pointwise) -> FF(0.5) -> post-LayerNorm, residual around each.

TPU notes:
* sequences here are short (time ~161 frames / freq 101 bins, batch-folded
  by TSCB), so attention is a pair of small batched matmuls — ideal MXU
  shapes after folding;
* the Shaw relative-position logits project q onto the contiguous (2n-1)
  band of the embedding table with one MXU matmul, then band-remap with a
  constant (n, n) gather; an optional Pallas kernel fuses the whole
  attention in VMEM (ShawAttention(fused=True));
* BatchNorm runs on global batch statistics: under pjit-sharded data
  parallelism jnp reductions over the folded batch axis are global, which
  reproduces the reference's SyncBatchNorm (main_gan.py:154-155) for free.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.models.layers import (
    bias_init_001,
    kaiming_normal_init,
    swish,
)


class FeedForward(nn.Module):
    """LayerNorm -> Dense(4x) -> swish -> dropout -> Dense -> dropout
    (conformer.py:128-145, pre-norm + 0.5 scale applied by caller)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.dim * self.mult, kernel_init=kaiming_normal_init(),
                     bias_init=bias_init_001)(x)
        x = swish(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.dim, kernel_init=kaiming_normal_init(),
                     bias_init=bias_init_001)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class ShawAttention(nn.Module):
    """MHSA with Shaw relative positional embeddings
    (conformer.py:74-125), pre-norm applied by caller.

    ``fused=True`` routes through the Pallas VMEM-resident kernel
    (ops/pallas_attention.py): no HBM logits, same math/params.

    A band-projection + music-transformer-skew formulation of the
    relative-position logits (exact, gather-free, output directly in the
    logits layout) was implemented and measured in round 3: 489.4 vs
    328.8 ms/batch e2e on v5e — the skew's minor-dim reshapes cost far
    more than the [i, j, b, h] relayout copy they avoid.  Removed; see
    git history and CLAUDE.md negatives.
    """

    dim: int
    heads: int = 4
    dim_head: int = 16
    dropout: float = 0.0
    max_pos_emb: int = 512
    fused: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        inner = h * d
        scale = d**-0.5

        x = nn.LayerNorm()(x)  # pre-norm (conformer.py:200 PreNorm wrap)
        q = nn.Dense(inner, use_bias=False, kernel_init=kaiming_normal_init(),
                     name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, kernel_init=kaiming_normal_init(),
                      name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)

        if self.fused:
            from speech_enhancement_tpu.ops.pallas_attention import (
                fused_shaw_attention,
            )

            table = self.param(
                "rel_pos_emb",
                nn.initializers.normal(1.0),
                (2 * self.max_pos_emb + 1, d),
            )
            # natural [b, n, h, d] layout straight into the kernel: no
            # head transpose, no sequence pad — XLA-side relayouts around
            # the kernel cost more than the kernel saves (module docs)
            out = fused_shaw_attention(
                q.reshape(b, n, h, d),
                k.reshape(b, n, h, d),
                v.reshape(b, n, h, d),
                table,
                max_pos_emb=self.max_pos_emb,
                scale=scale,
            )
            out = out.reshape(b, n, inner).astype(x.dtype)
            out = nn.Dense(self.dim, kernel_init=kaiming_normal_init(),
                           bias_init=bias_init_001, name="to_out")(out)
            return nn.Dropout(self.dropout, deterministic=deterministic)(out)

        q = q.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, d).transpose(0, 2, 1, 3)

        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale

        # Shaw relative positions: logits[i, j] += q_i . E[clip(i-j)].
        # Gather the table ONCE into rel[i, j, d] (a tiny (n, n) static-index
        # gather of the 1025-row table) and contract with q directly —
        # pos_attn goes straight to [*, n, n] with no [*, n, 2n-1]
        # intermediate and no gather over batched logits.  (Measured slower
        # alternatives on v5e, see git history: banded matmul + logits
        # gather; music-transformer skew.)
        table = self.param(
            "rel_pos_emb",
            nn.initializers.normal(1.0),
            (2 * self.max_pos_emb + 1, d),
        )
        idx = np.clip(np.arange(n)[:, None] - np.arange(n)[None, :],
                      -self.max_pos_emb, self.max_pos_emb) + self.max_pos_emb
        rel = jnp.asarray(table)[jnp.asarray(idx)].astype(q.dtype)  # [n, n, d]
        pos_attn = jnp.einsum("bhid,ijd->bhij", q, rel) * scale
        dots = dots + pos_attn

        # softmax: max-subtraction bounds the exponent so bf16 logits are
        # safe; reductions happen in the logits dtype (bf16 keeps the
        # [*, n, n] traffic half-width — fp32 softmax here cost ~10% e2e)
        attn = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, kernel_init=kaiming_normal_init(),
                       bias_init=bias_init_001, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class ConvModule(nn.Module):
    """Conformer convolution module (conformer.py:148-175):
    LayerNorm -> pointwise (2*expansion) -> GLU -> depthwise k=31 ->
    BatchNorm -> swish -> pointwise -> dropout.  Operates on [B, N, C]."""

    dim: int
    expansion_factor: int = 2
    kernel_size: int = 31
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = self.dim * self.expansion_factor
        x = nn.LayerNorm()(x)
        x = nn.Conv(inner * 2, (1,), kernel_init=kaiming_normal_init(),
                    bias_init=bias_init_001)(x)
        a, g = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(g)
        pad = self.kernel_size // 2
        x = nn.Conv(
            inner,
            (self.kernel_size,),
            padding=[(pad, pad - (self.kernel_size + 1) % 2)],
            feature_group_count=inner,
            kernel_init=kaiming_normal_init(),
            bias_init=bias_init_001,
        )(x)
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5
        )(x)
        x = swish(x)
        x = nn.Conv(self.dim, (1,), kernel_init=kaiming_normal_init(),
                    bias_init=bias_init_001)(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class ConformerBlock(nn.Module):
    """Full block (conformer.py:180-212): residuals around each sub-module,
    half-scaled feedforwards, trailing LayerNorm."""

    dim: int
    dim_head: int = 16
    heads: int = 4
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    conv_dropout: float = 0.0
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = 0.5 * FeedForward(self.dim, self.ff_mult, self.ff_dropout, name="ff1")(
            x, deterministic
        ) + x
        x = ShawAttention(
            self.dim, self.heads, self.dim_head, self.attn_dropout,
            fused=self.fused_attention, name="attn",
        )(x, deterministic) + x
        x = ConvModule(
            self.dim, self.conv_expansion_factor, self.conv_kernel_size,
            self.conv_dropout, name="conv",
        )(x, deterministic) + x
        x = 0.5 * FeedForward(self.dim, self.ff_mult, self.ff_dropout, name="ff2")(
            x, deterministic
        ) + x
        return nn.LayerNorm()(x)
