"""Fused Shaw-relative-position attention (Pallas TPU).

The conformer's axial attention runs at short sequence length (time ~161-321
frames, freq ~101 bins) but huge folded batch (B*F or B*T up to thousands),
so the [BH, n, n] logits (plus the [BH, n, 2n-1] relative-position
projection) dominate HBM traffic in the XLA path — measured ~70% of
generator runtime.  This kernel keeps the entire attention for a tile of
(batch*head) rows resident in VMEM: QK^T, the relative-position bias, the
float32 softmax, and the value contraction all happen without touching HBM.

The relative-position bias is computed gather-free: one MXU matmul
projects the queries onto the reversed-offset band of the embedding
table, and the [i, r] -> [i, j] remap becomes a variable per-row roll
realized as log2(n) conditional constant rolls (the bitwise decomposition
of the shift).

Status: numerically exact vs the XLA path (fp32 internals) but NOT
faster on this v5e host — the 16 MB scoped-VMEM limit forces row_tile=2
(thousands of grid programs) and Mosaic requires fp32 matmul
accumulators, so the default model path stays on XLA
(ShawAttention(fused=False)); kept as an opt-in kernel and a starting
point for hosts with larger VMEM budgets.  Validated against the
reference einsum attention in tests/test_pallas_attention.py
(interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, band_ref, out_ref, *, rows, n, npad,
                 d, w, scale):
    """q/k/v_ref: [rows, npad, d]; band_ref: [d, w] where column
    r = j - i + n - 1 holds E[clip(i - j)] (reversed-offset band) and
    w = roundup(2n - 1 + pad, 128); out: [rows, npad, d].

    Relative-position bias without gathers: one MXU matmul projects all
    queries onto the band (QE[g, r] = q_g . band[:, r]), then each row g
    is rolled RIGHT by its query index i = g mod npad — realized as
    log2(npad) conditional constant rolls (the bitwise decomposition of
    the per-row shift) — after which bias[i, j] sits at column j + n - 1.
    """
    neg = jnp.float32(-1e30)
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
    pad_mask = col < n  # mask padded key columns

    # 1. project every query row onto the band: [rows*npad, d] @ [d, w]
    # (bf16 accumulation hits a Mosaic limitation — tpu.matmul requires an
    # fp32 accumulator — so the roll chain runs fp32; row_tile sized for it)
    q_all = q_ref[...].reshape(rows * npad, d)
    qe = jax.lax.dot_general(
        q_all, band_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rows*npad, w]

    # 2. variable per-row right-roll by i = g mod npad, bit by bit
    g = jax.lax.broadcasted_iota(jnp.int32, (rows * npad, 1), 0)
    i_idx = jax.lax.rem(g, npad)
    shift_bits = max(1, (npad - 1).bit_length())
    for b in range(shift_bits):
        amount = 1 << b
        rolled = pltpu.roll(qe, amount, axis=1)
        take = jax.lax.bitwise_and(
            jax.lax.shift_right_logical(i_idx, b), 1
        ) == 1
        qe = jnp.where(take, rolled, qe)

    # 3. bias[i, j] = qe_rolled[i, j + n - 1]
    bias_all = qe[:, n - 1 : n - 1 + npad].reshape(rows, npad, npad)

    for rix in range(rows):
        q = q_ref[rix, :, :]  # [npad, d]
        k = k_ref[rix, :, :]
        v = v_ref[rix, :, :]
        dots = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [npad, npad]
        dots = dots + bias_all[rix] * scale
        dots = jnp.where(pad_mask, dots, neg)
        m = jnp.max(dots, axis=1, keepdims=True)
        e = jnp.exp(dots - m)
        s = jnp.sum(e, axis=1, keepdims=True)
        attn = e / s
        out_ref[rix, :, :] = jax.lax.dot_general(
            attn, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def fused_shaw_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_table: jnp.ndarray,
    max_pos_emb: int = 512,
    scale: float | None = None,
    row_tile: int = 2,  # VMEM budget: qe + roll temp + blocks under 16 MB
) -> jnp.ndarray:
    """softmax(q k^T * scale + shaw_bias * scale) v, fused.

    ``q, k, v``: [BH, n, d]; ``rel_table``: [2*max_pos_emb + 1, d].
    Returns [BH, n, d] float32.
    """
    bh, n, d = q.shape
    if scale is None:
        scale = d**-0.5
    npad = _round_up(n, 128)
    # band column r = j - i + n - 1 holds E[i - j]  (reversed offsets);
    # width covers the post-roll read window [n-1, n-1+npad)
    w = _round_up(n - 1 + npad, 128)
    offsets = np.clip(np.arange(n - 1, -n, -1), -max_pos_emb, max_pos_emb)
    band = rel_table[jnp.asarray(offsets + max_pos_emb)]  # [2n-1, d]
    band = jnp.pad(band.astype(jnp.float32), ((0, w - (2 * n - 1)), (0, 0)))
    band = band.T  # [d, w]

    bh_pad = _round_up(bh, row_tile)
    def pad_rows(x):
        x = jnp.pad(x.astype(jnp.float32),
                    ((0, bh_pad - bh), (0, npad - n), (0, 0)))
        return x

    qp, kp, vp = pad_rows(q), pad_rows(k), pad_rows(v)

    kernel = functools.partial(
        _attn_kernel, rows=row_tile, n=n, npad=npad, d=d, w=w, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        grid=(bh_pad // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, npad, d), index_map=lambda i: (i, 0, 0)),
            pl.BlockSpec((row_tile, npad, d), index_map=lambda i: (i, 0, 0)),
            pl.BlockSpec((row_tile, npad, d), index_map=lambda i: (i, 0, 0)),
            pl.BlockSpec((d, w), index_map=lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile, npad, d),
                               index_map=lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh_pad, npad, d), jnp.float32),
        interpret=_interpret(),
    )(qp, kp, vp, band)
    return out[:bh, :n, :]
