"""Fused Shaw-relative-position attention (Pallas TPU).

The conformer's axial attention runs at short sequence length (time ~161-321
frames, freq ~101 bins) but huge folded batch (B*F or B*T up to thousands),
so the [BH, n, n] logits (plus the [BH, n, 2n-1] relative-position
projection) dominate HBM traffic in the XLA path — measured ~70% of
generator runtime.  This kernel keeps the entire attention for a tile of
(batch*head) rows resident in VMEM: QK^T, the relative-position bias, the
float32 softmax, and the value contraction all happen without touching HBM.

The relative-position bias uses a precomputed ``rel[n, n, d]`` tensor
(``rel[i, j] = E[clip(i - j)]``, built once outside with an XLA gather —
n*n*d floats is small) and is applied in-kernel as d multiply-accumulate
passes: bias[i, j] = sum_d q[i, d] * rel[i, j, d].

Validated against the reference einsum attention in
tests/test_pallas_attention.py (interpret mode on CPU).
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


def _attn_kernel(q_ref, k_ref, v_ref, rel_ref, out_ref, *, rows, n, npad, d,
                 scale):
    # q/k/v_ref: [rows, npad, d]; rel_ref: [d, npad, npad] (d leading so the
    # VMEM tiles stay lane-aligned); out: [rows, npad, d]
    neg = jnp.float32(-1e30)
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
    pad_mask = col < n  # mask padded key columns
    for rix in range(rows):
        q = q_ref[rix, :, :]  # [npad, d]
        k = k_ref[rix, :, :]
        v = v_ref[rix, :, :]
        dots = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [npad, npad]
        bias = jnp.zeros((npad, npad), jnp.float32)
        for dd in range(d):
            bias = bias + q[:, dd][:, None] * rel_ref[dd, :, :]
        dots = dots + bias * scale
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
    row_tile: int = 8,
) -> jnp.ndarray:
    """softmax(q k^T * scale + shaw_bias * scale) v, fused.

    ``q, k, v``: [BH, n, d]; ``rel_table``: [2*max_pos_emb + 1, d].
    Returns [BH, n, d] float32.
    """
    bh, n, d = q.shape
    if scale is None:
        scale = d**-0.5
    npad = _round_up(n, 128)

    # rel[d, i, j] = table[clip(i - j), d] — one small XLA gather outside
    idx = np.clip(np.arange(n)[:, None] - np.arange(n)[None, :],
                  -max_pos_emb, max_pos_emb) + max_pos_emb
    rel = rel_table[jnp.asarray(idx)]  # [n, n, d]
    rel = jnp.transpose(rel.astype(jnp.float32), (2, 0, 1))
    rel = jnp.pad(rel, ((0, 0), (0, npad - n), (0, npad - n)))

    bh_pad = _round_up(bh, row_tile)
    def pad_rows(x):
        x = jnp.pad(x.astype(jnp.float32),
                    ((0, bh_pad - bh), (0, npad - n), (0, 0)))
        return x

    qp, kp, vp = pad_rows(q), pad_rows(k), pad_rows(v)

    kernel = functools.partial(
        _attn_kernel, rows=row_tile, n=n, npad=npad, d=d, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        grid=(bh_pad // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, npad, d), index_map=lambda i: (i, 0, 0)),
            pl.BlockSpec((row_tile, npad, d), index_map=lambda i: (i, 0, 0)),
            pl.BlockSpec((row_tile, npad, d), index_map=lambda i: (i, 0, 0)),
            pl.BlockSpec((d, npad, npad), index_map=lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile, npad, d),
                               index_map=lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh_pad, npad, d), jnp.float32),
        interpret=_interpret(),
    )(qp, kp, vp, rel)
    return out[:bh, :n, :]
