"""Fused Shaw-relative-position attention (Pallas TPU).

The conformer's axial attention runs at short sequence length (time ~161-321
frames, freq ~101 bins) but huge folded batch (B*F or B*T up to tens of
thousands), so the [BH, n, n] logits plus the relative-position projection
dominate HBM traffic in the XLA path — the profiled bf16 serving step
spends ~60% of its time there, including a 2.66 GB pure relayout copy per
step that XLA is forced into because dot_general puts batch dims first
(the rel einsum emits [i, j, b, h] while the logits live in [b, h, i, j]).

This kernel keeps the entire attention for a tile of batch instances
(all heads) resident in VMEM: QK^T, the relative-position bias, the
float32 softmax, and the value contraction all happen without touching
HBM.  Design rules learned from profiling on v5e:

* operands stay in the model's natural [B, n, heads*d] layout (the Dense
  output — well-packed 64-wide lanes).  An earlier version took
  [B*heads, n, d]: the pads/head-transposes/slices XLA inserted to feed
  it cost more than the kernel saved (~180 ms/step of pure relayout,
  because a 16-wide minor dim wastes 7/8 of every vreg).  Heads are
  extracted in-kernel with static lane slices;
* the bias is ONE MXU dot_general batched over the query index i with all
  (head, instance) rows packed into the M dim via leading-dim transposes
  + a sublane concat: bias[i, h*rows + r, j] = q[r, i, h*d:] . rel[i, :, j];
* per-row roll chains (round-1 v2) are ~10x slower (Mosaic lane rotates
  are expensive), a VPU fma loop over d also loses, and Mosaic rejects
  4D blocks indexed on a middle dim ("unsupported shape cast") — hence
  the flat h*d layout.
* measured SLOWER (round 3, don't retry): i-packing the bias matmul —
  P=4 consecutive query indices block-diagonal in the contraction
  (M=P*h*rows=128, K=P*d, n/P batches, exact math) runs 400.9 vs
  328.8 ms/batch e2e; the lane-offset pads + per-head interleave cost
  far more than the "fewer MXU passes" save (the pass-count model also
  failed to predict batch tiles 8/16/32 measuring identical: 328.8 /
  327.8 / 329.8).  Kernel-internal cost split (timing-only variants,
  scripts/ablate_attention_kernel.py): zeroing the whole Shaw bias saves
  37.5 ms e2e, replacing softmax with a scale saves 12.9 ms — i.e. the
  bias is ~half the time-attention cost but no cheaper formulation has
  been found on this hardware.

Semantics match models/conformer.py::ShawAttention (conformer.py:74-125 in
the reference): softmax((q k^T + shaw_bias) * scale) v with
bias[i, j] = q_i . E[clip(i - j, ±max_pos_emb)].

Worth using where n is large enough that XLA's relayout dominates (the
time axis, n~321); for the freq axis (n~101) XLA's native chain is faster
than any fused variant measured — tiny batched matmuls are
MXU-issue-bound — so TSCB only routes the time conformer here
(fused_attention flag).

Validated against the einsum reference in tests/test_pallas_attention.py
(interpret mode on CPU; fp32 near-exact, bf16 to matmul tolerance).
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


def _rel_operand(rel_table, n, max_pos_emb, dtype):
    """Gather the clipped relative-position table once (tiny: n*n rows of
    the 2*max_pos_emb+1 table) and lay it out [i, d, j] for the batched
    bias dot.  Shared by the forward and backward pallas_call drivers so
    the [i, j] index map cannot diverge.  Returns (idx, rel)."""
    idx = np.clip(np.arange(n)[:, None] - np.arange(n)[None, :],
                  -max_pos_emb, max_pos_emb) + max_pos_emb
    rel = rel_table[jnp.asarray(idx)].astype(dtype)     # [i, j, d]
    return idx, jnp.transpose(rel, (0, 2, 1))           # [i, d, j]


def _clamp_tile(tile: int, b: int) -> int:
    """Cap an auto-sized power-of-two batch tile at the next power of two
    >= the actual batch: a VMEM budget can propose tiles far above b for
    small shapes (e.g. 512 at b=2, n=17), and the caller pads the batch up
    to the tile — every padded row is pure wasted kernel compute."""
    return min(tile, 1 << max(0, (b - 1).bit_length()))


def _all_head_biasT(q_ref, rel_ref, *, h, d):
    """The all-head Shaw bias for ALL (head, instance) rows in ONE
    matmul batched over i — shared by the forward kernel and both
    backward kernels (the backward recompute must be bit-identical to
    the forward).  Returns biasT [n_i, h*rows, n] fp32.

    Kept fp32: storing it bf16 (to halve VMEM and buy a 2x batch tile)
    was measured SLOWER on v5e — 339.8 ms (tile 8) / 347.5 ms (tile 16)
    vs 325.3 ms — the repack to bf16 lanes costs more than the bandwidth
    it saves and bigger tiles reduce grid-level overlap."""
    parts = [
        jnp.transpose(q_ref[:, :, hh * d:(hh + 1) * d], (1, 0, 2))
        for hh in range(h)
    ]  # each [n_i, rows, d]
    qT = jnp.concatenate(parts, axis=1)  # [n_i, h*rows, d]
    return jax.lax.dot_general(
        qT, rel_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [n_i, h*rows, n]


def _attn_kernel(q_ref, k_ref, v_ref, rel_ref, out_ref, *, rows, n, h, d,
                 scale):
    """q/out_ref: [rows, n_i, h*d]; k/v_ref: [rows, n, h*d]; rel_ref:
    [n_i, d, n] with rel[i, :, j] = E[clip(i - j)].

    The body is i/j-polymorphic: in the default single-block layout
    n_i == n (whole instances resident in VMEM); for very long sequences
    the caller grids over query blocks (n_i = _I_TILE) with full k/v per
    instance — the softmax row [n_i, n] is always complete, so no online
    softmax is needed and the math is identical."""
    biasT = _all_head_biasT(q_ref, rel_ref, h=h, d=d)

    outs = []
    for hh in range(h):
        sl = slice(hh * d, (hh + 1) * d)
        dots = jax.lax.dot_general(
            q_ref[:, :, sl], k_ref[:, :, sl],
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [rows, n(i), n(j)]
        bias = jnp.transpose(
            biasT[:, hh * rows:(hh + 1) * rows, :], (1, 0, 2)
        )
        dots = (dots + bias) * scale
        m = jnp.max(dots, axis=2, keepdims=True)
        e = jnp.exp(dots - m)
        s = jnp.sum(e, axis=2, keepdims=True)
        attn = (e / s).astype(v_ref.dtype)
        outs.append(jax.lax.dot_general(
            attn, v_ref[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
    out_ref[...] = jnp.concatenate(outs, axis=2).astype(out_ref.dtype)


def _auto_batch_tile(n: int, heads: int,
                     vmem_budget: int = 88 << 20) -> int:
    """Largest power-of-two batch tile whose fp32 working set fits the
    budget: per batch instance, the unrolled head loop keeps ~2 fp32
    logits-sized arrays live per head plus the all-head biasT.  The
    estimate is deliberately dtype-independent: logits/bias stay fp32
    in-kernel even for bf16 operands (bf16 biasT storage was measured
    slower on v5e, see _attn_kernel)."""
    npad = _round_up(n, 128)
    per_instance = 3 * heads * n * npad * 4
    r = max(1, vmem_budget // per_instance)
    return 1 << (int(r).bit_length() - 1)


def _min_vmem_bytes(n: int, h: int, d: int, itemsize: int) -> int:
    """Lower-bound VMEM working set of ONE whole-instance kernel
    invocation at batch_tile=1: the whole-rel operand [n, d, n], the
    all-head biasT [n, h, n] fp32, ~3 live fp32 logits arrays, and the
    q/k/v/out blocks.  Above the pallas_call's 100 MB scoped-vmem cap the
    Mosaic compile FAILS outright (measured: n=1281 needs 120.1 MB), so
    _kernel_call switches to the i-tiled grid beyond this."""
    return (
        n * d * n * itemsize          # rel
        + n * h * n * 4               # biasT (fp32)
        + 3 * n * n * 4               # dots/exp/attn live set per head
        + 8 * n * h * d * itemsize    # double-buffered operand blocks
    )


# switch to the i-tiled grid when the whole-instance tile-1 working set
# exceeds ~80% of the 100 MB scoped-vmem cap (n=1121 fits at ~75 MB —
# hardware-validated; n=1281 needs ~98 MB by this estimate, 120 in
# practice)
_VMEM_FALLBACK_BYTES = 80 << 20
_I_TILE = 128  # query-block length of the long-sequence grid


def _auto_batch_tile_itiled(n: int, h: int, d: int, itemsize: int,
                            i_tile: int, vmem_budget: int = 70 << 20) -> int:
    """Batch tile for the i-tiled grid: per batch row the kernel keeps
    biasT [i_tile, h*row, n] fp32, ~3 logits arrays [row, i_tile, n]
    fp32, and the full k/v slices."""
    per_row = (
        i_tile * h * n * 4
        + 3 * i_tile * n * 4
        + 2 * n * h * d * itemsize
        + 2 * i_tile * h * d * itemsize
    )
    r = max(1, vmem_budget // per_row)
    return 1 << (int(r).bit_length() - 1)


def _kernel_call(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_table: jnp.ndarray,
    max_pos_emb: int = 512,
    scale: float | None = None,
    batch_tile: int | None = None,
) -> jnp.ndarray:
    """The raw (non-differentiable) pallas_call — see
    :func:`fused_shaw_attention` for the public API."""
    b, n, h, d = q.shape
    dtype = q.dtype
    if scale is None:
        scale = d**-0.5
    _explicit_tile = batch_tile
    if batch_tile is None:
        batch_tile = _clamp_tile(_auto_batch_tile(n, h), b)
    _, rel = _rel_operand(rel_table, n, max_pos_emb, dtype)

    qf, kf, vf = (x.reshape(b, n, h * d) for x in (q, k, v))

    if _min_vmem_bytes(n, h, d, q.dtype.itemsize) > _VMEM_FALLBACK_BYTES:
        # long sequence: grid over query blocks with full k/v per
        # instance (whole-instance layout would need >100 MB scoped VMEM
        # for the rel operand + logits; measured hard compile failure at
        # n=1281).  Full softmax rows, identical math.
        i_tile = _I_TILE
        # honor an explicit caller batch_tile; auto-size otherwise (the
        # whole-instance _auto_batch_tile default computed above is for
        # the other layout and is always replaced here)
        if _explicit_tile is None:
            batch_tile = _clamp_tile(
                _auto_batch_tile_itiled(n, h, d, q.dtype.itemsize, i_tile),
                b)
        else:
            batch_tile = _explicit_tile
        ni_pad = _round_up(n, i_tile)
        qf = jnp.pad(qf, ((0, 0), (0, ni_pad - n), (0, 0)))
        rel = jnp.pad(rel, ((0, ni_pad - n), (0, 0), (0, 0)))
        b_pad = _round_up(b, batch_tile)
        if b_pad != b:
            pad = ((0, b_pad - b), (0, 0), (0, 0))
            qf, kf, vf = (jnp.pad(x, pad) for x in (qf, kf, vf))
        kernel = functools.partial(
            _attn_kernel, rows=batch_tile, n=n, h=h, d=d, scale=scale
        )
        out = pl.pallas_call(
            kernel,
            grid=(b_pad // batch_tile, ni_pad // i_tile),
            in_specs=[
                pl.BlockSpec((batch_tile, i_tile, h * d),
                             index_map=lambda bb, ii: (bb, ii, 0)),
                pl.BlockSpec((batch_tile, n, h * d),
                             index_map=lambda bb, ii: (bb, 0, 0)),
                pl.BlockSpec((batch_tile, n, h * d),
                             index_map=lambda bb, ii: (bb, 0, 0)),
                pl.BlockSpec((i_tile, d, n),
                             index_map=lambda bb, ii: (ii, 0, 0)),
            ],
            out_specs=pl.BlockSpec((batch_tile, i_tile, h * d),
                                   index_map=lambda bb, ii: (bb, ii, 0)),
            out_shape=jax.ShapeDtypeStruct((b_pad, ni_pad, h * d), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_interpret(),
        )(qf, kf, vf, rel)
        return out[:b, :n].reshape(b, n, h, d)

    b_pad = _round_up(b, batch_tile)
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0), (0, 0))
        qf, kf, vf = (jnp.pad(x, pad) for x in (qf, kf, vf))

    kernel = functools.partial(
        _attn_kernel, rows=batch_tile, n=n, h=h, d=d, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // batch_tile,),
        in_specs=[
            pl.BlockSpec((batch_tile, n, h * d),
                         index_map=lambda i: (i, 0, 0)),
            pl.BlockSpec((batch_tile, n, h * d),
                         index_map=lambda i: (i, 0, 0)),
            pl.BlockSpec((batch_tile, n, h * d),
                         index_map=lambda i: (i, 0, 0)),
            pl.BlockSpec((n, d, n), index_map=lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((batch_tile, n, h * d),
                               index_map=lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, n, h * d), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(qf, kf, vf, rel)
    return out[:b].reshape(b, n, h, d)


def _recompute_softmax_ds(q_ref, k_ref, v_ref, g_ref, biasT, *, rows,
                          h, d, scale, hh):
    """Shared backward recompute for one head: returns (q_h, k_h, g_h,
    attn, ds) with attn/ds fp32 [rows, n_i, n].  Flash-style: the
    forward's logits never touched HBM, so the backward re-derives
    softmax rows in VMEM from the resident q/k/rel blocks (full k rows —
    complete softmax, no online rescaling needed)."""
    sl = slice(hh * d, (hh + 1) * d)
    q_h = q_ref[:, :, sl]          # [rows, n_i, d]
    k_h = k_ref[:, :, sl]          # [rows, n, d]
    v_h = v_ref[:, :, sl]
    g_h = g_ref[:, :, sl]          # [rows, n_i, d]
    dots = jax.lax.dot_general(
        q_h, k_h, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [rows, n_i, n]
    bias = jnp.transpose(biasT[:, hh * rows:(hh + 1) * rows, :], (1, 0, 2))
    logits = (dots + bias) * scale
    m = jnp.max(logits, axis=2, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=2, keepdims=True)
    attn = e / s                   # fp32 [rows, n_i, n]
    dattn = jax.lax.dot_general(
        g_h, v_h, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [rows, n_i, n]
    ds = attn * (dattn - jnp.sum(attn * dattn, axis=2, keepdims=True))
    return q_h, k_h, g_h, attn, ds


def _attn_bwd_kernel(q_ref, k_ref, v_ref, rel_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, drel_ref=None, *, rows, n,
                     h, d, scale, grid_i):
    """Fused backward: recomputes the attention for the resident tile
    (logits never touched HBM in the forward — flash-style recompute) and
    emits the gradients with the forward's layout rules.

    q/g/dq_ref: [rows, n_i, h*d]; k/v/dk/dv_ref: [rows, n, h*d];
    rel_ref: [n_i, d, n]; drel_ref: [n_i, d, n] fp32 — the per-(i, j)
    rel-position gradient summed over batch rows and heads; the caller
    scatter-adds it into the [2*max_pos+1, d] table (tiny XLA segment
    sum).  Math per head (P = softmax row, G = dL/dout):
      dV = Pᵀ G;   dP = G Vᵀ;   dS = P ∘ (dP - rowsum(P ∘ dP)) · scale
      dQ = dS K + Σ_j dS[i, j] · rel[i, :, j];   dK = dSᵀ Q
      drel[i, :, j] = Σ_rows Q[r, i, :] · dS[r, i, j]

    ``grid_i=True``: grid is (batch OUTER, query-blocks INNER) with full
    k/v rows — dk/dv accumulate across the inner query-block axis (their
    VMEM buffers persist across consecutive revisits) and drel is NOT
    emitted (drel_ref is None): a TPU output block only survives
    CONSECUTIVE grid steps, and drel's revisits would ride the outer
    batch axis — the bb>0 accumulations would read rotated/stale buffers
    (measured on v5e: dtable max_rel 1.62 vs XLA at grid (2, 10) before
    this was split out).  The caller runs :func:`_attn_bwd_drel_kernel`
    with the transposed grid instead."""
    ii = pl.program_id(1) if grid_i else None

    biasT = _all_head_biasT(q_ref, rel_ref, h=h, d=d)
    dqs, dks, dvs = [], [], []
    drel_total = None
    dtype = q_ref.dtype
    for hh in range(h):
        q_h, k_h, g_h, attn, ds = _recompute_softmax_ds(
            q_ref, k_ref, v_ref, g_ref, biasT, rows=rows, h=h, d=d,
            scale=scale, hh=hh)
        dp = (ds * scale).astype(dtype)      # operand-dtype for the MXU
        attn_c = attn.astype(dtype)
        dvs.append(jax.lax.dot_general(
            attn_c, g_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))  # [rows, n, d]
        dks.append(jax.lax.dot_general(
            dp, q_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))  # [rows, n, d]
        dq_h = jax.lax.dot_general(
            dp, k_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [rows, n_i, d]
        dpT = jnp.transpose(dp, (1, 0, 2))   # [n_i, rows, n]
        dq2T = jax.lax.dot_general(
            dpT, rel_ref[...], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [n_i, rows, d]
        dqs.append(dq_h + jnp.transpose(dq2T, (1, 0, 2)))
        if not grid_i:
            q_hT = jnp.transpose(q_h, (1, 2, 0))  # [n_i, d, rows]
            drel_h = jax.lax.dot_general(
                q_hT, dpT, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [n_i, d, n]
            drel_total = (drel_h if drel_total is None
                          else drel_total + drel_h)

    dq_ref[...] = jnp.concatenate(dqs, axis=2).astype(dq_ref.dtype)
    dk = jnp.concatenate(dks, axis=2)  # fp32
    dv = jnp.concatenate(dvs, axis=2)
    if grid_i:
        # dk/dv blocks are revisited for every query block of a batch
        # tile (index map ignores the INNER ii — consecutive revisits):
        # init at ii==0, then accumulate in fp32 (dk/dv out_shape is
        # fp32 even for bf16 operands: rounding every partial sum to
        # bf16 compounds across i-blocks)
        @pl.when(ii == 0)
        def _():
            dk_ref[...] = dk.astype(dk_ref.dtype)
            dv_ref[...] = dv.astype(dv_ref.dtype)

        @pl.when(ii != 0)
        def _():
            dk_ref[...] += dk.astype(dk_ref.dtype)
            dv_ref[...] += dv.astype(dv_ref.dtype)
    else:
        dk_ref[...] = dk.astype(dk_ref.dtype)
        dv_ref[...] = dv.astype(dv_ref.dtype)
        # single-axis batch grid: drel's block index is constant, so its
        # revisits ARE consecutive — safe to accumulate here
        bb = pl.program_id(0)

        @pl.when(bb == 0)
        def _():
            drel_ref[...] = drel_total

        @pl.when(bb != 0)
        def _():
            drel_ref[...] += drel_total


def _attn_bwd_drel_kernel(q_ref, k_ref, v_ref, rel_ref, g_ref, drel_ref,
                          *, rows, n, h, d, scale):
    """drel-only backward for the long-sequence path, grid
    (query-blocks OUTER, batch INNER): drel's block index follows the
    outer ii, so its accumulation across batch tiles rides the INNER
    axis — consecutive revisits, the only pattern whose output buffer
    persists on TPU.  Recomputes softmax/ds per head (the dq/dk/dv
    kernel can't emit drel under its (bb, ii) grid order; see
    :func:`_attn_bwd_kernel`).  ~4h matmuls per step vs the main
    kernel's ~6h — the long-n backward pays ~1.6x compute for
    correctness; only crops past the whole-instance VMEM budget
    (n > ~690) take this path."""
    bb = pl.program_id(1)

    biasT = _all_head_biasT(q_ref, rel_ref, h=h, d=d)
    drel_total = None
    dtype = q_ref.dtype
    for hh in range(h):
        q_h, _, _, _, ds = _recompute_softmax_ds(
            q_ref, k_ref, v_ref, g_ref, biasT, rows=rows, h=h, d=d,
            scale=scale, hh=hh)
        dp = (ds * scale).astype(dtype)
        dpT = jnp.transpose(dp, (1, 0, 2))    # [n_i, rows, n]
        q_hT = jnp.transpose(q_h, (1, 2, 0))  # [n_i, d, rows]
        drel_h = jax.lax.dot_general(
            q_hT, dpT, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [n_i, d, n]
        drel_total = drel_h if drel_total is None else drel_total + drel_h

    @pl.when(bb == 0)
    def _():
        drel_ref[...] = drel_total

    @pl.when(bb != 0)
    def _():
        drel_ref[...] += drel_total


def _auto_batch_tile_bwd_itiled(n: int, h: int, d: int, itemsize: int,
                                i_tile: int,
                                vmem_budget: int = 60 << 20) -> int:
    """Batch tile for the i-tiled dq/dk/dv backward kernel.  Per batch
    row the kernel keeps the all-head biasT [i_tile, h*row, n] fp32,
    ~6 fp32 [row, i_tile, n] arrays (dots/logits/e/attn/dattn/ds), the
    operand-dtype dp/attn copies, the full-k operand blocks (k/v/g) and
    the fp32 dk/dv output blocks.  Fixed cost: the double-buffered rel
    block.  The forward's `_auto_batch_tile_itiled` model under-counts
    this set — using it OOMed the 100 MB scoped-vmem cap at n=1280 fp32
    (measured 104.4 MB at tile 4)."""
    per_row = (
        i_tile * h * n * 4            # biasT
        + 6 * i_tile * n * 4          # fp32 softmax/ds live set
        + 2 * i_tile * n * itemsize   # dp / attn operand-dtype copies
        + 2 * 3 * n * h * d * itemsize  # double-buffered k/v/g blocks
        + 2 * 2 * n * h * d * 4       # fp32 dk/dv output blocks
    )
    fixed = 2 * i_tile * d * n * 4    # double-buffered rel block
    r = max(1, (vmem_budget - fixed) // per_row)
    return 1 << (int(r).bit_length() - 1)


def _auto_batch_tile_drel(n: int, h: int, d: int, itemsize: int,
                          i_tile: int,
                          vmem_budget: int = 80 << 20) -> int:
    """Batch tile for the drel-only kernel: same softmax recompute set
    as the dq/dk/dv kernel minus its gradient blocks, plus the fixed
    fp32 [i_tile, d, n] drel accumulation chain (~2 live) and output
    block."""
    per_row = (
        i_tile * h * n * 4
        + 6 * i_tile * n * 4
        + 2 * i_tile * n * itemsize
        + 2 * 3 * n * h * d * itemsize
    )
    fixed = 2 * i_tile * d * n * 4 + 3 * i_tile * d * n * 4
    r = max(1, (vmem_budget - fixed) // per_row)
    return 1 << (int(r).bit_length() - 1)


def _auto_batch_tile_bwd(n: int, heads: int,
                         vmem_budget: int = 80 << 20) -> int:
    """Backward batch tile: ~6 live fp32 [n, n] arrays per head
    (logits/attn/dattn/ds + operand-dtype copies) plus the all-head
    biasT."""
    npad = _round_up(n, 128)
    per_instance = 6 * heads * n * npad * 4
    r = max(1, vmem_budget // per_instance)
    return 1 << (int(r).bit_length() - 1)


def _min_vmem_bytes_bwd(n: int, h: int, d: int, itemsize: int) -> int:
    """Tile-1 working-set lower bound of the whole-instance backward:
    forward's set plus dattn/ds live arrays, the drel output, and the
    extra operand blocks (g plus three gradients)."""
    return (
        2 * n * d * n * 4             # rel + drel (fp32 out)
        + n * h * n * 4               # biasT
        + 6 * n * n * 4               # logits/attn/dattn/ds live set
        + 16 * n * h * d * itemsize   # double-buffered q/k/v/g/dq/dk/dv/out
    )


def _bwd_kernel_call(q, k, v, rel_table, g, max_pos_emb, scale, batch_tile):
    """Backward pallas_call: returns (dq, dk, dv, drel_table) with the
    cotangent dtypes matching the primals."""
    b, n, h, d = q.shape
    dtype = q.dtype
    idx, rel = _rel_operand(rel_table, n, max_pos_emb, dtype)

    qf, kf, vf, gf = (x.reshape(b, n, h * d) for x in (q, k, v, g))
    grid_i = _min_vmem_bytes_bwd(n, h, d, dtype.itemsize) > _VMEM_FALLBACK_BYTES

    if grid_i:
        i_tile = _I_TILE
        if batch_tile is None:
            batch_tile = _clamp_tile(
                _auto_batch_tile_bwd_itiled(n, h, d, dtype.itemsize,
                                            i_tile),
                b)
        ni_pad = _round_up(n, i_tile)
        qf = jnp.pad(qf, ((0, 0), (0, ni_pad - n), (0, 0)))
        gf = jnp.pad(gf, ((0, 0), (0, ni_pad - n), (0, 0)))
        rel_p = jnp.pad(rel, ((0, ni_pad - n), (0, 0), (0, 0)))
        b_pad = _round_up(b, batch_tile)
        if b_pad != b:
            pad = ((0, b_pad - b), (0, 0), (0, 0))
            qf, kf, vf, gf = (jnp.pad(x, pad) for x in (qf, kf, vf, gf))
        kernel = functools.partial(
            _attn_bwd_kernel, rows=batch_tile, n=n, h=h, d=d, scale=scale,
            grid_i=True,
        )
        # pass 1, grid (batch OUTER, query-block INNER): dq written once
        # per (bb, ii); dk/dv accumulate over the inner ii in fp32
        dq, dk, dv = pl.pallas_call(
            kernel,
            grid=(b_pad // batch_tile, ni_pad // i_tile),
            in_specs=[
                pl.BlockSpec((batch_tile, i_tile, h * d),
                             index_map=lambda bb, ii: (bb, ii, 0)),
                pl.BlockSpec((batch_tile, n, h * d),
                             index_map=lambda bb, ii: (bb, 0, 0)),
                pl.BlockSpec((batch_tile, n, h * d),
                             index_map=lambda bb, ii: (bb, 0, 0)),
                pl.BlockSpec((i_tile, d, n),
                             index_map=lambda bb, ii: (ii, 0, 0)),
                pl.BlockSpec((batch_tile, i_tile, h * d),
                             index_map=lambda bb, ii: (bb, ii, 0)),
            ],
            out_specs=[
                pl.BlockSpec((batch_tile, i_tile, h * d),
                             index_map=lambda bb, ii: (bb, ii, 0)),
                pl.BlockSpec((batch_tile, n, h * d),
                             index_map=lambda bb, ii: (bb, 0, 0)),
                pl.BlockSpec((batch_tile, n, h * d),
                             index_map=lambda bb, ii: (bb, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b_pad, ni_pad, h * d), dtype),
                jax.ShapeDtypeStruct((b_pad, n, h * d), jnp.float32),
                jax.ShapeDtypeStruct((b_pad, n, h * d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_interpret(),
        )(qf, kf, vf, rel_p, gf)
        dk = dk.astype(dtype)
        dv = dv.astype(dtype)
        # pass 2, grid (query-block OUTER, batch INNER): drel accumulates
        # over the inner batch axis — the only revisit order whose output
        # buffer persists (see _attn_bwd_drel_kernel)
        drel_tile = _clamp_tile(
            _auto_batch_tile_drel(n, h, d, dtype.itemsize, i_tile), b_pad)
        # round up from the ALREADY padded b_pad: extra zero rows are
        # exact no-ops for drel (g=0 rows give ds=0)
        bd_pad = _round_up(b_pad, drel_tile)
        qd, kd, vd, gd = (
            (jnp.pad(x, ((0, bd_pad - x.shape[0]), (0, 0), (0, 0)))
             if x.shape[0] != bd_pad else x)
            for x in (qf, kf, vf, gf)
        )
        drel_kernel = functools.partial(
            _attn_bwd_drel_kernel, rows=drel_tile, n=n, h=h, d=d,
            scale=scale,
        )
        drel = pl.pallas_call(
            drel_kernel,
            grid=(ni_pad // i_tile, bd_pad // drel_tile),
            in_specs=[
                pl.BlockSpec((drel_tile, i_tile, h * d),
                             index_map=lambda ii, bb: (bb, ii, 0)),
                pl.BlockSpec((drel_tile, n, h * d),
                             index_map=lambda ii, bb: (bb, 0, 0)),
                pl.BlockSpec((drel_tile, n, h * d),
                             index_map=lambda ii, bb: (bb, 0, 0)),
                pl.BlockSpec((i_tile, d, n),
                             index_map=lambda ii, bb: (ii, 0, 0)),
                pl.BlockSpec((drel_tile, i_tile, h * d),
                             index_map=lambda ii, bb: (bb, ii, 0)),
            ],
            out_specs=pl.BlockSpec((i_tile, d, n),
                                   index_map=lambda ii, bb: (ii, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((ni_pad, d, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_interpret(),
        )(qd, kd, vd, rel_p, gd)
        drel = drel[:n]
    else:
        if batch_tile is None:
            batch_tile = _clamp_tile(_auto_batch_tile_bwd(n, h), b)
        b_pad = _round_up(b, batch_tile)
        if b_pad != b:
            pad = ((0, b_pad - b), (0, 0), (0, 0))
            qf, kf, vf, gf = (jnp.pad(x, pad) for x in (qf, kf, vf, gf))
        kernel = functools.partial(
            _attn_bwd_kernel, rows=batch_tile, n=n, h=h, d=d, scale=scale,
            grid_i=False,
        )
        spec = pl.BlockSpec((batch_tile, n, h * d),
                            index_map=lambda i: (i, 0, 0))
        rel_spec = pl.BlockSpec((n, d, n), index_map=lambda i: (0, 0, 0))
        dq, dk, dv, drel = pl.pallas_call(
            kernel,
            grid=(b_pad // batch_tile,),
            in_specs=[spec, spec, spec, rel_spec, spec],
            out_specs=[spec, spec, spec, rel_spec],
            out_shape=[
                jax.ShapeDtypeStruct((b_pad, n, h * d), dtype),
                jax.ShapeDtypeStruct((b_pad, n, h * d), dtype),
                jax.ShapeDtypeStruct((b_pad, n, h * d), dtype),
                jax.ShapeDtypeStruct((n, d, n), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_interpret(),
        )(qf, kf, vf, rel, gf)

    dq = dq[:b, :n].reshape(b, n, h, d)
    dk = dk[:b].reshape(b, n, h, d)
    dv = dv[:b].reshape(b, n, h, d)
    # scatter the [i, d, j] rel gradient into the shared table rows:
    # dtable[r] = sum over (i, j) with clip(i - j) + max_pos == r
    seg = jnp.asarray(idx.reshape(-1))
    flat = jnp.transpose(drel, (0, 2, 1)).reshape(n * n, d)  # [(i, j), d]
    dtable = jax.ops.segment_sum(
        flat, seg, num_segments=rel_table.shape[0]
    ).astype(rel_table.dtype)
    return dq, dk, dv, dtable


def _xla_attention(q, k, v, rel_table, max_pos_emb, scale):
    """XLA einsum reference with the kernel's exact semantics (fp32
    logits/softmax, operand-dtype value contraction).  Used as the
    backward path of the custom_vjp: differentiating THIS is equivalent to
    differentiating the kernel."""
    b, n, h, d = q.shape
    idx = np.clip(np.arange(n)[:, None] - np.arange(n)[None, :],
                  -max_pos_emb, max_pos_emb) + max_pos_emb
    rel = rel_table[jnp.asarray(idx)].astype(q.dtype)  # [i, j, d]
    dots = jnp.einsum("bihd,bjhd->bhij", q, k,
                      preferred_element_type=jnp.float32)
    bias = jnp.einsum("bihd,ijd->bhij", q, rel,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax((dots + bias) * scale, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bjhd->bihd", attn, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_diff(q, k, v, rel_table, max_pos_emb, scale, batch_tile):
    return _kernel_call(q, k, v, rel_table, max_pos_emb, scale, batch_tile)


def _fused_fwd(q, k, v, rel_table, max_pos_emb, scale, batch_tile):
    return (
        _kernel_call(q, k, v, rel_table, max_pos_emb, scale, batch_tile),
        (q, k, v, rel_table),
    )


def _fused_bwd(max_pos_emb, scale, batch_tile, residuals, g):
    q, k, v, rel_table = residuals
    # fused Pallas backward (flash-style): recompute the attention for
    # the resident tile in VMEM and emit dq/dk/dv + the rel-table grad —
    # the [b, h, n, n] logits never materialize in HBM in either
    # direction, so long-crop gradients are bounded-VMEM too (the
    # i-tiled grid kicks in exactly like the forward).  Replaced the
    # round-3 recompute-through-XLA vjp, which made bf16+fused training
    # SLOWER than unfused (472.5 vs 410.5 ms/step) and would have
    # materialized the XLA logits for long n.
    # the forward's batch_tile (if explicitly set) is sized for the
    # forward's ~3-arrays-per-head working set; the backward keeps ~6 —
    # always auto-size the backward tile
    return _bwd_kernel_call(q, k, v, rel_table, g, max_pos_emb, scale,
                            None)


_fused_diff.defvjp(_fused_fwd, _fused_bwd)


def fused_shaw_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_table: jnp.ndarray,
    max_pos_emb: int = 512,
    scale: float | None = None,
    batch_tile: int | None = None,
) -> jnp.ndarray:
    """softmax((q k^T + shaw_bias) * scale) v, fused, all heads.

    ``q, k, v``: [B, n, heads, d] (the natural post-Dense layout split
    into heads on the last axis — no head transpose needed);
    ``rel_table``: [2*max_pos_emb + 1, d].
    Returns [B, n, heads, d] in the dtype of ``q``.

    Differentiable both directions in Pallas: the backward is a fused
    flash-style kernel (:func:`_attn_bwd_kernel`) that recomputes the
    attention for the resident tile in VMEM and emits dq/dk/dv plus the
    rel-table gradient — the [b, h, n, n] logits never touch HBM in
    either direction, and long-n gradients route to the backward's own
    i-tiled grid (bounded VMEM at any crop length).

    Very long sequences (n beyond ~1150 at the default head config, e.g.
    utterances over ~7 s) exceed the whole-instance scoped-VMEM budget in
    the FORWARD; the kernel automatically grids over query blocks there
    (full k/v per instance, complete softmax rows) — same math, bounded
    VMEM for any length.  (The XLA einsum path is NOT a viable long-n
    fallback: its [i, j, b, h] bias relayout would need 88 GB at the 8 s
    serving bucket.)
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _fused_diff(q, k, v, rel_table, max_pos_emb, scale, batch_tile)
