"""Fused pallas attention vs the XLA einsum path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.models import TSCNet
from speech_enhancement_tpu.models.conformer import ShawAttention
from speech_enhancement_tpu.ops import compressed_stft
from speech_enhancement_tpu.ops.pallas_attention import fused_shaw_attention


@pytest.mark.parametrize("n", [7, 101, 161])
def test_fused_matches_reference_math(rng, n):
    b, h, d = 3, 2, 8
    q = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((1025, d)).astype(np.float32))
    scale = d**-0.5

    got = np.asarray(fused_shaw_attention(q, k, v, table, 512, scale))

    qh = np.asarray(q).transpose(0, 2, 1, 3).reshape(b * h, n, d)
    kh = np.asarray(k).transpose(0, 2, 1, 3).reshape(b * h, n, d)
    vh = np.asarray(v).transpose(0, 2, 1, 3).reshape(b * h, n, d)
    dots = np.einsum("bid,bjd->bij", qh, kh) * scale
    tab = np.asarray(table)
    for i in range(n):
        for j in range(n):
            dots[:, i, j] += (qh[:, i] @ tab[i - j + 512]) * scale
    e = np.exp(dots - dots.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    want = np.einsum("bij,bjd->bid", attn, vh)
    want = want.reshape(b, h, n, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n,h,d,tile", [(33, 2, 8, 4), (21, 4, 16, 2),
                                        (101, 4, 16, 8)])
def test_fused_small_batch_tiles_match_reference(rng, n, h, d, tile):
    """Explicit small batch tiles (ragged grids, b not a tile multiple)
    must equal the naive per-(i,j) reference exactly."""
    b = 5  # deliberately not a multiple of the tile
    q = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((1025, d)).astype(np.float32))
    scale = d**-0.5

    got = np.asarray(
        fused_shaw_attention(q, k, v, table, 512, scale, batch_tile=tile)
    )

    qh = np.asarray(q).transpose(0, 2, 1, 3).reshape(b * h, n, d)
    kh = np.asarray(k).transpose(0, 2, 1, 3).reshape(b * h, n, d)
    vh = np.asarray(v).transpose(0, 2, 1, 3).reshape(b * h, n, d)
    dots = np.einsum("bid,bjd->bij", qh, kh) * scale
    tab = np.asarray(table)
    for i in range(n):
        for j in range(n):
            dots[:, i, j] += (qh[:, i] @ tab[i - j + 512]) * scale
    e = np.exp(dots - dots.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    want = np.einsum("bij,bjd->bid", attn, vh)
    want = want.reshape(b, h, n, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_attention_gradients_match_xla(rng):
    """The fused Pallas backward kernel must match differentiating the
    plain einsum path — dq, dk, dv AND the scatter-added rel-table
    gradient — so the fused kernel is trainable in both directions."""
    b, n, h, d = 2, 17, 2, 8
    q = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    table = jnp.asarray(0.5 * rng.standard_normal((1025, d)).astype(np.float32))
    from speech_enhancement_tpu.ops.pallas_attention import _xla_attention

    def loss_fused(q, k, v, t):
        return jnp.sum(jnp.sin(fused_shaw_attention(q, k, v, t)))

    def loss_ref(q, k, v, t):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, t, 512, d**-0.5)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, table)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_fused_attention_trains_through_module(rng):
    """End-to-end: grads flow through ShawAttention(fused=True) including
    the rel_pos_emb table."""
    x = jnp.asarray(rng.standard_normal((3, 15, 16)).astype(np.float32))
    mod = ShawAttention(dim=16, heads=2, dim_head=8, fused=True)
    vs = mod.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(params):
        return jnp.mean(mod.apply({"params": params}, x,
                                  deterministic=True) ** 2)

    grads = jax.grad(loss)(vs["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)
    # the table gradient specifically must be nonzero (scatter-add path)
    assert float(jnp.max(jnp.abs(grads["rel_pos_emb"]))) > 0


def test_long_sequence_itiled_grid(rng):
    """n beyond the whole-instance scoped-VMEM budget must route to the
    i-tiled grid (the Mosaic compile hard-fails at ~n>1150: measured
    120.1 MB needed vs the 100 MB cap at n=1281; the XLA fallback is no
    option either — its [i,j,b,h] bias would be 88 GB at serving batch)
    and still produce correct, differentiable results."""
    from speech_enhancement_tpu.ops.pallas_attention import (
        _VMEM_FALLBACK_BYTES,
        _min_vmem_bytes,
        _xla_attention,
    )

    # decision boundary: 7 s bucket (n=1121) stays whole-instance
    # (hardware-validated), 8 s (n=1281) switches to the i-tiled grid
    assert _min_vmem_bytes(1121, 4, 16, 2) <= _VMEM_FALLBACK_BYTES
    assert _min_vmem_bytes(1281, 4, 16, 2) > _VMEM_FALLBACK_BYTES

    # tiny-d config that trips the threshold at testable size, so the
    # i-tiled pallas path itself runs under test (interpret mode on CPU);
    # n NOT a multiple of the 128 i-tile to exercise the query padding
    b, n, h, d = 2, 1547, 2, 4
    q = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((1025, d)).astype(np.float32))
    assert _min_vmem_bytes(n, h, d, 4) > _VMEM_FALLBACK_BYTES
    got = fused_shaw_attention(q, k, v, table)
    want = _xla_attention(q, k, v, table, 512, d**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # differentiable: the fused Pallas backward routes to its own i-tiled
    # grid at this length (bounded VMEM — no [b, h, n, n] logits in HBM)
    # and must match the XLA-differentiated gradients, including the
    # accumulated dk/dv and the scatter-added table gradient
    def loss_fused(q_, k_, v_, t_):
        return jnp.sum(fused_shaw_attention(q_, k_, v_, t_) ** 2)

    def loss_ref(q_, k_, v_, t_):
        return jnp.sum(_xla_attention(q_, k_, v_, t_, 512, d**-0.5) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, table)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_itiled_backward_multi_tile_grids(rng, monkeypatch):
    """Gradient parity when BOTH backward grid dims exceed one block
    (batch tiles >= 2 AND query-block tiles >= 2).

    Regression guard for a hardware-only accumulation bug: the original
    single-kernel i-tiled backward accumulated the rel-table gradient
    across the OUTER batch grid axis, but a TPU output block's VMEM
    buffer only persists across CONSECUTIVE grid steps — measured on
    v5e, dtable came out at max_rel 1.62 vs XLA at grid (2, 10) while
    interpret mode (which rewrites the backing array every step)
    passed.  The fix splits the backward into a dq/dk/dv kernel
    (grid (bb, ii), dk/dv accumulate over the inner ii) and a drel-only
    kernel with the TRANSPOSED grid (ii, bb) so its accumulation also
    rides the inner axis.  This test exercises the two-pass plumbing
    (grid orders, padding, fp32 accumulation, segment-sum) at a
    multi-tile shape; scripts/check_bwd_grid_accum.py re-validates the
    buffer semantics on real hardware (n=1280, fp32 and bf16)."""
    from speech_enhancement_tpu.ops import pallas_attention as pa

    monkeypatch.setattr(pa, "_VMEM_FALLBACK_BYTES", 1)
    monkeypatch.setattr(pa, "_I_TILE", 64)

    b, n, h, d = 7, 150, 2, 8  # ragged: 4 batch tiles x 3 i-tiles
    q = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((1025, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))

    gf = pa._bwd_kernel_call(q, k, v, table, g, 512, d**-0.5, 2)

    def loss_ref(q_, k_, v_, t_):
        return jnp.sum(pa._xla_attention(q_, k_, v_, t_, 512, d**-0.5) * g)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    for name, a, b_ in zip(("dq", "dk", "dv", "dtable"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_whole_instance_backward_multi_batch_tiles(rng):
    """Gradient parity for the WHOLE-INSTANCE backward when the batch
    grid has several tiles (grid (bb,) with drel accumulating across
    consecutive bb steps — the safe revisit order; the i-tiled path has
    its own two-pass test above).  Ragged b also exercises the zero-row
    padding no-op argument (g=0 rows give ds=0)."""
    from speech_enhancement_tpu.ops import pallas_attention as pa

    b, n, h, d = 7, 33, 2, 8  # batch_tile=2 -> 4 grid steps, 1 pad row
    q = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((1025, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))

    gf = pa._bwd_kernel_call(q, k, v, table, g, 512, d**-0.5, 2)

    def loss_ref(q_, k_, v_, t_):
        return jnp.sum(pa._xla_attention(q_, k_, v_, t_, 512, d**-0.5) * g)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    for name, a, b_ in zip(("dq", "dk", "dv", "dtable"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_clamp_tile_bounds_padding():
    """Auto batch tiles must never exceed the next power of two >= the
    actual batch: a VMEM budget can propose tile 512 at b=2 (n=17),
    which would pad the kernel grid with 99% zero rows of pure wasted
    compute."""
    from speech_enhancement_tpu.ops.pallas_attention import (
        _auto_batch_tile_bwd,
        _clamp_tile,
    )

    assert _clamp_tile(512, 2) == 2
    assert _clamp_tile(512, 3) == 4
    assert _clamp_tile(8, 100) == 8   # budget still caps large batches
    assert _clamp_tile(16, 1) == 1
    # the review's concrete case: b=2, n=17 gradients no longer pad x256
    assert _auto_batch_tile_bwd(17, 2) >= 512  # unclamped proposal
    assert _clamp_tile(_auto_batch_tile_bwd(17, 2), 2) == 2


def test_fused_attention_module_equivalence(rng):
    """ShawAttention(fused=True) == ShawAttention(fused=False) with the
    same params."""
    x = jnp.asarray(rng.standard_normal((3, 33, 16)).astype(np.float32))
    base = ShawAttention(dim=16, heads=2, dim_head=8)
    vs = base.init({"params": jax.random.PRNGKey(0)}, x)
    out_ref = base.apply(vs, x, deterministic=True)
    fused = ShawAttention(dim=16, heads=2, dim_head=8, fused=True)
    out_fused = fused.apply(vs, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_fused), rtol=1e-4, atol=1e-5
    )


def test_tscnet_fused_flag_same_params(rng):
    """Param trees are identical either way; outputs agree."""
    spec = compressed_stft(jnp.ones((1, 4000)), 400, 100)
    m0 = TSCNet(num_channel=8, num_features=201)
    m1 = TSCNet(num_channel=8, num_features=201, fused_attention=True)
    vs = m0.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec, deterministic=True,
    )
    r0, i0 = m0.apply(vs, spec, deterministic=True)
    r1, i1 = m1.apply(vs, spec, deterministic=True)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), rtol=1e-3,
                               atol=1e-4)
