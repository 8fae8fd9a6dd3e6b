"""On-chip check: i-tiled backward gradient parity vs XLA when BOTH grid
dims exceed one block (b_pad//batch_tile >= 2 AND ni_pad//i_tile >= 2).

Code review flagged that `drel` in `_attn_bwd_kernel` accumulates across
the OUTER grid dim (bb) while its block index follows the inner dim (ii);
Pallas TPU only guarantees an output block's VMEM buffer persists across
CONSECUTIVE grid steps, so non-consecutive revisits may read stale data.
Interpret mode can't catch this (it reads/writes the backing array every
step).  This script measures it on the real device.

Usage: python scripts/check_bwd_grid_accum.py [--n 1280] [--b 8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from speech_enhancement_tpu.ops import pallas_attention as pa


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1280)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--batch-tile", type=int, default=None,
                    help="force the backward dq/dk/dv batch tile")
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()
    n, b, h, d = args.n, args.b, 4, 16
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kt, kg = jax.random.split(key, 5)
    q = jax.random.normal(kq, (b, n, h, d), dtype)
    k = jax.random.normal(kk, (b, n, h, d), dtype)
    v = jax.random.normal(kv, (b, n, h, d), dtype)
    table = jax.random.normal(kt, (2 * 512 + 1, d), dtype) * 0.02
    g = jax.random.normal(kg, (b, n, h, d), dtype)

    # report the backward grids the auto-sizers will pick
    itile = pa._I_TILE
    iz = dtype.dtype.itemsize if hasattr(dtype, "dtype") else jnp.dtype(dtype).itemsize
    bt = args.batch_tile or pa._auto_batch_tile_bwd_itiled(n, h, d, iz, itile)
    dt = pa._auto_batch_tile_drel(n, h, d, iz, itile)
    grid_i = pa._min_vmem_bytes_bwd(n, h, d, iz) > pa._VMEM_FALLBACK_BYTES
    print(f"n={n} b={b} {jnp.dtype(dtype).name}: grid_i={grid_i} "
          f"dqkv tile={bt} grid=({-(-b // bt)}, {-(-n // itile)}) "
          f"drel tile={dt} grid=({-(-n // itile)}, {-(-b // dt)})")

    def loss_ref(q, k, v, t):
        return jnp.sum(pa._xla_attention(q, k, v, t, 512, d ** -0.5) * g)

    bwd = jax.jit(lambda q, k, v, t, g: pa._bwd_kernel_call(
        q, k, v, t, g, 512, d ** -0.5, args.batch_tile))
    gf = bwd(q, k, v, table, g)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))(q, k, v, table)
    tol = 5e-2 if args.bf16 else 1e-3
    for name, a, r in zip(("dq", "dk", "dv", "dtable"), gf, gr):
        a = jax.device_get(a).astype("float32")
        r = jax.device_get(r).astype("float32")
        denom = float(abs(r).max()) or 1.0
        max_rel = float(abs(a - r).max()) / denom
        print(f"  {name}: max_rel={max_rel:.3e} "
              f"{'OK' if max_rel < tol else 'MISMATCH'}")


if __name__ == "__main__":
    main()
