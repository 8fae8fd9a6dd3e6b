"""Pallas TPU kernels: fused STFT -> power-compress and
uncompress -> iSTFT -> overlap-add.

The featurization runs inside every train/eval step (SURVEY.md L0); these
kernels fuse each direction into one VMEM-resident pass per frame tile.

Key TPU trick: with ``n_fft = r * hop`` the windowed DFT distributes over
hop blocks —

    (frames * w) @ B  ==  sum_k  block[k : k+T]  @  (w_k * B_k)

so the kernel never materializes overlapped frames (no unaligned
reshape/concat, which Mosaic cannot vectorize): it reads the signal as
[T + r - 1, hop] hop blocks and accumulates r MXU matmuls against
window-folded basis chunks.  The inverse runs the transposed decomposition
and overlap-adds with r shifted sublane updates.

Numerics are validated against ops.stft in tests/test_pallas_stft.py;
`interpret=True` is selected automatically off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speech_enhancement_tpu.ops.stft import (
    _dft_matrices,
    _idft_matrices,
    hamming_window,
    hamming_window_np,
    overlap_add,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _stft_kernel(*refs, r, hop, t_tile, fpad, comp_pow):
    # refs: r shifted hop-block views [1, t_tile, hop] + basis [r, hop, 2*fpad]
    # + out; view k's row t holds hop block (tile_start + t + k)
    block_refs = refs[:r]
    basis_ref = refs[r]
    out_ref = refs[r + 1]
    spec = jnp.zeros((t_tile, 2 * fpad), jnp.float32)
    for k in range(r):
        spec = spec + jnp.dot(block_refs[k][0, :, :], basis_ref[k],
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
    if comp_pow:
        re = spec[:, :fpad]
        im = spec[:, fpad:]
        mag2 = re * re + im * im
        scale = jnp.where(mag2 > 1e-24, mag2**-0.35, 0.0)
        spec = jnp.concatenate([re * scale, im * scale], axis=1)
    out_ref[0, :, :] = spec


def pallas_stft(
    x: jnp.ndarray,
    n_fft: int = 400,
    hop: int = 100,
    comp_type: str = "pow",
    t_tile: int = 64,
) -> jnp.ndarray:
    """Fused (optionally power-compressed) STFT: ``[B, L]`` -> complex
    ``[B, T, F]`` matching ops.compressed_stft for comp_type 'pow'/'none'."""
    assert comp_type in ("pow", "none")
    assert n_fft % hop == 0
    if x.ndim == 1:
        x = x[None]
    b, _ = x.shape
    r = n_fft // hop
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (xp.shape[1] - n_fft) // hop
    nfreq = n_fft // 2 + 1
    fpad = _round_up(nfreq, 128)

    t_tiles = -(-n_frames // t_tile)
    total_blocks = t_tiles * t_tile + r - 1
    xp = jnp.pad(xp, ((0, 0), (0, total_blocks * hop - xp.shape[1])))
    blocks = xp.reshape(b, total_blocks, hop)
    # r shifted views so every kernel block is a plain non-overlapping tile
    views = [blocks[:, k : k + t_tiles * t_tile, :] for k in range(r)]

    cos_m, msin_m = _dft_matrices(n_fft)
    window = hamming_window_np(n_fft)
    basis = np.zeros((n_fft, 2 * fpad), np.float32)
    basis[:, :nfreq] = cos_m
    basis[:, fpad : fpad + nfreq] = msin_m
    basis *= window[:, None]
    basis = jnp.asarray(basis.reshape(r, hop, 2 * fpad))

    kernel = functools.partial(
        _stft_kernel, r=r, hop=hop, t_tile=t_tile, fpad=fpad,
        comp_pow=(comp_type == "pow"),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, t_tiles),
        in_specs=[
            pl.BlockSpec((1, t_tile, hop), index_map=lambda i, j: (i, j, 0))
            for _ in range(r)
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t_tile, 2 * fpad),
                               index_map=lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_tiles * t_tile, 2 * fpad),
                                       jnp.float32),
        interpret=_interpret(),
    )(*views, basis)
    out = out[:, :n_frames]
    return jax.lax.complex(out[..., :nfreq], out[..., fpad : fpad + nfreq])


# ---------------------------------------------------------------------------
# inverse
# ---------------------------------------------------------------------------


def _istft_kernel(spec_ref, basis_ref, out_ref, *, r, hop, t_tile, fpad,
                  comp_pow):
    # spec_ref: [1, t_tile, 2*fpad]; basis_ref: [r, 2*fpad, hop]
    # out_ref: [1, t_tile + r - 1, hop] — per-tile partial OLA
    re = spec_ref[0, :, :fpad]
    im = spec_ref[0, :, fpad:]
    if comp_pow:
        mag2 = re * re + im * im
        scale = jnp.where(mag2 > 1e-24, mag2 ** ((1.0 / 0.3 - 1.0) / 2.0), 0.0)
        re = re * scale
        im = im * scale
    packed = jnp.concatenate([re, im], axis=1)  # [t_tile, 2*fpad]
    out_ref[0, 0, :, :] = jnp.zeros_like(out_ref[0, 0, :, :])
    for k in range(r):
        part = jnp.dot(packed, basis_ref[k],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # [t_tile, hop]
        out_ref[0, 0, k : k + t_tile, :] = out_ref[0, 0, k : k + t_tile, :] + part


def pallas_istft(
    spec: jnp.ndarray,
    n_fft: int = 400,
    hop: int = 100,
    comp_type: str = "pow",
    length: int | None = None,
    t_tile: int = 64,
) -> jnp.ndarray:
    """Fused (optionally power-uncompressed) iSTFT: complex ``[B, T, F]``
    -> ``[B, L]`` matching ops.uncompressed_istft for 'pow'/'none'."""
    assert comp_type in ("pow", "none")
    assert n_fft % hop == 0
    b, n_frames, nfreq = spec.shape
    fpad = _round_up(nfreq, 128)
    r = n_fft // hop

    t_tiles = -(-n_frames // t_tile)
    re = jnp.zeros((b, t_tiles * t_tile, fpad), jnp.float32)
    re = re.at[:, :n_frames, :nfreq].set(jnp.real(spec))
    im = jnp.zeros((b, t_tiles * t_tile, fpad), jnp.float32)
    im = im.at[:, :n_frames, :nfreq].set(jnp.imag(spec))
    packed = jnp.concatenate([re, im], axis=-1)

    c_inv, s_inv = _idft_matrices(n_fft)
    window = hamming_window_np(n_fft)
    basis = np.zeros((2 * fpad, n_fft), np.float32)
    basis[:nfreq, :] = c_inv
    basis[fpad : fpad + nfreq, :] = s_inv
    basis *= window[None, :]
    basis = jnp.asarray(
        basis.reshape(2 * fpad, r, hop).transpose(1, 0, 2)
    )  # [r, 2*fpad, hop]

    kernel = functools.partial(
        _istft_kernel, r=r, hop=hop, t_tile=t_tile, fpad=fpad,
        comp_pow=(comp_type == "pow"),
    )
    tiles = pl.pallas_call(
        kernel,
        grid=(b, t_tiles),
        in_specs=[
            pl.BlockSpec((1, t_tile, 2 * fpad),
                         index_map=lambda i, j: (i, j, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t_tile + r - 1, hop),
                               index_map=lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_tiles, t_tile + r - 1, hop),
                                       jnp.float32),
        interpret=_interpret(),
    )(packed, basis)

    # combine tile partials: tile j covers hop blocks [j*t_tile,
    # j*t_tile + t_tile + r - 2]; adjacent tiles overlap by r - 1 blocks
    total_blocks = t_tiles * t_tile + r - 1
    sig = jnp.zeros((b, total_blocks, hop), jnp.float32)
    for j in range(t_tiles):
        sig = jax.lax.dynamic_update_slice(
            sig,
            jax.lax.dynamic_slice(
                sig, (0, j * t_tile, 0), (b, t_tile + r - 1, hop)
            )
            + tiles[:, j],
            (0, j * t_tile, 0),
        )
    sig = sig.reshape(b, total_blocks * hop)

    # window-sum-square normalization + center trim (torch.istft semantics)
    wsq = (hamming_window(n_fft) ** 2)[None, None, :]
    env = overlap_add(jnp.broadcast_to(wsq, (1, n_frames, n_fft)), hop)
    env = jnp.where(env > 1e-11, env, 1.0)
    out_len = n_fft + hop * (n_frames - 1)
    sig = sig[:, :out_len] / env
    pad = n_fft // 2
    sig = sig[:, pad : out_len - pad]
    if length is not None:
        sig = sig[:, :length]
    return sig
