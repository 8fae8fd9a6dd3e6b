"""Batched enhancement (serving) pipeline.

The reference enhances one utterance at a time in Python
(inference_gan.py:75-100: RMS normalize, wrap-pad to a hop multiple, stft,
TSCNet, istft, un-normalize, trim).  TPU-native version: utterances are
wrap-padded into *length buckets* (one compiled executable per bucket, no
per-length recompilation), batched, and the whole normalize -> stft ->
model -> istft -> denormalize chain runs as a single jitted program per
bucket.  This is the path behind bench.py's utterances/sec headline.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.ops import (
    compressed_stft,
    normalize_batch,
    uncompressed_istft,
)


def round_to_bucket(length: int, quantum: int = 8000, hop: int = 100) -> int:
    """Next bucket length: a multiple of ``quantum`` (>= hop multiple)."""
    assert quantum % hop == 0
    return max(quantum, ((length + quantum - 1) // quantum) * quantum)


def wrap_pad(x: np.ndarray, target: int) -> np.ndarray:
    """Pad 1-D signal to ``target`` by wrapping from the start
    (inference_gan.py:84-87 generalized to arbitrary pad lengths)."""
    if len(x) >= target:
        return x[:target]
    return np.pad(x, (0, target - len(x)), mode="wrap")


class Enhancer:
    """Jit-compiled batched enhancer for a TSCNet-style generator."""

    def __init__(
        self,
        model,
        variables,
        n_fft: int = 400,
        hop: int = 100,
        quantum: int = 8000,
        dtype=jnp.float32,
        compute_dtype=None,
        matmul_precision: str | None = "bfloat16",
        mesh=None,
        fused_stft: bool = False,
    ):
        """``mesh``: an optional 1-D ``jax.sharding.Mesh`` ("data" axis) —
        batches are sharded over it and params replicated, so enhancement
        runs SPMD across chips (ragged chunks are row-padded to the mesh
        size).  Single default device when None.

        Precision knobs:

        * ``matmul_precision='bfloat16'`` (default) keeps every array in
          fp32 but runs matmuls/convs as single-pass bf16 on the MXU with
          fp32 accumulation — the TPU-native fast path with ~1e-3 output
          deviation (the residual stream is never rounded);
        * ``compute_dtype=jnp.bfloat16`` additionally casts params and
          activations to bf16 (halves HBM traffic, ~1.9x faster on v5e);
          measured perceptually transparent on the full-size generator:
          PESQ(fp32 output, bf16 output) = 4.64 at ~3% waveform RMS
          (small random-init models can deviate more, see tests);
        * ``matmul_precision=None`` -> XLA default (highest, 6-pass fp32).
        """
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from speech_enhancement_tpu.parallel import replicate_state

            variables = replicate_state(mesh, variables)
        self.variables = variables
        self.n_fft = n_fft
        self.hop = hop
        # hop-align the bucket quantum: round_to_bucket asserts
        # quantum % hop == 0, and HOP_SAMPLES is config-overridable (a
        # hop of e.g. 256 does not divide the default 8000) — derive the
        # nearest not-larger hop multiple instead of crashing at the
        # first enhance() call (same derivation as the diffuse CLI)
        if quantum % hop != 0:
            quantum = max(hop, quantum - quantum % hop)
        self.quantum = quantum
        self.dtype = dtype
        self.compute_dtype = compute_dtype
        self.matmul_precision = matmul_precision
        # fused_stft: route featurization through the Pallas hop-block
        # kernels (ops/pallas_stft.py) instead of the XLA matmul DSP
        self.fused_stft = fused_stft
        self._compiled = {}

    def _step(self, variables, noisy: jnp.ndarray) -> jnp.ndarray:
        if self.fused_stft:
            from speech_enhancement_tpu.ops.pallas_stft import (
                pallas_istft,
                pallas_stft,
            )

            stft_fn = pallas_stft
            istft_fn = pallas_istft
        else:
            stft_fn = compressed_stft
            istft_fn = uncompressed_istft
        _, noisy_n, c = normalize_batch(noisy, noisy)
        spec = stft_fn(noisy_n, self.n_fft, self.hop, comp_type="pow")
        if self.compute_dtype is not None:
            cd = self.compute_dtype
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(cd) if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                variables,
            )
            spec_in = (jnp.real(spec).astype(cd), jnp.imag(spec).astype(cd))
        else:
            spec_in = spec
        est_real, est_imag = self.model.apply(
            variables, spec_in, deterministic=True
        )
        est = istft_fn(
            jax.lax.complex(est_real.astype(jnp.float32),
                            est_imag.astype(jnp.float32)),
            self.n_fft,
            self.hop,
            comp_type="pow",
            length=noisy.shape[-1],
        )
        return est / c

    def _get_compiled(self, length: int):
        fn = self._compiled.get(length)
        if fn is None:
            if self.matmul_precision is not None:
                mp = self.matmul_precision

                def step(variables, x):
                    with jax.default_matmul_precision(mp):
                        return self._step(variables, x)

            else:
                step = self._step
            if self.mesh is not None:
                # shard_map (not jit+in_shardings): the step is pure data
                # parallel (normalize_batch is per-utterance), and running
                # it per-shard lets the Pallas fused-attention kernel —
                # a Mosaic custom call with no GSPMD partitioning rule —
                # execute on each device's local batch slice.
                from jax.sharding import PartitionSpec as P

                inner = jax.shard_map(
                    step, mesh=self.mesh,
                    in_specs=(P(), P("data")), out_specs=P("data"),
                    # pallas_call emits ShapeDtypeStructs without vma
                    # annotations; the step is collective-free so varying-
                    # axis checking has nothing to verify anyway
                    check_vma=False,
                )
                raw = jax.jit(inner)
            else:
                raw = jax.jit(step)
            # read self.variables at CALL time, not closure-capture time:
            # swapping checkpoints on a live Enhancer must not serve the
            # stale weights the first compile saw
            fn = lambda x: raw(self.variables, x)  # noqa: E731
            self._compiled[length] = fn
        return fn

    def _pad_to_mesh(self, batch: np.ndarray) -> np.ndarray:
        """Repeat the last row so B divides the mesh size; no-op without
        a mesh.  (Zero-row padding would also be safe — normalize_batch
        guards silent rows with gain c=1 — but repeating keeps the pad
        rows' compute statistics realistic.)"""
        if self.mesh is None:
            return batch
        n_dev = self.mesh.devices.size
        if batch.shape[0] % n_dev:
            reps = n_dev - batch.shape[0] % n_dev
            batch = np.concatenate([batch, np.repeat(batch[-1:], reps, axis=0)])
        return batch

    def enhance_batch(self, noisy: np.ndarray) -> np.ndarray:
        """Enhance a fixed-length [B, L] batch (L a hop multiple)."""
        b = noisy.shape[0]
        noisy = self._pad_to_mesh(np.asarray(noisy))
        fn = self._get_compiled(noisy.shape[-1])
        return np.asarray(fn(jnp.asarray(noisy, self.dtype)))[:b]

    def enhance(self, utterances: Sequence[np.ndarray],
                batch_size: int = 32) -> list[np.ndarray]:
        """Enhance variable-length utterances via length-bucketed batching.

        Returns enhanced signals trimmed to their original lengths, in the
        input order.
        """
        order = sorted(range(len(utterances)), key=lambda i: len(utterances[i]))
        out: list[np.ndarray | None] = [None] * len(utterances)

        def drain(pending):
            est_dev, chunk = pending
            est = np.asarray(est_dev)  # blocks until the device is done
            for row, j in enumerate(chunk):
                out[j] = est[row, : len(utterances[j])]

        # one-deep pipeline: JAX dispatch is async, so batch i computes on
        # device while the host stacks/pads batch i+1 and converts batch
        # i-1 — hides the per-dispatch tunnel latency behind compute
        pending = None
        i = 0
        while i < len(order):
            chunk = order[i : i + batch_size]
            bucket = round_to_bucket(
                max(len(utterances[j]) for j in chunk), self.quantum, self.hop
            )
            batch = np.stack(
                [wrap_pad(np.asarray(utterances[j], np.float32), bucket)
                 for j in chunk]
            )
            batch = self._pad_to_mesh(batch)
            fn = self._get_compiled(bucket)
            est_dev = fn(jnp.asarray(batch, self.dtype))
            if pending is not None:
                drain(pending)
            pending = (est_dev, chunk)
            i += batch_size
        if pending is not None:
            drain(pending)
        return out  # type: ignore[return-value]


def predict_one(model, variables, noisy_signal: np.ndarray,
                n_fft: int = 400, hop: int = 100) -> np.ndarray:
    """Single-utterance reference-semantics predict (inference_gan.py:75-100):
    pad only to the next hop multiple (exact parity, one compile per
    length).  Prefer :class:`Enhancer` for throughput."""
    length = len(noisy_signal)
    padded = ((length + hop - 1) // hop) * hop
    x = wrap_pad(np.asarray(noisy_signal, np.float32), padded)[None]
    enh = Enhancer(model, variables, n_fft, hop, quantum=hop)
    return enh.enhance_batch(x)[0, :length]
