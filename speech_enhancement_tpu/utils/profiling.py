"""Profiling / tracing hooks (SURVEY.md §5 observability).

The reference's tracing is AverageMeter prints + cuda max-memory
(function.py:109-120).  Here:

* :func:`trace` — context manager around ``jax.profiler.trace`` emitting a
  TensorBoard-loadable trace directory of device/host timelines;
* :class:`StepTimer` — wall-clock step timing with jitted-work completion
  (one-element host read; block_until_ready is a no-op on current axon
  runtimes) and a rolling summary;
* :func:`device_memory_stats` — per-device live/peak bytes where the
  backend exposes them (the TPU analogue of torch.cuda.max_memory_allocated).
"""

from __future__ import annotations

import contextlib
import time

import jax


@jax.jit
def _fence_scalar(leaves):
    """Fold one element of every leaf into a single scalar — ONE compiled
    dispatch + ONE host read fences an arbitrarily large pytree (a
    per-leaf eager chain would be hundreds of ~30 ms tunneled dispatches
    on axon, distorting the very timings StepTimer measures)."""
    import jax.numpy as jnp

    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + jnp.abs(jnp.ravel(leaf)[0]).astype(jnp.float32)
    return acc


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace for the enclosed steps."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step timer; call ``tick(outputs)`` once per step."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._last = time.perf_counter()

    def tick(self, outputs=None) -> float:
        if outputs is not None:
            # block_until_ready is a no-op on current axon runtimes
            # (returns before execution finishes); the true barrier is ONE
            # device->host read that data-depends on EVERY leaf — leaves
            # may come from separate dispatches, so fencing just the first
            # would undercount.  The fold happens inside ONE jitted
            # dispatch (complex leaves are fine there: jnp.abs makes them
            # real before the host read, which axon can't do for complex).
            import jax.numpy as jnp

            leaves = tuple(
                leaf for leaf in jax.tree_util.tree_leaves(outputs)
                if hasattr(leaf, "ravel") and getattr(leaf, "size", 0)
                and jnp.issubdtype(getattr(leaf, "dtype", None), jnp.number)
            )
            if leaves:
                float(_fence_scalar(leaves))
            else:
                jax.block_until_ready(outputs)
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def avg(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def device_memory_stats() -> list[dict]:
    """Per-device memory stats (empty entries where unsupported)."""
    out = []
    for d in jax.devices():
        stats = {}
        try:
            stats = dict(d.memory_stats() or {})
        except Exception:
            pass
        out.append({"device": str(d), **stats})
    return out
