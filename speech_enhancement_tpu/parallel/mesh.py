"""Device mesh + sharding: the TPU-native replacement for the reference's
entire distributed runtime (NCCL process groups, DDP wrappers, SyncBN,
DistributedSampler — main_gan.py:133-188, cdiffuse/learner.py:196-205).

Data parallelism here is a *sharding annotation*, not a code path: batches
are device_put against the mesh's ``data`` axis, params stay replicated,
and the unchanged jitted train step runs SPMD — XLA inserts the gradient
all-reduce over ICI, and global-batch norm statistics reproduce SyncBN
semantics with zero extra code.

Multi-host: call :func:`init_distributed` (jax.distributed) before device
enumeration; each host feeds its addressable shard of the global batch
(see data.DataLoader's shard_id/num_shards).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host rendezvous (replaces dist.init_process_group,
    main_gan.py:140).  No-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def barrier(name: str = "barrier", timeout_ms: int = 600_000) -> None:
    """Cross-process sync point via the coordination service (replaces
    dist.barrier(), main_gan.py:142).  No-op single-process.

    Use it after per-process compile-heavy setup (model init, checkpoint
    restore) and BEFORE the first collective executes: the CPU Gloo
    backend's clique initialization has a hard ~30 s rendezvous timeout,
    so compile-time skew between processes at the first all-reduce
    aborts the run.  The coordination-service barrier has no such limit
    and does not itself need the collective clique."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # single-process: nothing to sync
        return
    client.wait_at_barrier(name, timeout_ms)


def data_parallel_mesh(n_devices: int | None = None,
                       axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or the first n) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """device_put host arrays with the batch axis sharded over the mesh.
    Batch size must divide the mesh size (the reference divides the global
    batch by world size the same way, main_gan.py:166)."""
    sh = batch_sharding(mesh, axis_name)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_state(mesh: Mesh, state):
    """device_put a state pytree fully replicated over the mesh."""
    sh = replicate(mesh)
    return jax.device_put(state, sh)
