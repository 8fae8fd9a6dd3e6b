from speech_enhancement_tpu.parallel.mesh import (
    barrier,
    batch_sharding,
    data_parallel_mesh,
    init_distributed,
    replicate,
    replicate_state,
    shard_batch,
)

__all__ = [
    "barrier",
    "batch_sharding",
    "data_parallel_mesh",
    "init_distributed",
    "replicate",
    "replicate_state",
    "shard_batch",
]
