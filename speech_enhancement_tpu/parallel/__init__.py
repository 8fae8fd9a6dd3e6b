from speech_enhancement_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_mesh,
    init_distributed,
    replicate,
    replicate_state,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "data_parallel_mesh",
    "init_distributed",
    "replicate",
    "replicate_state",
    "shard_batch",
]
