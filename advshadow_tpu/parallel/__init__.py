from advshadow_tpu.parallel.mesh import (
    data_sharding,
    host_batch_slice,
    initialize_distributed,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "data_sharding",
    "host_batch_slice",
    "initialize_distributed",
    "make_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
