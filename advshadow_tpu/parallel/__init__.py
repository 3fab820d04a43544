from advshadow_tpu.parallel.mesh import (
    data_sharding,
    host_batch_slice,
    initialize_distributed,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
    shard_train_state,
    tp_shardings,
)

__all__ = [
    "data_sharding",
    "host_batch_slice",
    "initialize_distributed",
    "make_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
    "shard_train_state",
    "tp_shardings",
]
