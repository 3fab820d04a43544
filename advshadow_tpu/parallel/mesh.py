"""SPMD mesh & sharding utilities.

The TPU-native replacement for the reference's DDP stack
(``mp.spawn`` + NCCL process groups + DistributedSampler +
grad-allreduce hooks, ref: tools/train.py:73-91,131,285-287): one SPMD
program over a ``jax.sharding.Mesh`` with a ``data`` axis (optionally a
``model`` axis for tensor-parallel hooks).  Parameters are replicated,
batches are sharded along ``data``; XLA inserts the gradient
all-reduce over ICI automatically when the jitted train step consumes a
data-sharded batch and produces replicated parameter updates — no
explicit collectives, no rendezvous daemon, no barrier calls.

Multi-host: call :func:`initialize_distributed` (a thin
``jax.distributed.initialize`` wrapper) before building the mesh; data
loading shards per-host via :func:`host_batch_slice`, replacing
DistributedSampler (ref: utils/utils.py:153-157).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "host_batch_slice",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up. No-op in single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. ``data`` defaults to all devices /
    ``model``. ``model=1`` keeps a TP axis available as a hook without
    sharding anything over it (the UNets fit one chip at these
    resolutions — SURVEY.md §2.8)."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch-dim sharding over the data axis for an ndim array."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of [B, ...] arrays with B sharded over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def host_batch_slice(global_batch: int) -> slice:
    """This host's slice of the global batch — the per-host data sharding
    that replaces DistributedSampler."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
