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
    "tp_shardings",
    "shard_train_state",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Multi-host bring-up. No-op in single-process runs.

    Extra kwargs pass through to :func:`jax.distributed.initialize`
    (e.g. ``shutdown_timeout_seconds`` — the default 300 s exit barrier
    is shorter than the compile-time skew between processes that
    time-share a small host, which kills the slower process mid-compile).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
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


def _put(x, sharding: NamedSharding):
    """device_put that stays collective-free under multi-process meshes.

    ``jax.device_put`` of a host value to a sharding that spans every
    process runs a cross-process ``assert_equal`` allgather PER LEAF (a
    value-consistency check, jax dispatch.py) — for a replicated train
    state that is hundreds of Gloo/ICI collectives at init time, and the
    first of them trips Gloo's hard 30 s context-init deadline whenever
    the processes' compile times are skewed (observed on the 2-process
    CPU bring-up test).  Placing the locally-addressable shards and
    assembling the global Array directly has identical semantics —
    every process passes the same seeded value, which is the same
    contract torch's replicated DDP init relies on (ref:
    tools/train.py:73-91) — with zero communication.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    idx_map = sharding.addressable_devices_indices_map(arr.shape)
    dbs = [jax.device_put(arr[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(
        arr.shape, sharding, dbs)


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of [B, ...] arrays with B sharded over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: _put(x, data_sharding(mesh, x.ndim)), batch
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: _put(x, sharding), tree)


def tp_shardings(params, mesh: Mesh, min_channels: int = 256):
    """Pytree of NamedShardings implementing the tensor-parallel rule.

    Conv/dense kernels whose out-channel count is ≥ ``min_channels`` and
    divisible by the mesh 'model' axis are sharded over 'model' on the
    output-channel dim; per-channel vectors (bias/scale) of the same
    width shard with them; everything else replicates.  This is the real
    TP hook SURVEY §2.8 reserves — the UNets fit one chip at the paper's
    resolutions, so only the widest layers are worth splitting, and the
    rule is a no-op when ``model == 1``.
    """
    msize = dict(mesh.shape).get("model", 1)
    rep = NamedSharding(mesh, P())

    def rule(path, leaf):
        shape = getattr(leaf, "shape", ())
        if msize <= 1 or len(shape) == 0:
            return rep
        out_ch = shape[-1]
        if out_ch < min_channels or out_ch % msize != 0:
            return rep
        key = path[-1]
        name = getattr(key, "key", None) or getattr(key, "name", str(key))
        if name == "kernel" and len(shape) in (2, 4):
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), "model"))
        if name in ("bias", "scale") and len(shape) == 1:
            return NamedSharding(mesh, P("model"))
        return rep

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_train_state(state, mesh: Mesh, min_channels: int = 256):
    """Place a TrainState on the mesh: params/EMA per :func:`tp_shardings`,
    optimizer moment trees (structure-identical to params) likewise,
    scalars and schedule counts replicated."""
    shardings = tp_shardings(state.params, mesh, min_channels)
    pstruct = jax.tree_util.tree_structure(state.params)
    rep = replicated_sharding(mesh)

    def is_param_tree(sub):
        try:
            return jax.tree_util.tree_structure(sub) == pstruct
        except Exception:  # pragma: no cover - defensive
            return False

    def place(sub):
        if is_param_tree(sub):
            return jax.device_put(sub, shardings)
        return jax.device_put(sub, rep)

    opt_state = jax.tree_util.tree_map(place, state.opt_state,
                                       is_leaf=is_param_tree)
    return state.replace(
        step=jax.device_put(state.step, rep),
        params=jax.device_put(state.params, shardings),
        ema_params=jax.device_put(state.ema_params, shardings),
        opt_state=opt_state,
    )


def host_batch_slice(global_batch: int) -> slice:
    """This host's slice of the global batch — the per-host data sharding
    that replaces DistributedSampler."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
