"""Checkpointing (orbax) with the reference's self-describing metadata.

Mirrors the reference checkpoint subsystem (ref: utils/checkpoint.py):
- a rich metadata dict saved alongside weights {start_epoch, num_classes,
  classes_name, conditional, image_size, sample, network, act}
  (ref: utils/checkpoint.py:143-147), so generation can be configured
  entirely from a checkpoint (ref: utils/initializer.py:216-256);
- ``ckpt_last`` written every epoch plus optional per-epoch copies
  (ref: utils/checkpoint.py:148-156);
- pretrain partial load with label-embedding reset and shape-filtered
  merge (ref: utils/checkpoint.py:96-117);
- EMA-weights selection at load (ref: utils/checkpoint.py:42-54).

No DDP ``module.`` prefix handling is needed — SPMD params are a plain
pytree on every host.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_ckpt", "load_ckpt", "load_ckpt_params",
           "filter_pretrain_params", "separate_ckpt_weights",
           "wait_for_async_saves", "export_params_npz",
           "restore_ckpt_from_npz"]

_META = "metadata.json"


def _tree_dir(path: str, name: str) -> str:
    return os.path.join(os.path.abspath(path), name)


_async_ckptr: Optional[ocp.AsyncCheckpointer] = None
_async_threads: list = []


def _get_async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def wait_for_async_saves() -> None:
    """Block until all in-flight async checkpoint writes (and their
    metadata/interval-copy finalization) land."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    while _async_threads:
        _async_threads.pop().join()


def _finalize_ckpt(last: str, results_dir: str, epoch: int, meta: dict,
                   save_name, save_model_interval, start_model_interval):
    """Write the metadata sidecar and interval copy — runs after the
    (possibly async) orbax write has renamed the directory into place."""
    with open(os.path.join(last, _META), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    if save_model_interval and epoch > start_model_interval and save_name:
        copy_dir = _tree_dir(results_dir, save_name)
        if os.path.exists(copy_dir):
            shutil.rmtree(copy_dir)
        shutil.copytree(last, copy_dir)


def save_ckpt(
    results_dir: str,
    epoch: int,
    params: Any,
    ema_params: Any,
    opt_state: Any = None,
    save_name: Optional[str] = None,
    save_model_interval: bool = False,
    start_model_interval: int = -1,
    async_save: bool = False,
    **metadata,
) -> str:
    """Save ``ckpt_last`` (always) plus an interval copy (optionally).

    ``metadata`` carries the reference fields (num_classes, conditional,
    image_size, sample, network, act, classes_name, ...).
    ``async_save`` writes in the background (preemption tolerance: the
    train loop keeps stepping while the previous checkpoint lands; call
    :func:`wait_for_async_saves` before exit) — the SURVEY §5.3
    elastic-recovery upgrade over the reference's synchronous saves.
    """
    os.makedirs(results_dir, exist_ok=True)
    last = _tree_dir(results_dir, "ckpt_last")
    if os.path.exists(last):
        shutil.rmtree(last)
    tree = {"model": params, "ema_model": ema_params}
    if opt_state is not None:
        tree["optimizer"] = opt_state
    meta = dict(metadata)
    meta["start_epoch"] = int(epoch)

    if async_save:
        import threading

        ckptr = _get_async_checkpointer()
        ckptr.save(last, args=ocp.args.PyTreeSave(tree))

        def _bg():
            ckptr.wait_until_finished()
            _finalize_ckpt(last, results_dir, epoch, meta, save_name,
                           save_model_interval, start_model_interval)

        t = threading.Thread(target=_bg, daemon=True)
        t.start()
        _async_threads.append(t)
    else:
        ocp.PyTreeCheckpointer().save(last, tree)
        _finalize_ckpt(last, results_dir, epoch, meta, save_name,
                       save_model_interval, start_model_interval)
    return last


def load_ckpt(ckpt_path: str, target: Any = None) -> Dict[str, Any]:
    """Load the full checkpoint tree + metadata dict.

    ``target``: optional pytree template ({"model": ..., "ema_model": ...,
    "optimizer": ...}) so structured leaves (optax states) restore with
    their original types instead of plain dicts."""
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.abspath(ckpt_path), item=target)
    meta_path = os.path.join(ckpt_path, _META)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    tree["metadata"] = meta
    return tree


def load_ckpt_params(ckpt_path: str, is_use_ema: bool = False) -> Any:
    """Model (or EMA) params only, with EMA fallback to raw weights
    (ref: utils/checkpoint.py:42-54)."""
    tree = load_ckpt(ckpt_path)
    if is_use_ema and tree.get("ema_model") is not None:
        return tree["ema_model"]
    return tree["model"]


def export_params_npz(params: Any, out_path: str,
                      dtype=np.float16) -> str:
    """Flatten a param pytree to a compressed npz of '/'-joined keys.

    The git-sized portable form of a trained model (the raw orbax tree
    with optimizer state is ~331 MB and is .gitignored); pair with the
    checkpoint's ``metadata.json`` and :func:`restore_ckpt_from_npz`
    rebuilds a loadable ``ckpt_last`` from the two committed files.
    """
    flat: Dict[str, np.ndarray] = {}

    def walk(sub, prefix=""):
        for k, v in sub.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v).astype(dtype)

    walk(params)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez_compressed(out_path, **flat)
    return out_path


def restore_ckpt_from_npz(
    npz_path: str,
    metadata_json: str,
    out_dir: str,
    dtype=np.float32,
) -> str:
    """Rebuild a loadable ``ckpt_last`` from committed evidence files.

    ``npz_path`` is an :func:`export_params_npz` flat archive (e.g. the
    committed ``ema_params_f16.npz``); ``metadata_json`` the metadata
    saved next to the original orbax tree.  Writes an orbax checkpoint at
    ``out_dir/ckpt_last`` whose model AND ema_model are the npz weights
    (cast to ``dtype``), so the generate CLI / deploy server work on it
    unchanged.  Returns the ckpt_last path.
    """
    arch = np.load(npz_path)
    params: Dict[str, Any] = {}
    for key in arch.files:
        sub = params
        parts = key.split("/")
        for p in parts[:-1]:
            sub = sub.setdefault(p, {})
        sub[parts[-1]] = arch[key].astype(dtype)
    with open(metadata_json) as f:
        meta = json.load(f)
    meta.setdefault("restored_from", os.path.basename(npz_path))
    epoch = int(meta.pop("start_epoch", 0))
    save_ckpt(out_dir, epoch, params, params, **meta)
    return _tree_dir(out_dir, "ckpt_last")


def filter_pretrain_params(
    init_params: Any,
    loaded_params: Any,
    reset_label_embedding: bool = True,
) -> Any:
    """Pretrain partial load: keep loaded weights whose shapes match the
    freshly initialized tree, re-initialize the label embedding (class
    count may differ), drop mismatches (ref: utils/checkpoint.py:96-117).
    """
    flat_init = _flatten(init_params)
    flat_loaded = _flatten(loaded_params)
    merged = {}
    for key, init_val in flat_init.items():
        loaded = flat_loaded.get(key)
        is_label = "label_emb" in key
        if (loaded is not None and not (reset_label_embedding and is_label)
                and np.shape(loaded) == np.shape(init_val)):
            merged[key] = loaded
        else:
            merged[key] = init_val
    return _unflatten(merged, init_params)


def separate_ckpt_weights(tree: Dict[str, Any], separate_model=True,
                          separate_ema_model=True, separate_optimizer=True):
    """Strip selected sections (ref: utils/checkpoint.py:160-176)."""
    out = dict(tree)
    if separate_model:
        out["model"] = None
    if separate_ema_model:
        out["ema_model"] = None
    if separate_optimizer:
        out["optimizer"] = None
    return out


def _flatten(tree: Any) -> Dict[str, Any]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(k): v for k, v in flat}


def _unflatten(flat: Dict[str, Any], like: Any) -> Any:
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = [flat[jax.tree_util.keystr(k)] for k, _ in paths]
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(like),
                                        leaves)
