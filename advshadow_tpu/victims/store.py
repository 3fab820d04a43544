"""Victim variable persistence + real-checkpoint drop-in loading.

Two jobs (both round-2 verdict/advisor items):

1. ``save_variables`` / ``load_variables`` — victim weights stored as an
   ``.npz`` of raw arrays (flat ``/``-joined tree paths), replacing the
   round-2 pickle format whose ``pickle.load`` is
   arbitrary-code-execution-on-load if an artifact is ever tampered with.
   ``.pkl`` artifacts from round 2 still load (read-only back-compat).

2. ``load_torch_state_dict`` + ``port_state_dict`` — the documented,
   tested drop-in path for REAL pretrained torch weights (the reference
   evaluates ImageNet-pretrained timm/torchvision/HF victims,
   ref: ASR_fast.py:16-88, fid_fast.py:11-20; this zero-egress host has
   no such weights).  The day a ``torch.save(model.state_dict())`` file
   (or an ``.npz`` of the same name->array mapping) appears, it routes
   through :mod:`advshadow_tpu.victims.port` via the ``--torch_state_dict``
   CLI flag with zero code changes.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping

import numpy as np

from advshadow_tpu.victims import port as _port

__all__ = ["save_variables", "load_variables", "load_torch_state_dict",
           "port_state_dict", "PORTERS"]

_SEP = "/"


def _flatten(tree: Mapping, prefix="") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_variables(path: str, variables: Mapping) -> str:
    """Write a Flax variables tree ({'params': ..., 'batch_stats': ...})
    as an npz of raw arrays. Returns the path written (``.npz`` enforced)."""
    if not path.endswith(".npz"):
        path = os.path.splitext(path)[0] + ".npz"
    np.savez_compressed(path, **_flatten(variables))
    return path


def load_variables(path: str) -> Dict:
    """Load a victim variables tree saved by :func:`save_variables`
    (``.npz``) or by the round-2 pickle format (``.pkl``, legacy)."""
    if path.endswith((".pkl", ".pickle")):
        import pickle

        with open(path, "rb") as f:
            return pickle.load(f)
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


#: victim-zoo name -> (porter, kwargs) for real torch state_dicts.
#: Geometry kwargs match the zoo factories in victims/zoo.py.
PORTERS = {
    "resnet18": (_port.port_resnet, {"stage_sizes": (2, 2, 2, 2)}),
    "resnet34": (_port.port_resnet, {"stage_sizes": (3, 4, 6, 3)}),
    "resnet50": (_port.port_resnet, {"stage_sizes": (3, 4, 6, 3)}),
    "vgg16": (_port.port_vgg, {}),
    "vgg19": (_port.port_vgg, {}),
    "vit_b16": (_port.port_vit, {}),
    "vit_s16": (_port.port_vit, {}),
    "convnext_tiny": (_port.port_convnext, {"depths": (3, 3, 9, 3)}),
    "convnext_base": (_port.port_convnext, {"depths": (3, 3, 27, 3)}),
    "efficientnetv2_s": (_port.port_efficientnetv2, {}),
    "swin_tiny": (_port.port_swin, {"depths": (2, 2, 6, 2)}),
    "swin_base": (_port.port_swin, {"depths": (2, 2, 18, 2)}),
    "inception_v3": (_port.port_inception, {}),
}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``state_dict`` file into a name->numpy mapping.

    Accepts ``.pth``/``.pt``/``.bin`` (``torch.save`` of a state_dict or
    of a dict holding one under 'state_dict'/'model') or an ``.npz``
    holding the same torch-named arrays.
    """
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict mapping")
    for nested in ("state_dict", "model"):
        if nested in obj and isinstance(obj[nested], dict) and any(
                hasattr(v, "numpy") for v in obj[nested].values()):
            obj = obj[nested]
            break
    return {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in obj.items()}


def port_state_dict(victim: str, sd: Mapping[str, np.ndarray]) -> Dict:
    """Port a torch state_dict to Flax variables for zoo victim ``victim``."""
    try:
        porter, kwargs = PORTERS[victim]
    except KeyError:
        raise ValueError(
            f"no state_dict porter for victim {victim!r}; "
            f"choices: {sorted(PORTERS)}")
    return porter(sd, **kwargs)
