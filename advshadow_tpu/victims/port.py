"""PyTorch -> Flax weight porting for the victim zoo.

Converts torchvision/timm/fastai ``state_dict`` tensors into the param
trees of :mod:`advshadow_tpu.victims` models (ref victims loaded at
ASR_fast.py:16-88, test.py:38-107).  Conventions:

- Conv2d weight [O, I, kh, kw] -> [kh, kw, I, O]
- Linear weight [O, I] -> [I, O]
- BatchNorm weight/bias -> scale/bias; running stats -> batch_stats

Host-side, numpy-only (accepts any mapping of name -> array; call
``{k: v.numpy() for k, v in sd.items()}`` on a torch state_dict first,
keeping torch out of the framework's import graph).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

__all__ = ["convert_conv", "convert_linear", "port_resnet", "port_vgg"]

Array = np.ndarray


def convert_conv(w: Array) -> Array:
    """[O, I, kh, kw] -> [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_linear(w: Array) -> Array:
    """[O, I] -> [I, O]."""
    return np.transpose(w)


def _bn(sd: Mapping[str, Array], prefix: str):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def port_resnet(
    sd: Mapping[str, Array], stage_sizes=(2, 2, 2, 2)
) -> Dict[str, Dict]:
    """torchvision ResNet state_dict -> {'params': ..., 'batch_stats': ...}
    for :class:`advshadow_tpu.victims.resnet.ResNet`."""
    params: Dict = {}
    stats: Dict = {}

    params["conv1"] = {"kernel": convert_conv(np.asarray(sd["conv1.weight"]))}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    for stage, num_blocks in enumerate(stage_sizes):
        for i in range(num_blocks):
            t = f"layer{stage + 1}.{i}"
            f = f"layer{stage + 1}_{i}"
            block_p: Dict = {}
            block_s: Dict = {}
            for j in (1, 2, 3):
                if f"{t}.conv{j}.weight" not in sd:
                    continue
                block_p[f"conv{j}"] = {
                    "kernel": convert_conv(np.asarray(sd[f"{t}.conv{j}.weight"]))
                }
                block_p[f"bn{j}"], block_s[f"bn{j}"] = _bn(sd, f"{t}.bn{j}")
            if f"{t}.downsample.0.weight" in sd:
                block_p["downsample_conv"] = {
                    "kernel": convert_conv(np.asarray(sd[f"{t}.downsample.0.weight"]))
                }
                block_p["downsample_bn"], block_s["downsample_bn"] = _bn(
                    sd, f"{t}.downsample.1")
            params[f] = block_p
            stats[f] = block_s

    params["fc"] = {"kernel": convert_linear(np.asarray(sd["fc.weight"])),
                    "bias": np.asarray(sd["fc.bias"])}
    return {"params": params, "batch_stats": stats}


def port_vgg(sd: Mapping[str, Array]) -> Dict[str, Dict]:
    """torchvision VGG state_dict -> params for
    :class:`advshadow_tpu.victims.vgg.VGG` (features.N conv layers in
    order, classifier.{0,3,6} FCs)."""
    params: Dict = {}
    conv_keys = sorted(
        (k for k in sd if k.startswith("features.") and k.endswith(".weight")),
        key=lambda k: int(k.split(".")[1]),
    )
    for idx, k in enumerate(conv_keys):
        base = k[: -len(".weight")]
        params[f"conv{idx}"] = {
            "kernel": convert_conv(np.asarray(sd[k])),
            "bias": np.asarray(sd[f"{base}.bias"]),
        }
    for flax_name, torch_idx in (("fc1", 0), ("fc2", 3), ("fc3", 6)):
        params[flax_name] = {
            "kernel": convert_linear(np.asarray(sd[f"classifier.{torch_idx}.weight"])),
            "bias": np.asarray(sd[f"classifier.{torch_idx}.bias"]),
        }
    return {"params": params}
