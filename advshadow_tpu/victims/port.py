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

from typing import Dict, Mapping

import numpy as np

__all__ = ["convert_conv", "convert_linear", "port_resnet", "port_vgg",
           "port_generic", "port_inception", "port_vit", "port_convnext",
           "port_efficientnetv2", "port_swin", "port_maskrcnn"]

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


def _nest(tree: Dict, path, leaf_key: str, value: Array) -> None:
    node = tree
    for part in path:
        node = node.setdefault(part, {})
    node[leaf_key] = value


def port_generic(
    sd: Mapping[str, Array],
    rename=None,
) -> Dict[str, Dict]:
    """Generic torch state_dict -> flax variables converter.

    Works for any flax model whose module names mirror the torch dotted
    paths (this framework's InceptionV3 does exactly that). Rules:
    - a prefix with ``running_mean`` is a BatchNorm: weight/bias ->
      scale/bias params, running stats -> batch_stats;
    - 4-D ``weight`` -> conv kernel [O,I,kh,kw] -> [kh,kw,I,O];
    - 2-D ``weight`` -> dense kernel transposed;
    - 1-D ``weight`` (no running stats) -> LayerNorm scale;
    - ``bias`` -> bias.
    ``rename`` optionally maps each torch path segment list to the flax
    one (e.g. 'layer1.0' -> 'layer1_0').
    """
    params: Dict = {}
    stats: Dict = {}
    bn_prefixes = {
        k[: -len(".running_mean")] for k in sd if k.endswith(".running_mean")
    }

    for key, raw in sd.items():
        if key.endswith(("num_batches_tracked",)):
            continue
        value = np.asarray(raw)
        parts = key.split(".")
        prefix, leaf = ".".join(parts[:-1]), parts[-1]
        path = rename(parts[:-1]) if rename else parts[:-1]
        if prefix in bn_prefixes:
            if leaf == "weight":
                _nest(params, path, "scale", value)
            elif leaf == "bias":
                _nest(params, path, "bias", value)
            elif leaf == "running_mean":
                _nest(stats, path, "mean", value)
            elif leaf == "running_var":
                _nest(stats, path, "var", value)
            continue
        if leaf == "weight":
            if value.ndim == 4:
                _nest(params, path, "kernel", convert_conv(value))
            elif value.ndim == 2:
                _nest(params, path, "kernel", convert_linear(value))
            else:
                _nest(params, path, "scale", value)  # LayerNorm
        elif leaf == "bias":
            _nest(params, path, "bias", value)
        else:
            _nest(params, path, leaf, value)
    out: Dict[str, Dict] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def port_inception(sd: Mapping[str, Array]) -> Dict[str, Dict]:
    """torchvision inception_v3 -> :class:`...victims.inception.InceptionV3`
    (module names already mirror torchvision; aux-logits keys dropped)."""
    filtered = {k: v for k, v in sd.items() if not k.startswith("AuxLogits")}
    return port_generic(filtered)


def port_vit(sd: Mapping[str, Array]) -> Dict[str, Dict]:
    """timm ViT state_dict -> :class:`...victims.vit.ViT`.

    timm names: patch_embed.proj, cls_token, pos_embed,
    blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}, norm, head.
    The fused qkv splits into flax MultiHeadDotProductAttention's
    query/key/value projections with [in, heads, head_dim] kernels.
    """
    params: Dict = {}
    params["patch_embed"] = {
        "kernel": convert_conv(np.asarray(sd["patch_embed.proj.weight"])),
        "bias": np.asarray(sd["patch_embed.proj.bias"]),
    }
    params["cls_token"] = np.asarray(sd["cls_token"])
    params["pos_embed"] = np.asarray(sd["pos_embed"])

    n_blocks = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    hidden = params["cls_token"].shape[-1]
    # infer head count from the model the params feed; caller reshapes via
    # flax's [in, heads, head_dim] convention:
    for i in range(n_blocks):
        t = f"blocks.{i}"
        blk: Dict = {
            "ln1": {"scale": np.asarray(sd[f"{t}.norm1.weight"]),
                    "bias": np.asarray(sd[f"{t}.norm1.bias"])},
            "ln2": {"scale": np.asarray(sd[f"{t}.norm2.weight"]),
                    "bias": np.asarray(sd[f"{t}.norm2.bias"])},
            "mlp1": {"kernel": convert_linear(np.asarray(sd[f"{t}.mlp.fc1.weight"])),
                     "bias": np.asarray(sd[f"{t}.mlp.fc1.bias"])},
            "mlp2": {"kernel": convert_linear(np.asarray(sd[f"{t}.mlp.fc2.weight"])),
                     "bias": np.asarray(sd[f"{t}.mlp.fc2.bias"])},
        }
        qkv_w = np.asarray(sd[f"{t}.attn.qkv.weight"])  # [3H, H]
        qkv_b = np.asarray(sd[f"{t}.attn.qkv.bias"])
        wq, wk, wv = np.split(qkv_w, 3, axis=0)
        bq, bk, bv = np.split(qkv_b, 3, axis=0)
        blk["attn"] = {
            "query": _mha_in_proj(wq, bq, hidden),
            "key": _mha_in_proj(wk, bk, hidden),
            "value": _mha_in_proj(wv, bv, hidden),
            "out": _mha_out_proj(
                np.asarray(sd[f"{t}.attn.proj.weight"]),
                np.asarray(sd[f"{t}.attn.proj.bias"]), hidden),
        }
        params[f"block{i}"] = blk
    params["ln"] = {"scale": np.asarray(sd["norm.weight"]),
                    "bias": np.asarray(sd["norm.bias"])}
    params["head"] = {"kernel": convert_linear(np.asarray(sd["head.weight"])),
                      "bias": np.asarray(sd["head.bias"])}
    return {"params": params}


def _infer_heads(hidden: int) -> int:
    # 64-dim heads is the ViT convention (768->12, 384->6)
    return max(hidden // 64, 1)


def _mha_in_proj(w: Array, b: Array, hidden: int) -> Dict[str, Array]:
    heads = _infer_heads(hidden)
    head_dim = hidden // heads
    kernel = convert_linear(w).reshape(hidden, heads, head_dim)
    return {"kernel": kernel, "bias": b.reshape(heads, head_dim)}


def _mha_out_proj(w: Array, b: Array, hidden: int) -> Dict[str, Array]:
    heads = _infer_heads(hidden)
    head_dim = hidden // heads
    kernel = convert_linear(w).reshape(heads, head_dim, hidden)
    return {"kernel": kernel, "bias": b}


def port_convnext(sd: Mapping[str, Array],
                  depths=(3, 3, 9, 3)) -> Dict[str, Dict]:
    """timm ConvNeXt state_dict -> :class:`...victims.convnext.ConvNeXt`.

    timm names: stem.0 (4x4 conv) / stem.1 (LN);
    stages.S.downsample.{0 LN, 1 conv} for S>0;
    stages.S.blocks.B.{conv_dw, norm, mlp.fc1, mlp.fc2, gamma};
    head.norm / head.fc.
    """
    params: Dict = {}
    params["stem_conv"] = {
        "kernel": convert_conv(np.asarray(sd["stem.0.weight"])),
        "bias": np.asarray(sd["stem.0.bias"]),
    }
    params["stem_norm"] = {"scale": np.asarray(sd["stem.1.weight"]),
                           "bias": np.asarray(sd["stem.1.bias"])}
    for s, depth in enumerate(depths):
        if s > 0:
            params[f"downsample{s}_norm"] = {
                "scale": np.asarray(sd[f"stages.{s}.downsample.0.weight"]),
                "bias": np.asarray(sd[f"stages.{s}.downsample.0.bias"]),
            }
            params[f"downsample{s}_conv"] = {
                "kernel": convert_conv(
                    np.asarray(sd[f"stages.{s}.downsample.1.weight"])),
                "bias": np.asarray(sd[f"stages.{s}.downsample.1.bias"]),
            }
        for b in range(depth):
            t = f"stages.{s}.blocks.{b}"
            params[f"stage{s}_block{b}"] = {
                "dwconv": {
                    "kernel": convert_conv(np.asarray(sd[f"{t}.conv_dw.weight"])),
                    "bias": np.asarray(sd[f"{t}.conv_dw.bias"]),
                },
                "norm": {"scale": np.asarray(sd[f"{t}.norm.weight"]),
                         "bias": np.asarray(sd[f"{t}.norm.bias"])},
                "pwconv1": {
                    "kernel": convert_linear(np.asarray(sd[f"{t}.mlp.fc1.weight"])),
                    "bias": np.asarray(sd[f"{t}.mlp.fc1.bias"]),
                },
                "pwconv2": {
                    "kernel": convert_linear(np.asarray(sd[f"{t}.mlp.fc2.weight"])),
                    "bias": np.asarray(sd[f"{t}.mlp.fc2.bias"]),
                },
                "gamma": np.asarray(sd[f"{t}.gamma"]),
            }
    params["head_norm"] = {"scale": np.asarray(sd["head.norm.weight"]),
                           "bias": np.asarray(sd["head.norm.bias"])}
    params["head"] = {"kernel": convert_linear(np.asarray(sd["head.fc.weight"])),
                      "bias": np.asarray(sd["head.fc.bias"])}
    return {"params": params}


def port_efficientnetv2(sd: Mapping[str, Array], stages=None) -> Dict[str, Dict]:
    """torchvision efficientnet_v2_* state_dict ->
    :class:`...victims.efficientnet.EfficientNetV2`.

    torchvision layout: features.0 stem Conv2dNormActivation; features.1..S
    stages of FusedMBConv/MBConv blocks (``block.N`` sublayers:
    fused = [expand?, project]; mb = [expand, dw, SE, project]);
    features.S+1 head conv; classifier.1 Linear.
    ``stages``: sequence of (block_kind, expand, layers) — defaults to V2-S.
    """
    if stages is None:
        stages = (("fused", 1, 2), ("fused", 4, 4), ("fused", 4, 4),
                  ("mb", 4, 6), ("mb", 6, 9), ("mb", 6, 15))
    params: Dict = {}
    stats: Dict = {}

    def cna(prefix):  # Conv2dNormActivation -> (conv kernel, bn params/stats)
        conv = {"kernel": convert_conv(np.asarray(sd[f"{prefix}.0.weight"]))}
        bn = {"scale": np.asarray(sd[f"{prefix}.1.weight"]),
              "bias": np.asarray(sd[f"{prefix}.1.bias"])}
        st = {"mean": np.asarray(sd[f"{prefix}.1.running_mean"]),
              "var": np.asarray(sd[f"{prefix}.1.running_var"])}
        return conv, bn, st

    params["stem_conv"], params["stem_bn"], stats["stem_bn"] = cna("features.0")

    for si, (kind, expand, layers) in enumerate(stages):
        for li in range(layers):
            t = f"features.{si + 1}.{li}.block"
            name = f"stage{si}_block{li}"
            bp: Dict = {}
            bs: Dict = {}
            if kind == "fused":
                if expand != 1:
                    bp["expand_conv"], bp["expand_bn"], bs["expand_bn"] = \
                        cna(f"{t}.0")
                    bp["project_conv"], bp["project_bn"], bs["project_bn"] = \
                        cna(f"{t}.1")
                else:
                    bp["project_conv"], bp["project_bn"], bs["project_bn"] = \
                        cna(f"{t}.0")
            else:
                bp["expand_conv"], bp["expand_bn"], bs["expand_bn"] = \
                    cna(f"{t}.0")
                bp["dw_conv"], bp["dw_bn"], bs["dw_bn"] = cna(f"{t}.1")
                bp["se"] = {
                    "fc1": {"kernel": convert_conv(np.asarray(sd[f"{t}.2.fc1.weight"])),
                            "bias": np.asarray(sd[f"{t}.2.fc1.bias"])},
                    "fc2": {"kernel": convert_conv(np.asarray(sd[f"{t}.2.fc2.weight"])),
                            "bias": np.asarray(sd[f"{t}.2.fc2.bias"])},
                }
                bp["project_conv"], bp["project_bn"], bs["project_bn"] = \
                    cna(f"{t}.3")
            params[name] = bp
            stats[name] = bs

    head_ix = len(stages) + 1
    params["head_conv"], params["head_bn"], stats["head_bn"] = \
        cna(f"features.{head_ix}")
    params["classifier"] = {
        "kernel": convert_linear(np.asarray(sd["classifier.1.weight"])),
        "bias": np.asarray(sd["classifier.1.bias"]),
    }
    return {"params": params, "batch_stats": stats}


def port_swin(sd: Mapping[str, Array],
              depths=(2, 2, 6, 2)) -> Dict[str, Dict]:
    """timm Swin state_dict -> :class:`...victims.swin.SwinTransformer`.

    timm layout: patch_embed.{proj,norm}; layers.S.blocks.B.{norm1,
    attn.{qkv,proj,relative_position_bias_table}, norm2, mlp.fc1/fc2};
    layers.S.downsample.{reduction,norm}; norm; head(.fc).
    (relative_position_index buffers are recomputed, not ported.)
    """
    def ln(prefix):
        return {"scale": np.asarray(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"])}

    def dense(prefix, bias=True):
        out = {"kernel": convert_linear(np.asarray(sd[f"{prefix}.weight"]))}
        if bias and f"{prefix}.bias" in sd:
            out["bias"] = np.asarray(sd[f"{prefix}.bias"])
        return out

    params: Dict = {}
    params["patch_embed"] = {
        "kernel": convert_conv(np.asarray(sd["patch_embed.proj.weight"])),
        "bias": np.asarray(sd["patch_embed.proj.bias"]),
    }
    params["patch_norm"] = ln("patch_embed.norm")
    for s, depth in enumerate(depths):
        for b in range(depth):
            t = f"layers.{s}.blocks.{b}"
            params[f"stage{s}_block{b}"] = {
                "norm1": ln(f"{t}.norm1"),
                "norm2": ln(f"{t}.norm2"),
                "attn": {
                    "qkv": dense(f"{t}.attn.qkv"),
                    "proj": dense(f"{t}.attn.proj"),
                    "relative_position_bias_table": np.asarray(
                        sd[f"{t}.attn.relative_position_bias_table"]),
                },
                "mlp1": dense(f"{t}.mlp.fc1"),
                "mlp2": dense(f"{t}.mlp.fc2"),
            }
        if s < len(depths) - 1 and f"layers.{s}.downsample.norm.weight" in sd:
            params[f"downsample{s}"] = {
                "norm": ln(f"layers.{s}.downsample.norm"),
                "reduction": dense(f"layers.{s}.downsample.reduction",
                                   bias=False),
            }
    params["norm"] = ln("norm")
    head_key = "head.fc" if "head.fc.weight" in sd else "head"
    params["head"] = dense(head_key)
    return {"params": params}


def port_maskrcnn(sd: Mapping[str, Array],
                  stage_sizes=(3, 4, 6, 3)) -> Dict[str, Dict]:
    """torchvision ``maskrcnn_resnet50_fpn`` state_dict ->
    :class:`advshadow_tpu.masks.maskrcnn.MaskRCNN` variables.

    Handles both torchvision naming eras (plain conv ``inner_blocks.N`` /
    ``rpn.head.conv`` vs Conv2dNormActivation-wrapped ``...N.0``).
    """
    def get(*names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n])
        raise KeyError(names[0])

    def conv(prefix_options, bias=True):
        w = get(*[f"{p}.weight" for p in prefix_options])
        out = {"kernel": convert_conv(w)}
        if bias:
            try:
                out["bias"] = get(*[f"{p}.bias" for p in prefix_options])
            except KeyError:
                pass
        return out

    # backbone resnet (reuse the resnet porter on the body.* sub-dict)
    body_sd = {k[len("backbone.body."):]: v for k, v in sd.items()
               if k.startswith("backbone.body.")}
    # torchvision detection resnet has no fc head; add dummies for the
    # porter then drop them
    body_sd.setdefault("fc.weight", np.zeros((1, 2048), np.float32))
    body_sd.setdefault("fc.bias", np.zeros((1,), np.float32))
    body = port_resnet(body_sd, stage_sizes=stage_sizes)
    body["params"].pop("fc")

    params: Dict = {"body": body["params"]}
    stats: Dict = {"body": body["batch_stats"]}

    fpn: Dict = {}
    for i in range(4):
        fpn[f"inner{i}"] = conv((f"backbone.fpn.inner_blocks.{i}.0",
                                 f"backbone.fpn.inner_blocks.{i}"))
        fpn[f"layer{i}"] = conv((f"backbone.fpn.layer_blocks.{i}.0",
                                 f"backbone.fpn.layer_blocks.{i}"))
    params["fpn"] = fpn

    params["rpn_head"] = {
        "conv": conv(("rpn.head.conv.0.0", "rpn.head.conv")),
        "cls_logits": conv(("rpn.head.cls_logits",)),
        "bbox_pred": conv(("rpn.head.bbox_pred",)),
    }
    params["box_head"] = {
        "fc6": {"kernel": convert_linear(get("roi_heads.box_head.fc6.weight")),
                "bias": get("roi_heads.box_head.fc6.bias")},
        "fc7": {"kernel": convert_linear(get("roi_heads.box_head.fc7.weight")),
                "bias": get("roi_heads.box_head.fc7.bias")},
        "cls_score": {
            "kernel": convert_linear(get("roi_heads.box_predictor.cls_score.weight")),
            "bias": get("roi_heads.box_predictor.cls_score.bias")},
        "bbox_pred": {
            "kernel": convert_linear(get("roi_heads.box_predictor.bbox_pred.weight")),
            "bias": get("roi_heads.box_predictor.bbox_pred.bias")},
    }
    mask_head: Dict = {}
    for i in range(1, 5):
        mask_head[f"mask_fcn{i}"] = conv(
            (f"roi_heads.mask_head.mask_fcn{i}.0",
             f"roi_heads.mask_head.mask_fcn{i}"))
    # ConvTranspose: torch [in, out, kh, kw] -> flax [kh, kw, in, out]
    w = get("roi_heads.mask_predictor.conv5_mask.weight")
    mask_head["conv5_mask"] = {
        "kernel": np.transpose(w, (2, 3, 0, 1)),
        "bias": get("roi_heads.mask_predictor.conv5_mask.bias"),
    }
    mask_head["mask_fcn_logits"] = conv(
        ("roi_heads.mask_predictor.mask_fcn_logits",))
    params["mask_head"] = mask_head
    return {"params": params, "batch_stats": stats}
