"""Victim zoo: registry, preprocessing, frozen-victim closures.

The working equivalent of the reference's scattered loaders
(ref: ASR_fast.py:16-88, test.py:38-107): each victim is a (model,
preprocessing, label-map) triple, exposed as a pure ``fn(images) ->
logits`` closure for the attack/eval code.  Images enter in [0, 1] NHWC
at the victim's native resolution; preprocessing (imagenet
normalization) happens inside the closure so it is part of the
differentiated graph — input gradients are w.r.t. raw pixels, exactly
like the reference's transform-then-attack flow.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from advshadow_tpu.ops.image import resize
from advshadow_tpu.victims import convnext as _convnext
from advshadow_tpu.victims import efficientnet as _efficientnet
from advshadow_tpu.victims import inception as _inception
from advshadow_tpu.victims import resnet as _resnet
from advshadow_tpu.victims import swin as _swin
from advshadow_tpu.victims import vgg as _vgg
from advshadow_tpu.victims import vit as _vit

__all__ = ["VICTIMS", "make_victim_model", "make_victim_fn",
           "imagenet_normalize", "safe_argmax", "IMAGENET_MEAN",
           "IMAGENET_STD"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

#: name -> model factory (num_classes kwarg). Mirrors the reference zoo:
#: timm resnet50/convnext/swin, torchvision VGG16/19 + EfficientNetV2,
#: HF ViT/DINOv2 (vit_s16 covers the DINOv2-small geometry), fastai
#: resnet18, and InceptionV3 for FID (ASR_fast.py:16-88, fid_fast.py:11).
VICTIMS = {
    "resnet18": _resnet.resnet18,
    "resnet34": _resnet.resnet34,
    "resnet50": _resnet.resnet50,
    "vgg16": _vgg.vgg16,
    "vgg19": _vgg.vgg19,
    "vit_b16": _vit.vit_b16,
    "vit_s16": _vit.vit_s16,
    "convnext_tiny": _convnext.convnext_tiny,
    "convnext_base": _convnext.convnext_base,
    "efficientnetv2_s": _efficientnet.efficientnetv2_s,
    "swin_tiny": _swin.swin_tiny,
    "swin_base": _swin.swin_base,
    "inception_v3": _inception.inception_v3,
}


def safe_argmax(logits: jax.Array, axis: int = -1) -> jax.Array:
    """argmax with an optimization barrier: fusing an argmax reduce into a
    conv stack crashes this host's chipless TPU AOT compiler
    (fusion_emitter window.pad_low check); the barrier keeps the argmax in
    its own fusion at zero cost."""
    return jnp.argmax(jax.lax.optimization_barrier(logits), axis=axis)


def imagenet_normalize(x: jax.Array) -> jax.Array:
    """(x - mean) / std on [0,1] NHWC input."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def make_victim_model(name: str, num_classes: int = 37):
    try:
        factory = VICTIMS[name]
    except KeyError:
        raise ValueError(f"unknown victim {name!r}; choices: {sorted(VICTIMS)}")
    return factory(num_classes=num_classes)


def make_victim_fn(
    model,
    variables,
    input_size: Optional[int] = None,
    normalize: bool = True,
    compute_dtype=None,
) -> Callable[[jax.Array], jax.Array]:
    """Freeze a victim into ``fn(images[B,H,W,C] in [0,1]) -> logits``.

    Resizing to the victim's native resolution and imagenet normalization
    stay inside the closure (and therefore inside the attack's grad).

    ``compute_dtype=jnp.bfloat16`` runs the victim forward (and therefore
    the attack's backward) in bf16 — the MXU-native precision, ~2x the
    f32 ceiling on v5e.  Inputs are normalized in f32 first and logits
    are returned in f32; weight/activation rounding shifts logits by
    ~1e-2 relative, which leaves attack gradient directions intact (the
    IG/FGSM updates only consume gradient signs/normalized magnitudes).
    Default None keeps exact f32 for parity work.
    """
    if compute_dtype is not None:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            variables)

    def fn(x: jax.Array) -> jax.Array:
        if input_size is not None and (x.shape[1] != input_size
                                       or x.shape[2] != input_size):
            x = resize(x, input_size, input_size)
        if normalize:
            x = imagenet_normalize(x)
        if compute_dtype is not None:
            return model.apply(variables,
                               x.astype(compute_dtype)).astype(jnp.float32)
        return model.apply(variables, x)

    return fn
