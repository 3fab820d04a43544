"""ResNet victim classifiers (Flax linen, NHWC).

torchvision-compatible structure (conv7x7/s2 stem, BN, maxpool, 4 stages,
global avg pool, fc) so that torchvision/fastai checkpoint weights port
1:1 via :mod:`advshadow_tpu.victims.port`.  The reference's victim zoo
includes resnet18 (fastai), resnet50 (torchvision/timm)
(ref: ASR_fast.py:16-88, ddim2/diff_model2.py:19-44).

BatchNorm runs with stored running statistics (inference semantics) — the
victims are frozen classifiers that the attack differentiates *through*
w.r.t. the input, never trains.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Type

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ResNet", "resnet18", "resnet34", "resnet50"]


def _bn(name: str):
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                        name=name)


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        h = nn.Conv(self.channels, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        h = _bn("bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = _bn("bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.channels:
            identity = nn.Conv(self.channels, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            identity = _bn("downsample_bn")(identity)
        return nn.relu(h + identity)


class Bottleneck(nn.Module):
    channels: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.channels * self.expansion
        identity = x
        h = nn.Conv(self.channels, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(_bn("bn1")(h))
        h = nn.Conv(self.channels, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2")(h)
        h = nn.relu(_bn("bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h)
        h = _bn("bn3")(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            identity = _bn("downsample_bn")(identity)
        return nn.relu(h + identity)


class ResNet(nn.Module):
    block: Type[nn.Module]
    stage_sizes: Sequence[int]
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: jax.Array, return_features: bool = False,
                 feature_offset: jax.Array | None = None,
                 return_pyramid: bool = False):
        """Classify; with ``return_features`` also return the final conv
        feature map (the reference's Grad-CAM target ``layer4[-1]``,
        ref: ddim2/grad-cam.py:21-22).  ``feature_offset`` is added to the
        feature map before the head — a probe input that lets Grad-CAM
        take exact gradients w.r.t. the intermediate activation
        (:mod:`advshadow_tpu.eval.gradcam`).  ``return_pyramid`` returns
        the (C2, C3, C4, C5) stage outputs instead (the FPN backbone
        interface for :mod:`advshadow_tpu.masks.maskrcnn`)."""
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        h = nn.relu(_bn("bn1")(h))
        # torch MaxPool2d(3, 2, 1): padded max_pool (pads with -inf);
        # an explicit jnp.pad(-inf) + VALID pool crashes the TPU fusion
        # emitter in the backward pass (negative window padding).
        h = nn.max_pool(h, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        pyramid = []
        for stage, num_blocks in enumerate(self.stage_sizes):
            channels = 64 * (2**stage)
            for i in range(num_blocks):
                stride = 2 if stage > 0 and i == 0 else 1
                h = self.block(channels, stride,
                               name=f"layer{stage + 1}_{i}")(h)
            pyramid.append(h)
        if return_pyramid:
            return tuple(pyramid)
        if feature_offset is not None:
            h = h + feature_offset
        features = h
        h = jnp.mean(h, axis=(1, 2))
        logits = nn.Dense(self.num_classes, name="fc")(h)
        if return_features:
            return logits, features
        return logits


resnet18 = partial(ResNet, BasicBlock, (2, 2, 2, 2))
resnet34 = partial(ResNet, BasicBlock, (3, 4, 6, 3))
resnet50 = partial(ResNet, Bottleneck, (3, 4, 6, 3))
