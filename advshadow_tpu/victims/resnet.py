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


class _StemConv(nn.Module):
    """torchvision conv7x7/s2/p3 stem, executed as a space-to-depth conv.

    Parameter tree is identical to the ``nn.Conv`` it replaces (one
    ``kernel`` of shape (7, 7, 3, features), no bias), so ported torch
    weights and existing checkpoints load unchanged.  A stride-2 conv on
    a 3-channel input is the chip's worst case — 3 of 128 input lanes
    live, and its *input gradient* (the attack differentiates through
    the victim to the pixels) is a base-dilated transposed conv the
    profile shows HBM-bound at 30 GiB/s under 42x lane padding (26% of
    single-224's device time, benchmarks/profile_attack.py).  Rewriting
    input and kernel through a 2x2 space-to-depth —

      x[2i+dy, 2j+dx, c]        -> xs[i, j, (dy*2+dx)*3 + c]
      k[2m+dy+3, 2n+dx+3, c, f] -> ks[m+2, n+2, (dy*2+dx)*3 + c, f]

    — turns it into an algebraically-identical 4x4 *stride-1* conv on 12
    channels (the (m, dy)=(-2, 0) slot is zero-padded): 4x the live
    lanes, and the backward pass becomes a plain conv instead of a
    dilated scatter.  This is the standard XLA-TPU space-to-depth ResNet
    transform, done at the model level where it also covers the custom
    gradient path.  Falls back to the direct conv for odd spatial sizes
    and for small inputs: measured on v5e, s2d wins at 224 px
    (single-224 108->96 ms/img) but loses at 64 px (batch64 suite
    63.5->53.5 imgs/s — the input reshuffle is HBM time the small conv
    never pays back).  It engages at >= 160 px only: 224 is the only
    size with a measured win, and at the 128 px flagship the stem is a
    negligible share of the shadow-train step, so the conservative gate
    keeps that path on the long-validated direct conv.
    """

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, self.features))
        B, H, W, C = x.shape
        dn = ("NHWC", "HWIO", "NHWC")
        kernel = kernel.astype(x.dtype)
        if H % 2 or W % 2 or min(H, W) < 160:
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn)
        xs = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(
            0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        kpad = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        ks = kpad.reshape(4, 2, 4, 2, C, self.features).transpose(
            0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, self.features)
        return jax.lax.conv_general_dilated(
            xs, ks, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn)


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
        h = _StemConv(64, name="conv1")(x)
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
