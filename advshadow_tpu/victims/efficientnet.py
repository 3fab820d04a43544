"""EfficientNetV2 victim classifiers (Flax linen, NHWC).

torchvision-layout EfficientNetV2-S (Fused-MBConv early stages, MBConv
with squeeze-excitation later, BN+SiLU throughout, 1280-d head) for the
ASR zoo row (ref: ASR_fast.py:59-65).  Inference-only.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
from flax import linen as nn

__all__ = ["EfficientNetV2", "efficientnetv2_s"]


def _bn(name):
    return nn.BatchNorm(use_running_average=True, momentum=0.9,
                        epsilon=1e-3, name=name)


class _SE(nn.Module):
    in_ch: int
    se_ch: int

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_ch, (1, 1), name="fc1")(s)
        s = nn.silu(s)
        s = nn.Conv(self.in_ch, (1, 1), name="fc2")(s)
        return x * nn.sigmoid(s)


class _FusedMBConv(nn.Module):
    out_ch: int
    expand: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        h = x
        if self.expand != 1:
            h = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                        padding=self.kernel // 2, use_bias=False,
                        name="expand_conv")(h)
            h = nn.silu(_bn("expand_bn")(h))
            h = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                        name="project_conv")(h)
            h = _bn("project_bn")(h)
        else:
            h = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                        strides=self.stride, padding=self.kernel // 2,
                        use_bias=False, name="project_conv")(h)
            h = nn.silu(_bn("project_bn")(h))
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class _MBConv(nn.Module):
    out_ch: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        h = nn.Conv(mid, (1, 1), use_bias=False, name="expand_conv")(x)
        h = nn.silu(_bn("expand_bn")(h))
        h = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                    padding=self.kernel // 2, feature_group_count=mid,
                    use_bias=False, name="dw_conv")(h)
        h = nn.silu(_bn("dw_bn")(h))
        h = _SE(mid, max(1, int(in_ch * self.se_ratio)), name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                    name="project_conv")(h)
        h = _bn("project_bn")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class _StageCfg(NamedTuple):
    block: str      # "fused" | "mb"
    expand: int
    kernel: int
    stride: int
    channels: int
    layers: int


_V2_S = (
    _StageCfg("fused", 1, 3, 1, 24, 2),
    _StageCfg("fused", 4, 3, 2, 48, 4),
    _StageCfg("fused", 4, 3, 2, 64, 4),
    _StageCfg("mb", 4, 3, 2, 128, 6),
    _StageCfg("mb", 6, 3, 1, 160, 9),
    _StageCfg("mb", 6, 3, 2, 256, 15),
)


class EfficientNetV2(nn.Module):
    stages: Sequence[_StageCfg] = _V2_S
    stem_ch: int = 24
    head_ch: int = 1280
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.stem_ch, (3, 3), strides=2, padding=1,
                    use_bias=False, name="stem_conv")(x)
        h = nn.silu(_bn("stem_bn")(h))
        for si, cfg in enumerate(self.stages):
            for li in range(cfg.layers):
                stride = cfg.stride if li == 0 else 1
                cls = _FusedMBConv if cfg.block == "fused" else _MBConv
                h = cls(cfg.channels, cfg.expand, cfg.kernel, stride,
                        name=f"stage{si}_block{li}")(h)
        h = nn.Conv(self.head_ch, (1, 1), use_bias=False, name="head_conv")(h)
        h = nn.silu(_bn("head_bn")(h))
        h = h.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="classifier")(h)


efficientnetv2_s = partial(EfficientNetV2, _V2_S)
