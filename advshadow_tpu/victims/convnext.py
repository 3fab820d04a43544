"""ConvNeXt victim classifiers (Flax linen, NHWC).

timm/torchvision-layout ConvNeXt (stem 4x4/s4 + LN, stages of
dwconv7x7 -> LN -> 4x MLP -> layer-scale blocks, LN+Linear head) for the
ASR zoo's ``convnext_base.fb_in22k_ft_in1k`` row (ref: ASR_fast.py:22-26).
Inference-only (stochastic depth off).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
from flax import linen as nn

from advshadow_tpu.victims.vit import _PatchEmbed

__all__ = ["ConvNeXt", "convnext_tiny", "convnext_base"]


class _Block(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), padding=3,
                    feature_group_count=self.dim, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.constant(
            self.layer_scale_init), (self.dim,))
        return x + gamma * h


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # reshape+GEMM patchify (same param tree as the nn.Conv it
        # replaces; see victims/vit.py:_PatchEmbed for the MXU rationale)
        h = _PatchEmbed(self.dims[0], 4, flatten=False,
                        name="stem_conv")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(h)
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                h = nn.LayerNorm(epsilon=1e-6,
                                 name=f"downsample{stage}_norm")(h)
                h = nn.Conv(dim, (2, 2), strides=2,
                            name=f"downsample{stage}_conv")(h)
            for i in range(depth):
                h = _Block(dim, name=f"stage{stage}_block{i}")(h)
        h = h.mean(axis=(1, 2))
        h = nn.LayerNorm(epsilon=1e-6, name="head_norm")(h)
        return nn.Dense(self.num_classes, name="head")(h)


convnext_tiny = partial(ConvNeXt, (3, 3, 9, 3), (96, 192, 384, 768))
convnext_base = partial(ConvNeXt, (3, 3, 27, 3), (128, 256, 512, 1024))
