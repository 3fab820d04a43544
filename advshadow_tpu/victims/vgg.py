"""VGG victim classifiers (Flax linen, NHWC).

torchvision-layout VGG16/19 (conv stacks + maxpool, 3 FC layers with the
4096-4096-classes head) for the ASR zoo (ref: ASR_fast.py:33-46).
Inference-only (dropout off).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
from flax import linen as nn

__all__ = ["VGG", "vgg16", "vgg19"]

_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")
_VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M")


class VGG(nn.Module):
    cfg: Sequence
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv_idx = 0
        for item in self.cfg:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(item, (3, 3), padding=1,
                            name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
        # torch flattens NCHW (C, H, W); transpose for weight-port parity
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="fc1")(x))
        x = nn.relu(nn.Dense(4096, name="fc2")(x))
        return nn.Dense(self.num_classes, name="fc3")(x)


vgg16 = partial(VGG, _VGG16_CFG)
vgg19 = partial(VGG, _VGG19_CFG)
