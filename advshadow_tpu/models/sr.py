"""SRv1 super-resolution network (RDN-style), Flax/NHWC.

Re-design of ref: model/networks/sr/srv1.py:14-83: initial feature
extraction, three ResidualDenseBlock back-projection stages, global
feature fusion, PixelShuffle x``scale`` upsampling, reconstruction conv.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from advshadow_tpu.models.blocks import ResidualDenseBlock
from advshadow_tpu.ops.image import pixel_shuffle

__all__ = ["SRv1"]


class SRv1(nn.Module):
    out_channel: int = 3
    channel: Sequence[int] = (64,)
    n: int = 6
    scale: int = 4
    act: str = "silu"
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c0 = self.channel[0]
        conv = lambda ch, k, name: nn.Conv(
            ch, (k, k), padding=k // 2, param_dtype=self.param_dtype, name=name)

        out1 = conv(c0, 3, "conv1")(x)
        out2 = conv(c0, 1, "conv2")(out1)

        rdb = lambda name: ResidualDenseBlock(
            c0 // 2, n=self.n, act=self.act, param_dtype=self.param_dtype,
            name=name)
        s1 = rdb("stage1")(out2)
        s2 = rdb("stage2")(s1)
        s3 = rdb("stage3")(s2)
        s = jnp.concatenate([s1, s2, s3], axis=-1)

        gf = conv(c0, 1, "gff1")(s)
        gf = conv(c0, 3, "gff2")(gf)

        up = conv(c0 * self.scale * self.scale, 3, "up_conv")(out1 + gf)
        up = pixel_shuffle(up, self.scale)
        return conv(self.out_channel, 3, "conv3")(up)
