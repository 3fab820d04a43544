"""CSPDark UNet — YOLO-style conditional denoiser (Flax/NHWC).

Re-design of ref: model/networks/cspdarkunet.py:17-115: 4-level
CSP-darknet UNet with SelfAttention after every scale change and the same
time+label conditioning interface as :class:`advshadow_tpu.models.unet_cond.UNet`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from advshadow_tpu.models.attention import SelfAttention
from advshadow_tpu.models.blocks import BaseConv, CSPDarkDownBlock, CSPDarkUpBlock
from advshadow_tpu.models.unet_cond import _CondNet, _DEFAULT_CHANNELS

__all__ = ["CSPDarkUnet"]


class CSPDarkUnet(_CondNet):
    out_channel: int = 3
    channel: Sequence[int] = _DEFAULT_CHANNELS
    act: str = "silu"
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time: jax.Array,
        y: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        del train
        c = list(self.channel)
        temb = self.cond_embedding(time, y, x.shape[0])

        sa = lambda name: SelfAttention(
            act=self.act, use_pallas=self.use_pallas, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        down = lambda ch, n, name: CSPDarkDownBlock(
            ch, n=n, act=self.act, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        up = lambda ch, n, name: CSPDarkUpBlock(
            ch, n=n, act=self.act, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)

        x1 = BaseConv(c[0], 1, 1, act=self.act, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="inc")(x)
        x2 = sa("sa1")(down(c[1], 1, "down1")(x1, temb))
        x3 = sa("sa2")(down(c[2], 3, "down2")(x2, temb))
        x4 = sa("sa3")(down(c[3], 3, "down3")(x3, temb))
        x5 = sa("sa4")(down(c[4], 1, "down4")(x4, temb))

        h = sa("sa5")(up(c[3], 3, "up1")(x5, x4, temb))
        h = sa("sa6")(up(c[2], 3, "up2")(h, x3, temb))
        h = sa("sa7")(up(c[1], 3, "up3")(h, x2, temb))
        h = sa("sa8")(up(c[0], 3, "up4")(h, x1, temb))
        return nn.Conv(self.out_channel, (1, 1), param_dtype=self.param_dtype,
                       name="outc")(h.astype(jnp.float32))
