"""Conditional UNet (the vendored framework's primary net), Flax/NHWC.

Re-design of ref: model/networks/unet.py:17-128 with the BaseNet
conditioning semantics (ref: model/networks/base.py:12-68): sinusoidal
position encoding of the timestep into ``time_channel`` dims (sin-first
ordering), plus an additive class-label embedding.  The CFG null label is
an extra embedding row (index ``num_classes``), selected by passing
``y=None`` or a negative label.

3-level UNet with SelfAttention after every scale change and a 3x
DoubleConv bottleneck; default channels [32, 64, 128, 256, 512, 1024].
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from advshadow_tpu.models.attention import SelfAttention
from advshadow_tpu.models.blocks import DoubleConv, DownBlock, UpBlock

__all__ = ["UNet", "base_pos_encoding"]

_DEFAULT_CHANNELS = (32, 64, 128, 256, 512, 1024)


def base_pos_encoding(t: jax.Array, channels: int) -> jax.Array:
    """BaseNet position encoding: sin first, then cos
    (ref: model/networks/base.py:56-68). [N] -> [N, channels]."""
    inv_freq = 1.0 / (
        10000.0 ** (jnp.arange(0, channels, 2, dtype=jnp.float32) / channels)
    )
    args = t.astype(jnp.float32)[:, None] * inv_freq[None]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class _CondNet(nn.Module):
    """Shared conditioning: pos-encode time, add label embedding."""

    time_channel: int = 256
    num_classes: Optional[int] = None
    dtype: jnp.dtype = None          # bf16 here = TPU-native AMP
    param_dtype: jnp.dtype = jnp.float32

    def cond_embedding(self, time: jax.Array, y: Optional[jax.Array],
                       batch: int) -> jax.Array:
        temb = base_pos_encoding(time, self.time_channel)
        if self.num_classes is not None:
            label_emb = nn.Embed(
                self.num_classes + 1, self.time_channel,
                param_dtype=self.param_dtype, name="label_embed",
            )
            if y is None:
                y_ix = jnp.full((batch,), self.num_classes, dtype=jnp.int32)
            else:
                y_ix = jnp.where(y < 0, self.num_classes, y).astype(jnp.int32)
            temb = temb + label_emb(y_ix)
        return temb


class UNet(_CondNet):
    """Conditional 3-level UNet (ref: model/networks/unet.py)."""

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
        del train  # no dropout in this family
        c = list(self.channel)
        temb = self.cond_embedding(time, y, x.shape[0])

        dc = lambda ch, name, **kw: DoubleConv(
            ch, act=self.act, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name, **kw)
        sa = lambda name: SelfAttention(
            act=self.act, use_pallas=self.use_pallas, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        down = lambda ch, name: DownBlock(
            ch, act=self.act, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        up = lambda ch, name: UpBlock(
            ch, act=self.act, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)

        x1 = dc(c[1], "inc")(x)
        x2 = down(c[2], "down1")(x1, temb)
        x2 = sa("sa1")(x2)
        x3 = down(c[3], "down2")(x2, temb)
        x3 = sa("sa2")(x3)
        x4 = down(c[3], "down3")(x3, temb)
        x4 = sa("sa3")(x4)

        b = dc(c[4], "bot1")(x4)
        b = dc(c[4], "bot2")(b)
        b = dc(c[3], "bot3")(b)

        h = up(c[2], "up1")(b, x3, temb)
        h = sa("sa4")(h)
        h = up(c[1], "up2")(h, x2, temb)
        h = sa("sa5")(h)
        h = up(c[1], "up3")(h, x1, temb)
        h = sa("sa6")(h)
        # final conv emits f32 (eps predictions feed f32 losses)
        return nn.Conv(self.out_channel, (1, 1), param_dtype=self.param_dtype,
                       name="outc")(h.astype(jnp.float32))
