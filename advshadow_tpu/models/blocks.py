"""Building blocks for the conditional UNet family (Flax linen, NHWC).

TPU re-design of the vendored framework's modules (ref:
model/modules/conv.py, model/modules/module.py, model/modules/block.py):
DoubleConv / BaseConv use GroupNorm(1) (i.e. LayerNorm over C,H,W), the
CSP/YOLO stack (Bottleneck, SPPF, CSPLayer, DenseModule), and the
time-embedding-broadcasting Down/Up blocks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "get_activation",
    "DoubleConv",
    "BaseConv",
    "Bottleneck",
    "SPPFBottleneck",
    "CSPLayer",
    "DenseModule",
    "DownBlock",
    "UpBlock",
    "CSPDarkDownBlock",
    "CSPDarkUpBlock",
    "ResidualDenseBlock",
]

_ACTS = {
    "relu": nn.relu,
    "relu6": lambda x: jnp.minimum(nn.relu(x), 6.0),
    "silu": nn.silu,
    "lrelu": lambda x: nn.leaky_relu(x, negative_slope=0.1),
    "gelu": nn.gelu,
}


def get_activation(name: str = "silu"):
    """Activation registry; unknown names fall back to SiLU like the
    reference's warn+fallback (ref: model/modules/activation.py:16-36)."""
    return _ACTS.get(name, nn.silu)


def _gn1(dtype=None):
    # GroupNorm(num_groups=1) == LayerNorm over (H, W, C); torch eps 1e-5.
    # Norm statistics accumulate in f32 even under bf16 compute.
    return nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=dtype)


class DoubleConv(nn.Module):
    """(Conv3x3-GN1-act) x2, optional residual with act on the sum.
    (ref: model/modules/conv.py:20-68)"""

    out_channels: int
    mid_channels: Optional[int] = None
    residual: bool = False
    act: str = "silu"
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = get_activation(self.act)
        mid = self.mid_channels or self.out_channels
        h = nn.Conv(mid, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv1")(x)
        h = _gn1(self.dtype)(h)
        h = act(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv2")(h)
        h = _gn1(self.dtype)(h)
        if self.residual:
            return act(x + h)
        return h


class BaseConv(nn.Module):
    """Conv-GN1-act with same padding (ref: model/modules/conv.py:71-98)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    use_bias: bool = False
    act: str = "silu"
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(
            self.out_channels, (self.kernel_size, self.kernel_size),
            strides=self.stride, padding=pad, feature_group_count=self.groups,
            use_bias=self.use_bias, dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)
        return get_activation(self.act)(_gn1(self.dtype)(h))


class Bottleneck(nn.Module):
    """1x1 -> 3x3 with optional shortcut (ref: model/modules/module.py:21-46)."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    act: str = "silu"
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mid = int(self.out_channels * self.expansion)
        y = BaseConv(mid, 1, 1, act=self.act, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="conv1")(x)
        y = BaseConv(self.out_channels, 3, 1, act=self.act,
                     dtype=self.dtype, param_dtype=self.param_dtype, name="conv2")(y)
        if self.shortcut and x.shape[-1] == self.out_channels:
            y = y + x
        return y


class SPPFBottleneck(nn.Module):
    """SPPF: triple stacked maxpool concat (ref: model/modules/module.py:49-77)."""

    out_channels: int
    kernel_size: int = 5
    act: str = "silu"
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mid = x.shape[-1] // 2
        x = BaseConv(mid, 1, 1, act=self.act, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="conv1")(x)
        k = self.kernel_size
        pool = lambda h: nn.max_pool(h, (k, k), strides=(1, 1),
                                     padding=((k // 2, k // 2), (k // 2, k // 2)))
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        cat = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return BaseConv(self.out_channels, 1, 1, act=self.act,
                        dtype=self.dtype, param_dtype=self.param_dtype, name="conv2")(cat)


class CSPLayer(nn.Module):
    """CSP bottleneck with 3 convs (ref: model/modules/module.py:80-112)."""

    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    act: str = "silu"
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mid = int(self.out_channels * self.expansion)
        x1 = BaseConv(mid, 1, 1, act=self.act, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="conv1")(x)
        x2 = BaseConv(mid, 1, 1, act=self.act, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="conv2")(x)
        for i in range(self.n):
            x1 = Bottleneck(mid, shortcut=self.shortcut, expansion=1.0,
                            act=self.act, dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"m_{i}")(x1)
        cat = jnp.concatenate([x1, x2], axis=-1)
        return BaseConv(self.out_channels, 1, 1, act=self.act,
                        dtype=self.dtype, param_dtype=self.param_dtype, name="conv3")(cat)


class DenseModule(nn.Module):
    """Conv-act with dense concat growth (ref: model/modules/module.py:115-130)."""

    out_channels: int
    act: str = "silu"
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv")(x)
        y = get_activation(self.act)(y)
        return jnp.concatenate([x, y], axis=-1)


def _time_emb_add(h: jax.Array, temb: jax.Array, act_name: str,
                  param_dtype, name: str, dtype=None) -> jax.Array:
    """SiLU-Linear(time) broadcast-added over the spatial map
    (ref: model/modules/block.py:36-48)."""
    t = nn.silu(temb)
    t = nn.Dense(h.shape[-1], dtype=dtype, param_dtype=param_dtype,
                 name=name)(t)
    return h + t[:, None, None, :]


class DownBlock(nn.Module):
    """MaxPool2 + DoubleConv(res) + DoubleConv + time-emb add.
    (ref: model/modules/block.py:15-49)"""

    out_channels: int
    act: str = "silu"
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        h = nn.max_pool(x, (2, 2), strides=(2, 2))
        h = DoubleConv(h.shape[-1], residual=True, act=self.act,
                       dtype=self.dtype, param_dtype=self.param_dtype, name="dc1")(h)
        h = DoubleConv(self.out_channels, act=self.act,
                       dtype=self.dtype, param_dtype=self.param_dtype, name="dc2")(h)
        return _time_emb_add(h, temb, self.act, self.param_dtype, "emb",
                             dtype=self.dtype)


class UpBlock(nn.Module):
    """Bilinear x2 + skip concat + DoubleConvs + time-emb add.
    (ref: model/modules/block.py:52-90)"""

    out_channels: int
    act: str = "silu"
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, temb: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        # torch Upsample(bilinear, align_corners=True) == jax 'linear' resize
        # is align_corners=False; emulate align_corners=True via lax gather.
        x = _bilinear_align_corners(x, H * 2, W * 2)
        h = jnp.concatenate([skip, x], axis=-1)
        in_ch = h.shape[-1]
        h = DoubleConv(in_ch, residual=True, act=self.act,
                       dtype=self.dtype, param_dtype=self.param_dtype, name="dc1")(h)
        h = DoubleConv(self.out_channels, mid_channels=in_ch // 2, act=self.act,
                       dtype=self.dtype, param_dtype=self.param_dtype, name="dc2")(h)
        return _time_emb_add(h, temb, self.act, self.param_dtype, "emb",
                             dtype=self.dtype)


def _bilinear_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True semantics (torch parity)."""
    B, H, W, C = x.shape

    def axis_weights(in_size, out_size):
        if in_size == 1:
            pos = jnp.zeros((out_size,))
        else:
            pos = jnp.arange(out_size) * (in_size - 1) / (out_size - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        w = (pos - lo).astype(x.dtype)
        return lo, hi, w

    ylo, yhi, wy = axis_weights(H, out_h)
    xlo, xhi, wx = axis_weights(W, out_w)
    top = x[:, ylo][:, :, xlo] * (1 - wx)[None, None, :, None] \
        + x[:, ylo][:, :, xhi] * wx[None, None, :, None]
    bot = x[:, yhi][:, :, xlo] * (1 - wx)[None, None, :, None] \
        + x[:, yhi][:, :, xhi] * wx[None, None, :, None]
    return top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]


class CSPDarkDownBlock(nn.Module):
    """Stride-2 BaseConv + CSPLayer + time-emb add.
    (ref: model/modules/block.py:93-111)"""

    out_channels: int
    n: int = 1
    act: str = "silu"
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        h = BaseConv(self.out_channels, 3, 2, act=self.act,
                     dtype=self.dtype, param_dtype=self.param_dtype, name="conv")(x)
        h = CSPLayer(self.out_channels, n=self.n, act=self.act,
                     dtype=self.dtype, param_dtype=self.param_dtype, name="csp")(h)
        return _time_emb_add(h, temb, self.act, self.param_dtype, "emb",
                             dtype=self.dtype)


class CSPDarkUpBlock(nn.Module):
    """1x1 conv + nearest x2 + skip concat + CSPLayer + time-emb add.

    The reference applies the same 1x1 conv twice, once pre-upsample and
    once after the concat (ref: model/modules/block.py:114-134) — which only
    type-checks because in/out channel pairs happen to coincide; here the
    post-concat conv is its own layer with the correct shapes, preserving
    the in->out channel contract.
    """

    out_channels: int
    n: int = 1
    act: str = "silu"
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, temb: jax.Array) -> jax.Array:
        h = BaseConv(self.out_channels, 1, 1, act=self.act,
                     dtype=self.dtype, param_dtype=self.param_dtype, name="conv")(x)
        B, H, W, C = h.shape
        h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
        h = jnp.concatenate([skip, h], axis=-1)
        h = BaseConv(self.out_channels, 1, 1, act=self.act,
                     dtype=self.dtype, param_dtype=self.param_dtype, name="conv_post")(h)
        h = CSPLayer(self.out_channels, n=self.n, shortcut=False, act=self.act,
                     dtype=self.dtype, param_dtype=self.param_dtype, name="csp")(h)
        return _time_emb_add(h, temb, self.act, self.param_dtype, "emb",
                             dtype=self.dtype)


class ResidualDenseBlock(nn.Module):
    """RDN block: n DenseModules + 1x1 fuse + residual.
    (ref: model/modules/block.py:137-151)"""

    out_channels: int
    n: int = 1
    act: str = "silu"
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        y = x
        for i in range(self.n):
            y = DenseModule(self.out_channels, act=self.act,
                            dtype=self.dtype, param_dtype=self.param_dtype, name=f"dense_{i}")(y)
        y = nn.Conv(in_ch, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="fuse")(y)
        return x + y
