"""Shared DDPM-UNet building blocks (Flax linen, NHWC).

TPU-native re-design of the reference blocks (ref: diff_model.py:16-153):
NHWC layout, GroupNorm(32) + SiLU, spatial self-attention with the
double-sqrt scaling the reference uses.  The attention block can route
through the fused Pallas kernel (:mod:`advshadow_tpu.ops.attention`) when
the token count is TPU-tile friendly.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from advshadow_tpu.ops.attention import spatial_attention

__all__ = [
    "timestep_embedding",
    "ResidualBlock",
    "AttentionBlock",
    "Upsample",
    "Downsample",
]


def timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: float = 10000.0
) -> jax.Array:
    """Sinusoidal timestep embedding, [N] -> [N, dim].

    Matches the reference layout: cos first, then sin
    (ref: diff_model.py:16-33).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def _group_norm(num_groups: int = 32, dtype=None) -> nn.GroupNorm:
    # torch GroupNorm eps=1e-5 (flax default is 1e-6); match the reference.
    # GN statistics accumulate in f32 even under bf16 compute.
    return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5, dtype=dtype)


class ResidualBlock(nn.Module):
    """GN-SiLU-Conv3x3 + time-emb add + GN-SiLU-Dropout-Conv3x3 + shortcut.
    (ref: diff_model.py:67-103)"""

    out_channels: int
    dropout: float = 0.0
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, temb: jax.Array, *, deterministic: bool = True
    ) -> jax.Array:
        in_channels = x.shape[-1]
        h = _group_norm(dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)

        t = nn.silu(temb)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="time_proj")(t)
        h = h + t[:, None, None, :]

        h = _group_norm(dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)

        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="shortcut")(x)
        return h + x


class AttentionBlock(nn.Module):
    """Spatial self-attention with residual (ref: diff_model.py:107-127).

    QKV from a 1x1 conv (bias-free), per-head softmax(q k^T) v with the
    reference's 1/sqrt(sqrt(head_dim)) scaling applied to both q and k,
    then a 1x1 projection and residual add.  The inner attention runs
    through :func:`advshadow_tpu.ops.attention.spatial_attention`, which
    dispatches to a fused Pallas flash kernel on TPU when shapes allow.
    """

    num_heads: int = 1
    use_pallas: Optional[bool] = None
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        assert C % self.num_heads == 0
        h = _group_norm(dtype=self.dtype)(x)
        qkv = nn.Conv(C * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, H * W, 3 * C), 3, axis=-1)
        out = spatial_attention(
            q, k, v, num_heads=self.num_heads, use_pallas=self.use_pallas
        )
        out = out.reshape(B, H, W, C).astype(x.dtype)
        out = nn.Conv(C, (1, 1), dtype=self.dtype,
                      param_dtype=self.param_dtype, name="proj")(out)
        return out + x


class _ConvParams(nn.Module):
    """Parameter container matching nn.Conv's {kernel, bias} tree so
    checkpoints stay interchangeable with the plain-conv Upsample."""

    features: int
    in_features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return kernel, bias


class Upsample(nn.Module):
    """Nearest x2 (+ optional 3x3 conv). (ref: diff_model.py:129-140)

    With ``subpixel`` (default) the conv path computes
    conv3x3(nearest_x2(x)) as four 2x2 convs on the LOW-RES input + a
    pixel shuffle (:mod:`advshadow_tpu.ops.upsample`): 2.25x fewer FLOPs
    and no materialized upsampled intermediate — this conv is the
    sampler's single most expensive op on v5e.  Exact up to f32 tap-sum
    reassociation; params are identical to the plain conv.
    """

    use_conv: bool = True
    subpixel: bool = True      # False = literal nearest-x2 + conv
    dilated: bool = True       # one lhs-dilated conv vs 4-phase+interleave
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        if self.use_conv and self.subpixel:
            from advshadow_tpu.ops.upsample import (
                upsample2x_conv3x3,
                upsample2x_conv3x3_dilated,
            )

            kernel, bias = _ConvParams(C, C, self.param_dtype, name="conv")()
            fn = (upsample2x_conv3x3_dilated if self.dilated
                  else upsample2x_conv3x3)
            return fn(x, kernel, bias, dtype=self.dtype)
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        if self.use_conv:
            x = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 conv, or 2x2 average pool. (ref: diff_model.py:143-153)"""

    use_conv: bool = True
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_conv:
            return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))
