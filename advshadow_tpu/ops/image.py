"""Image manipulation primitives (pure JAX, NHWC, differentiable)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pixel_shuffle", "to_uint8", "from_uint8", "image_grid", "resize"]


def pixel_shuffle(x: jax.Array, scale: int) -> jax.Array:
    """Depth-to-space, torch PixelShuffle channel-order parity.

    [B, H, W, C*r*r] -> [B, H*r, W*r, C].  torch packs channels as
    (C, r, r) in its NCHW layout; matching that ordering keeps ported
    SRv1 weights (ref: model/networks/sr/srv1.py:57-58) bit-compatible.
    """
    B, H, W, Crr = x.shape
    C = Crr // (scale * scale)
    x = x.reshape(B, H, W, C, scale, scale)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H * scale, W * scale, C)


def to_uint8(x: jax.Array, from_range: str = "pm1") -> jax.Array:
    """[-1,1] ('pm1') or [0,1] ('unit') float -> uint8 [0,255].
    (ref: model/samples/ddpm.py:96-99)"""
    if from_range == "pm1":
        x = (jnp.clip(x, -1.0, 1.0) + 1.0) / 2.0
    else:
        x = jnp.clip(x, 0.0, 1.0)
    return (x * 255.0).astype(jnp.uint8)


def from_uint8(x: jax.Array, to_range: str = "pm1") -> jax.Array:
    x = x.astype(jnp.float32) / 255.0
    if to_range == "pm1":
        x = x * 2.0 - 1.0
    return x


def image_grid(images: jax.Array, rows: int) -> jax.Array:
    """[N, H, W, C] -> single [rows*H, cols*W, C] grid image."""
    N, H, W, C = images.shape
    cols = N // rows
    g = images[: rows * cols].reshape(rows, cols, H, W, C)
    g = g.transpose(0, 2, 1, 3, 4)
    return g.reshape(rows * H, cols * W, C)


def resize(x: jax.Array, height: int, width: int, method: str = "bilinear") -> jax.Array:
    """Batched NHWC resize (antialias off, torch-style)."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, height, width, C), method=method)
