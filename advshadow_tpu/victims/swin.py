"""Swin Transformer victim classifiers (Flax linen, NHWC).

timm-layout Swin (patch embed, windowed MSA with relative position bias,
shifted windows on alternate blocks, patch-merging downsampling) for the
ASR zoo's ``swin_base_patch4_window7_224`` row (ref: ASR_fast.py:27-31).
Window partitioning is pure reshape/transpose — XLA-friendly, no dynamic
shapes; the cyclic shift is ``jnp.roll``.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advshadow_tpu.victims.vit import _PatchEmbed

__all__ = ["SwinTransformer", "swin_tiny", "swin_base"]


def _window_partition(x, w):
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_reverse(windows, w, H, W):
    B = windows.shape[0] // ((H // w) * (W // w))
    x = windows.reshape(B, H // w, W // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _relative_position_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


class _WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask=None):
        B_, N, C = x.shape
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        attn = (q * head_dim**-0.5) @ k.transpose(0, 1, 3, 2)
        bias_table = self.param(
            "relative_position_bias_table", nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_relative_position_index(self.window))
        bias = bias_table[idx.reshape(-1)].reshape(N, N, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(B_ // nw, nw, self.num_heads, N, N)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(B_, self.num_heads, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, name="proj")(out)


def _shift_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows (−100 on cross-region pairs)."""
    img = np.zeros((1, H, W, 1))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    windows = img.reshape(1, H // w, w, W // w, w, 1)
    windows = windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w)
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class _SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if self.shift > 0:
            h = jnp.roll(h, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(H, W, self.window, self.shift))
        else:
            mask = None
        wins = _window_partition(h, self.window)
        wins = _WindowAttention(self.dim, self.num_heads, self.window,
                                name="attn")(wins, mask)
        h = _window_reverse(wins, self.window, H, W)
        if self.shift > 0:
            h = jnp.roll(h, (self.shift, self.shift), axis=(1, 2))
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), name="mlp1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="mlp2")(h)
        return x + h


class _PatchMerging(nn.Module):
    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        # timm order: (0,0), (1,0), (0,1), (1,1)
        x = jnp.concatenate(
            [x[:, :, 0, :, 0], x[:, :, 1, :, 0],
             x[:, :, 0, :, 1], x[:, :, 1, :, 1]], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # reshape+GEMM patchify (same param tree as the nn.Conv it
        # replaces; see victims/vit.py:_PatchEmbed for the MXU rationale)
        h = _PatchEmbed(self.embed_dim, 4, flatten=False,
                        name="patch_embed")(x)
        h = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(h)
        for si, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = self.embed_dim * (2**si)
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else self.window // 2
                # windows never exceed the map (deep stages are 7x7)
                w = min(self.window, h.shape[1])
                shift = 0 if w == h.shape[1] else shift
                h = _SwinBlock(dim, heads, w, shift,
                               name=f"stage{si}_block{bi}")(h)
            if si < len(self.depths) - 1:
                h = _PatchMerging(name=f"downsample{si}")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        h = h.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="head")(h)


swin_tiny = partial(SwinTransformer, 96, (2, 2, 6, 2), (3, 6, 12, 24))
swin_base = partial(SwinTransformer, 128, (2, 2, 18, 2), (4, 8, 16, 32))
