"""Vision Transformer victim (Flax linen, NHWC).

HF/timm-layout ViT (patch embed conv, CLS token, learned position
embeddings, pre-LN encoder blocks, LN + head) covering the reference's
ViT-B/16 and DINOv2-small victims (ref: test.py:90-107, ASR_fast.py:47-58).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ViT", "vit_b16", "vit_s16"]


class _PatchEmbed(nn.Module):
    """Non-overlapping patch embedding as reshape + GEMM.

    Parameter tree is identical to the ``nn.Conv`` it replaces
    (``kernel`` of shape (p, p, C, hidden), ``bias`` of (hidden,)), so
    ported torch weights (port.py:convert_conv) and existing checkpoints
    load unchanged.  The stride-p conv on a 3-channel input is the
    single worst op on the MXU (3 of 128 input lanes live -> measured
    321 GF/s forward / 45 GF/s backward, 46% of the ViT attack config's
    device time, benchmarks/profile_attack.py vit); flattening each
    patch to a p*p*C=768 vector turns it into a full-width
    [B*N, 768] @ [768, hidden] GEMM, and its transpose in the backward
    pass (the IG attack differentiates through to the pixels) is an
    equally dense GEMM instead of a scatter-shaped transposed conv.
    """

    hidden_size: int
    patch_size: int
    flatten: bool = True    # False keeps the spatial [B, H/p, W/p, hidden]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        p = self.patch_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, C, self.hidden_size))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.hidden_size,))
        h = x.reshape(B, H // p, p, W // p, p, C)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, (H // p) * (W // p), p * p * C)
        h = h @ kernel.reshape(p * p * C, self.hidden_size) + bias
        if not self.flatten:
            h = h.reshape(B, H // p, W // p, self.hidden_size)
        return h


class _Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=C, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="ln2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), name="mlp1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="mlp2")(h)
        return x + h


class ViT(nn.Module):
    patch_size: int = 16
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    num_classes: int = 1000
    image_size: int = 224

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B = x.shape[0]
        p = self.patch_size
        h = _PatchEmbed(self.hidden_size, p, name="patch_embed")(x)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.hidden_size))
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.hidden_size)),
                             h], axis=1)
        num_tokens = (self.image_size // p) ** 2 + 1
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, num_tokens, self.hidden_size))
        h = h + pos
        for i in range(self.depth):
            h = _Block(self.num_heads, name=f"block{i}")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="ln")(h)
        return nn.Dense(self.num_classes, name="head")(h[:, 0])


vit_b16 = partial(ViT, patch_size=16, hidden_size=768, depth=12, num_heads=12)
vit_s16 = partial(ViT, patch_size=16, hidden_size=384, depth=12, num_heads=6)
