"""DDPM UNet denoiser (Flax linen, NHWC).

Config-compatible with the reference ``UNetModel`` (ref:
diff_model.py:157-267): stem conv, ``channel_mult`` levels x
``num_res_blocks`` residual blocks with attention at
``attention_resolutions`` (expressed as downsample factors), a
Res-Attn-Res middle block, a mirrored up path consuming the skip stack,
and a GN-SiLU-Conv head.  Also covers the reference's conditional variant
by accepting an optional class label that is embedded and added to the
time embedding (ref: model/networks/base.py:41-42, tools/train.py:201-204
for CFG dropout handled by the trainer), so one parameterized network
serves every config in the reference:

- (1,2,2,2) / attn(8,16)         default          (diff_model.py:158-168)
- (1,2,4,8) / attn(4,8,16) x3    32px pretrainer  (diff_model.py:535-544)
- (1,1,2,2,4,4) / 128px          shadow model     (ddim2/main2.py:118-135)
- (1,2,3,4) / attn(2,)           "cs2"            (gen.py:522-528)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from advshadow_tpu.models.layers import (
    AttentionBlock,
    Downsample,
    ResidualBlock,
    Upsample,
    timestep_embedding,
)

__all__ = ["UNetModel"]


class UNetModel(nn.Module):
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (8, 16)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 2, 2)
    conv_resample: bool = True
    num_heads: int = 4
    num_classes: Optional[int] = None
    use_pallas_attention: Optional[bool] = None
    dtype: jnp.dtype = None          # bf16 here = TPU-native AMP
    remat: bool = False              # rematerialize res blocks (mem <-> FLOPs)
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        y: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        """Denoise a batch.

        Args:
          x: [N, H, W, C] noisy images.
          timesteps: [N] integer (or fractional) timesteps.
          y: optional [N] integer class labels; entries equal to
            ``num_classes`` (or negative) mean "unconditional" — the
            classifier-free-guidance null token.
          train: enables dropout.
        """
        ch0 = self.model_channels
        time_embed_dim = ch0 * 4

        emb = timestep_embedding(timesteps, ch0)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="time_dense1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="time_dense2")(emb)

        if self.num_classes is not None:
            # num_classes + 1 rows: the last row is the CFG null embedding.
            label_emb = nn.Embed(
                self.num_classes + 1, time_embed_dim,
                param_dtype=self.param_dtype, name="label_embed",
            )
            if y is None:
                y_ix = jnp.full((x.shape[0],), self.num_classes, dtype=jnp.int32)
            else:
                y_ix = jnp.where(y < 0, self.num_classes, y).astype(jnp.int32)
            emb = emb + label_emb(y_ix)

        res_cls = (nn.remat(ResidualBlock, static_argnums=())
                   if self.remat else ResidualBlock)

        def res(h, out_ch, name):
            return res_cls(out_ch, self.dropout, dtype=self.dtype,
                           param_dtype=self.param_dtype, name=name)(
                h, emb, deterministic=not train)

        def attn(h, name):
            return AttentionBlock(self.num_heads,
                                  use_pallas=self.use_pallas_attention,
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype, name=name)(h)

        # --- down path ---
        h = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="stem")(x)
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = res(h, mult * ch0, f"down_{level}_{i}_res")
                if ds in self.attention_resolutions:
                    h = attn(h, f"down_{level}_{i}_attn")
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample(self.conv_resample, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"down_{level}_downsample")(h)
                hs.append(h)
                ds *= 2

        # --- middle ---
        ch = h.shape[-1]
        h = res(h, ch, "mid_res1")
        h = attn(h, "mid_attn")
        h = res(h, ch, "mid_res2")

        # --- up path ---
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(h, mult * ch0, f"up_{level}_{i}_res")
                if ds in self.attention_resolutions:
                    h = attn(h, f"up_{level}_{i}_attn")
                if level and i == self.num_res_blocks:
                    h = Upsample(self.conv_resample, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"up_{level}_upsample")(h)
                    ds //= 2
        assert not hs

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                         name="out_norm")(h)
        h = nn.silu(h)
        # final conv always emits f32 (eps predictions feed f32 losses)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       param_dtype=self.param_dtype, name="out_conv")(
            h.astype(jnp.float32))
