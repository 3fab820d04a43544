"""Token self-attention block for the conditional UNet family (NHWC).

Re-design of the vendored SelfAttention (ref:
model/modules/attention.py:12-53): flatten H*W tokens, pre-LayerNorm,
4-head attention, residual, then LayerNorm-Dense-act-Dense feed-forward
with residual.  Unlike the reference, the spatial size is taken from the
input shape instead of a constructor-frozen ``size`` — same math, no
resolution lock-in.  The attention core shares the fused Pallas path in
:mod:`advshadow_tpu.ops.attention` via standard 1/sqrt(d) scaling.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from advshadow_tpu.models.blocks import get_activation
from advshadow_tpu.ops import attention as attn_ops

__all__ = ["SelfAttention"]


class SelfAttention(nn.Module):
    num_heads: int = 4
    act: str = "silu"
    use_pallas: Optional[bool] = None
    dtype: jnp.dtype = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        x_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
                            name="ln")(tokens)

        # Shared in-projection (torch MHA packs q/k/v into one matrix).
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=self.param_dtype, name="qkv")(x_ln)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        d = C // self.num_heads
        # ops.attention applies scale to both q and k; standard MHA scales
        # q alone by 1/sqrt(d) == scaling both by 1/d^0.25. Identical math.
        # Operands stay head-FOLDED [B, T, C]: the op slices heads in
        # VMEM, avoiding 8x-lane-padded [B*H, T, d] HBM tensors (d=16 at
        # this family's full-res layers).
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = attn_ops._use_pallas_auto(H * W, d, self.num_heads)
        out = attn_ops._attention(q, k, v, self.num_heads, d ** -0.25,
                                  bool(use_pallas))
        out = nn.Dense(C, dtype=self.dtype, param_dtype=self.param_dtype, name="out_proj")(out)

        h = out + tokens
        ff = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
                          name="ff_ln")(h)
        ff = nn.Dense(C, dtype=self.dtype, param_dtype=self.param_dtype, name="ff1")(ff)
        ff = get_activation(self.act)(ff)
        ff = nn.Dense(C, dtype=self.dtype, param_dtype=self.param_dtype, name="ff2")(ff)
        h = ff + h
        return h.reshape(B, H, W, C)
