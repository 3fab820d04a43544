"""Fused nearest-x2 upsample + 3x3 conv via subpixel decomposition.

The reference Upsample is nearest-x2 followed by a SAME 3x3 conv
(ref: diff_model.py:129-140).  Computed literally, the x2 image is
materialized (a gather: ~4.3% of sampler time on v5e) and the conv runs
at the high resolution (the single most expensive op in the profile).

Algebra: a 3x3 window on the nearest-x2 image covers exactly a 2x2
low-res neighborhood, with per-cell weights equal to sums of the 3x3
taps.  So conv3x3(up2(x)) decomposes into FOUR 2x2 convs on the low-res
input (one per output phase (di, dj) = (row parity, col parity)) whose
kernels are tap-sums of the original kernel, followed by a pixel-shuffle
interleave:

  phase rows  di=0: taps (-1, 0) with weights [W0, W1+W2]
              di=1: taps ( 0,+1) with weights [W0+W1, W2]
  (same combination over columns for dj)

16 low-res taps replace 36 (2.25x fewer FLOPs), the input is read once
at low resolution (4x less traffic), and no upsampled intermediate is
ever materialized.  Exact up to f32 tap-sum reassociation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["upsample2x_conv3x3", "upsample2x_conv3x3_dilated"]


def upsample2x_conv3x3_dilated(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    dtype=None,
) -> jax.Array:
    """Same math as :func:`upsample2x_conv3x3` via ONE base-dilated conv.

    nearest_x2 = conv(zero_dilate_2(x), ones(2,2)), so
    conv3x3(nearest_x2(x)) = conv(zero_dilate_2(x), K4) with the 4-tap
    kernel K4 = [W0, W0+W1, W1+W2, W2] per dim at offsets (-2,-1,0,+1)
    (padding (2,2) around the 2H-1 dilated extent).  XLA:TPU lowers
    lhs-dilated convs with its own
    phase decomposition and writes the high-res output directly — no
    materialized interleave pass.
    """
    w = kernel
    r = jnp.stack([w[0], w[0] + w[1], w[1] + w[2], w[2]], axis=0)  # [4,3,..]
    k4 = jnp.stack([r[:, 0], r[:, 0] + r[:, 1], r[:, 1] + r[:, 2], r[:, 2]],
                   axis=1)                                         # [4,4,..]
    if dtype is None:
        # nn.Conv(dtype=None) promotes operands to a common dtype; the raw
        # lax conv instead *requires* matching dtypes — promote explicitly
        # so bf16 activations with f32 params stay valid here too.
        dtype = jnp.result_type(x.dtype, kernel.dtype)
    x = x.astype(dtype)
    k4 = k4.astype(dtype)
    bias = bias.astype(dtype) if bias is not None else None
    dn = jax.lax.conv_dimension_numbers(x.shape, k4.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, k4, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=dn)
    if bias is not None:
        y = y + bias
    return y


def _phase_kernels(w: jax.Array):
    """[3,3,Cin,Cout] -> dict[(di,dj)] of [2,2,Cin,Cout] tap-sum kernels."""
    rows = {
        0: jnp.stack([w[0], w[1] + w[2]], axis=0),
        1: jnp.stack([w[0] + w[1], w[2]], axis=0),
    }
    out = {}
    for di, wr in rows.items():
        out[(di, 0)] = jnp.stack([wr[:, 0], wr[:, 1] + wr[:, 2]], axis=1)
        out[(di, 1)] = jnp.stack([wr[:, 0] + wr[:, 1], wr[:, 2]], axis=1)
    return out


def upsample2x_conv3x3(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    dtype=None,
) -> jax.Array:
    """conv3x3_SAME(nearest_upsample_x2(x)) computed on the low-res input.

    Args:
      x: [B, H, W, Cin].
      kernel: [3, 3, Cin, Cout] (flax HWIO layout).
      bias: optional [Cout].
      dtype: compute dtype (mirrors nn.Conv's dtype promotion).
    Returns: [B, 2H, 2W, Cout].
    """
    B, H, W, _ = x.shape
    phases = _phase_kernels(kernel)
    if dtype is None:
        dtype = jnp.result_type(x.dtype, kernel.dtype)  # nn.Conv promotion
    x = x.astype(dtype)
    phases = {k: v.astype(dtype) for k, v in phases.items()}
    bias = bias.astype(dtype) if bias is not None else None

    dn = jax.lax.conv_dimension_numbers(
        x.shape, phases[(0, 0)].shape, ("NHWC", "HWIO", "NHWC"))

    def phase(di, dj):
        return jax.lax.conv_general_dilated(
            x, phases[(di, dj)], window_strides=(1, 1),
            padding=((1 - di, di), (1 - dj, dj)), dimension_numbers=dn)

    y00, y01 = phase(0, 0), phase(0, 1)
    y10, y11 = phase(1, 0), phase(1, 1)
    C = y00.shape[-1]
    row0 = jnp.stack([y00, y01], axis=3).reshape(B, H, 2 * W, C)
    row1 = jnp.stack([y10, y11], axis=3).reshape(B, H, 2 * W, C)
    y = jnp.stack([row0, row1], axis=2).reshape(B, 2 * H, 2 * W, C)
    if bias is not None:
        y = y + bias
    return y
