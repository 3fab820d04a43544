"""Fused spatial self-attention for TPU.

The reference computes spatial attention as a dense per-head einsum with a
double-sqrt scale applied to both q and k (ref: diff_model.py:117-127).
Here the forward pass runs as a Pallas kernel that keeps K/V resident in
VMEM and streams q blocks through the MXU, with softmax fused in — one HBM
round-trip for the whole attention instead of materializing the [T, T]
score matrix in HBM.  The backward pass recomputes scores in plain XLA
(rematerialization: trade FLOPs for HBM), exposed via ``jax.custom_vjp`` so
the op is fully differentiable for both diffusion training and the
attack's input gradients.

Token counts in this workload are modest (T = H*W <= 16384, head_dim <=
1024), so a single-pass kernel with full K/V in VMEM is the right design
point; the q-block grid keeps the score tile at [BLOCK_Q, T] in VMEM.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

try:  # Pallas is TPU-only in spirit; import lazily-safe for CPU test runs.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["spatial_attention", "attention_reference"]

_BLOCK_Q = 256
_LANE = 128


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, T, C] -> [B*heads, T, C/heads]."""
    B, T, C = x.shape
    x = x.reshape(B, T, num_heads, C // num_heads)
    return x.transpose(0, 2, 1, 3).reshape(B * num_heads, T, C // num_heads)


def _merge_heads(x: jax.Array, batch: int, num_heads: int) -> jax.Array:
    """[B*heads, T, d] -> [B, T, heads*d]."""
    BH, T, d = x.shape
    x = x.reshape(batch, num_heads, T, d).transpose(0, 2, 1, 3)
    return x.reshape(batch, T, num_heads * d)


def attention_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float
) -> jax.Array:
    """Plain XLA attention on [BH, T, d] operands (numerical reference)."""
    logits = jnp.einsum(
        "btd,bsd->bts", q * scale, k * scale, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bts,bsd->btd", probs, v)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_actual: int, scale: float):
    """One (batch-head, q-block) program: softmax(q k^T) v.

    Shapes (VMEM): q [1, BLOCK_Q, D], k/v [1, T_pad, D], o [1, BLOCK_Q, D].
    Padding columns beyond ``t_actual`` are masked to -inf before softmax;
    padded head dims are zero so they add nothing to the dot products.
    """
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32) * scale
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BLOCK_Q, T_pad]
    t_pad = logits.shape[-1]
    if t_pad != t_actual:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < t_actual, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _attention_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float
) -> jax.Array:
    BH, T, d = q.shape
    block_q = min(_BLOCK_Q, max(_LANE, 1 << (T - 1).bit_length()))
    qp = _pad_to(_pad_to(q, 1, block_q), 2, _LANE)
    kp = _pad_to(_pad_to(k, 1, _LANE), 2, _LANE)
    vp = _pad_to(_pad_to(v, 1, _LANE), 2, _LANE)
    T_q, D = qp.shape[1], qp.shape[2]
    T_kv = kp.shape[1]

    grid = (BH, T_q // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, t_actual=T, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BH, T_q, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_kv, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_kv, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * T_q * T_kv * D,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=BH * T_q * T_kv,
        ),
    )(qp, kp, vp)
    return out[:, :T, :d]


#: below this token count XLA's plain einsum attention wins: measured on
#: v5e at the bench flagship (64px UNet, attn maps 8x8/4x4, bf16 batch
#: 512) the sampler runs 86.4 imgs/s with XLA attention vs 76.2 with the
#: flash kernel — tiny score matrices don't amortize the kernel's
#: blockwise-softmax machinery, and XLA batches them onto the MXU well.
_PALLAS_MIN_TOKENS = 2048


def _use_pallas_auto(T: int, d: int) -> bool:
    """Auto rule: flash kernel only where it earns its keep (large token
    counts whose [T, T] scores XLA would materialize), and only when the
    kernel fits: full K/V + a [BLOCK_Q, T] score tile in VMEM."""
    if not _HAS_PALLAS or T < _PALLAS_MIN_TOKENS:
        return False
    d_pad = -(-d // _LANE) * _LANE
    t_pad = -(-T // _LANE) * _LANE
    vmem = (2 * t_pad * d_pad + _BLOCK_Q * t_pad + _BLOCK_Q * d_pad) * 4
    return vmem < 12 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention(q, k, v, scale: float, use_pallas: bool):
    if use_pallas:
        # Select per lowering platform: the Pallas kernel on TPU, the XLA
        # einsum path everywhere else (CPU test meshes, interpreters).
        return jax.lax.platform_dependent(
            q, k, v,
            tpu=functools.partial(_attention_pallas, scale=scale),
            default=functools.partial(attention_reference, scale=scale),
        )
    return attention_reference(q, k, v, scale)


def _attention_fwd(q, k, v, scale: float, use_pallas: bool):
    return _attention(q, k, v, scale, use_pallas), (q, k, v)


#: largest [BH, T, T] f32 score temp the one-shot backward may allocate;
#: beyond this the backward runs chunked over query blocks.  512 MB keeps
#: the flagship cond-UNet train step (sa6: BH=256, T=4096 would need
#: 3x16 GB one-shot — an instant HBM OOM on v5e) well inside HBM.
_BWD_TEMP_BYTES = 512 * 1024 * 1024


def _attention_bwd(scale: float, use_pallas: bool, res, g):
    """Recompute-based backward in plain XLA (float32 accumulation).

    One-shot when the [BH, T, T] score temp is small; otherwise a
    flash-style ``lax.scan`` over query blocks: each step recomputes its
    [BH, cq, T] score slab, emits dq for the block, and accumulates
    dk/dv — peak temp bounded by ``_BWD_TEMP_BYTES`` regardless of T.
    """
    q, k, v = res
    BH, T, d = q.shape
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32) * scale
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    if 4 * BH * T * T <= _BWD_TEMP_BYTES:
        logits = jnp.einsum("btd,bsd->bts", qf, kf)
        p = jax.nn.softmax(logits, axis=-1)
        dv = jnp.einsum("bts,btd->bsd", p, gf)
        dp = jnp.einsum("btd,bsd->bts", gf, vf)
        dlogits = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        dq = jnp.einsum("bts,bsd->btd", dlogits, kf) * scale
        dk = jnp.einsum("bts,btd->bsd", dlogits, qf) * scale
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    # ---- chunked: scan over query blocks -----------------------------
    cq = max(_LANE, _BWD_TEMP_BYTES // (4 * BH * T) // _LANE * _LANE)
    cq = min(cq, T)
    t_pad = -(-T // cq) * cq
    # zero-padded q rows give uniform softmax rows but a zero cotangent,
    # so dlogits vanishes and they contribute nothing to dk/dv
    qp = _pad_to(qf, 1, cq).reshape(BH, t_pad // cq, cq, d)
    gp = _pad_to(gf, 1, cq).reshape(BH, t_pad // cq, cq, d)

    def step(carry, xs):
        dk_acc, dv_acc = carry
        qc, gc = xs                                     # [BH, cq, d]
        logits = jnp.einsum("bqd,bsd->bqs", qc, kf,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, axis=-1)
        dv_acc = dv_acc + jnp.einsum("bqs,bqd->bsd", p, gc)
        dp = jnp.einsum("bqd,bsd->bqs", gc, vf,
                        preferred_element_type=jnp.float32)
        dlogits = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        dqc = jnp.einsum("bqs,bsd->bqd", dlogits, kf) * scale
        dk_acc = dk_acc + jnp.einsum("bqs,bqd->bsd", dlogits, qc) * scale
        return (dk_acc, dv_acc), dqc

    (dk, dv), dqs = jax.lax.scan(
        step, (jnp.zeros_like(kf), jnp.zeros_like(vf)),
        (qp.transpose(1, 0, 2, 3), gp.transpose(1, 0, 2, 3)))
    dq = dqs.transpose(1, 0, 2, 3).reshape(BH, t_pad, d)[:, :T]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_attention.defvjp(_attention_fwd, _attention_bwd)


def spatial_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Multi-head softmax attention over flattened spatial tokens.

    Args:
      q, k, v: [B, T, C] with C divisible by ``num_heads``.
      num_heads: head count.
      use_pallas: force (True/False) or auto-select (None) the Pallas path.

    Uses the reference's double-sqrt scaling, 1/sqrt(sqrt(head_dim)) applied
    to both q and k (ref: diff_model.py:121-124).
    """
    B, T, C = q.shape
    d = C // num_heads
    scale = 1.0 / math.sqrt(math.sqrt(d))
    qh, kh, vh = (_split_heads(x, num_heads) for x in (q, k, v))
    if use_pallas is None:
        use_pallas = _use_pallas_auto(T, d)
    out = _attention(qh, kh, vh, scale, bool(use_pallas))
    return _merge_heads(out, B, num_heads)
