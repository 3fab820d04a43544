"""Fused spatial self-attention for TPU.

The reference computes spatial attention as a dense per-head einsum with a
double-sqrt scale applied to both q and k (ref: diff_model.py:117-127).
Here the forward pass runs as a streaming-flash Pallas kernel: q blocks
stay resident while K/V stream through VMEM block by block with an online
(running max / running sum) softmax, so neither the [T, T] score matrix
nor the full K/V ever sits in HBM or VMEM at once.  The backward pass
recomputes scores in plain XLA (rematerialization: trade FLOPs for HBM),
exposed via ``jax.custom_vjp`` so the op is fully differentiable for both
diffusion training and the attack's input gradients.

Layout: the kernel takes HEAD-FOLDED operands [B, T, C] (C = heads * d)
and slices heads with static offsets inside VMEM.  This is the critical
TPU detail for this model family: its full-resolution attention layers
have tiny head dims (e.g. the cond-UNet's sa6 at 128 px: T = 16384,
d = 16), and any HBM tensor shaped [..., 16] is padded 8x by the 128-lane
tile — a head-split [B*H, T, d] Q/K/V triple at batch 128 is 12 GB of
padding for 1.5 GB of data, an instant OOM.  Folded [B, T, 64] pads only
2x, and [B, T, >=128] not at all.

Ceiling analysis (measured, v5e, sa6 shape B=16 T=16384 C=64 H=4): at
d = 16 the matmuls contribute only 64 FLOPs per softmax element, but the
bound is NOT useful FLOPs and (counter-intuitively) not the VPU either —
it is the rate at which score elements move THROUGH the MXU: every one
of the B*H*T^2 scores must exit the QK^T systolic pass and re-enter as
PV contraction input, and with d = 16 only 16 of 128 lanes carry useful
data on each side.  Cost-attribution probes (experiments/flashbench_v2)
pin this down: deleting the exp2 + running-max + running-sum VPU work
entirely moves the kernel only 77.4 -> 73.3 ms, i.e. ~95% of the VPU
softmax work hides behind the MXU streams, while fp32-vs-bf16 PV and
MXU-vs-VPU row sums change nothing (ingest-rate bound, not FLOP bound).
What did pay, worth 1.34x total (102.9 -> 77 ms at the shape above):
folding the whole scale (including log2(e), so the softmax runs on
exp2) into the q BLOCK LOAD instead of per score element, keeping p in
f32 straight into the PV matmul (drops a per-element convert and is
MORE accurate than rounding p to bf16), 512/2048 q/kv blocks (halves
per-program overheads), and eliding the padding mask when T divides the
kv block.  The op now runs within ~6% of its matmul-structure floor;
bigger wins at 128 px require changing the model (fewer full-res
attention tokens, or d >= 128 heads), which parity with the reference
forbids.

Final word (round 5): the one remaining avenue — fusing the four d=16
QK^T passes into a single padded d=64 pass over a block-tiled K so all
heads' scores exit one systolic stream — was built and measured
(experiments/flashbench_v2.py:probe_fused_qk): 1.17x SLOWER on-device
(61.0 vs 52.2 ms at the sa6 shape).  Same score egress, and the VMEM
K-tiling plus the smaller blocks its f32 score strip forces are pure
overhead.  The kernel is closed.
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

_BLOCK_Q = 512
_BLOCK_KV = 2048
_LANE = 128
_LOG2E = 1.4426950408889634


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
# Pallas kernel: streaming flash attention over head-folded operands
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  num_heads: int, head_dim: int, t_actual: int,
                  n_kv: int, scale: float):
    """One (batch, q-block, kv-block) program step.

    VMEM blocks: q/o [1, BQ, C], k/v [1, BKV, C]; scratch m/l [BQ, H]
    (running max / running sum per head), acc [BQ, C] (unnormalized
    output).  The kv grid dim is innermost and "arbitrary": scratch
    carries across it, j==0 initializes, j==n_kv-1 normalizes and writes.
    Heads are static lane slices — no per-head HBM tensors exist.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # The whole scalar — both double-sqrt scales AND log2(e), so the
    # softmax runs on exp2 — folds into the q block load: one multiply
    # per [BQ, C] element instead of one per [BQ, BKV] score element
    # ((q*c)·k == c*(q·k); on bf16 inputs this adds one bf16 rounding on
    # q, ~2^-8 relative on s, far inside the path's bf16 noise).  k keeps
    # its storage dtype for the MXU; v upcasts once per [BKV, C] block so
    # p can flow into PV in f32 with NO per-element convert — more
    # accurate than the old p -> bf16 rounding and measured identical in
    # speed (the kernel is MXU-stream bound, see module docstring).
    q = (q_ref[0].astype(jnp.float32) * (scale * scale * _LOG2E)
         ).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0].astype(jnp.float32)
    # scores live in the base-2 domain (the folded scale carries log2(e)),
    # so the matching exponential is exp2; max/sum bookkeeping is
    # domain-consistent because m and l are derived from s.
    expf = jnp.exp2
    bq, bkv = q.shape[0], k.shape[0]
    # zero-padded kv rows must not contribute probability mass (static:
    # when T divides the kv block there is no padding and no mask work)
    masked = t_actual < n_kv * bkv
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
        invalid = col >= t_actual

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # [BQ, BKV]
        if masked:
            s = jnp.where(invalid, -jnp.inf, s)
        m_prev = m_ref[:, h]                       # [BQ]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = expf(m_prev - m_new)
        p = expf(s - m_new[:, None])
        l_ref[:, h] = l_ref[:, h] * alpha + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # [BQ, d]
        acc_ref[:, sl] = acc_ref[:, sl] * alpha[:, None] + pv
        m_ref[:, h] = m_new

    @pl.when(j == n_kv - 1)
    def _finalize():
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            o_ref[0, :, sl] = (
                acc_ref[:, sl] / l_ref[:, h][:, None]
            ).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _block_sizes(T: int) -> tuple[int, int]:
    pow2 = 1 << max(T - 1, 1).bit_length()
    return min(_BLOCK_Q, max(_LANE, pow2)), min(_BLOCK_KV, max(_LANE, pow2))


#: tests flip this to run the kernel under the Pallas interpreter on CPU
_INTERPRET = False


def _attention_flash(
    q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int, scale: float
) -> jax.Array:
    """Streaming flash attention on folded [B, T, C] operands."""
    B, T, C = q.shape
    d = C // num_heads
    bq, bkv = _block_sizes(T)
    qp = _pad_to(q, 1, bq)
    kp = _pad_to(k, 1, bkv)
    vp = _pad_to(v, 1, bkv)
    n_q = qp.shape[1] // bq
    n_kv = kp.shape[1] // bkv

    out = pl.pallas_call(
        functools.partial(_flash_kernel, num_heads=num_heads, head_dim=d,
                          t_actual=T, n_kv=n_kv, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, qp.shape[1], C), q.dtype),
        grid=(B, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, C), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, C), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, num_heads), jnp.float32),   # running max
            pltpu.VMEM((bq, num_heads), jnp.float32),   # running sum
            pltpu.VMEM((bq, C), jnp.float32),           # output acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * qp.shape[1] * kp.shape[1] * C,
            bytes_accessed=(qp.size + (kp.size + vp.size) * n_q
                            + qp.size) * qp.dtype.itemsize,
            transcendentals=B * qp.shape[1] * kp.shape[1] * num_heads,
        ),
        interpret=_INTERPRET,
    )(qp, kp, vp)
    return out[:, :T, :]


#: below this token count XLA's plain einsum attention wins: measured on
#: v5e at the bench flagship (64px UNet, attn maps 8x8/4x4, bf16 batch
#: 512) the sampler runs 86.4 imgs/s with XLA attention vs 76.2 with the
#: flash kernel — tiny score matrices don't amortize the kernel's
#: blockwise-softmax machinery, and XLA batches them onto the MXU well.
#: The floor moved 2048 -> 1024 with the round-4 kernel (fold-scale /
#: f32-PV / 512-2048 blocks): at T=1024 C=128 H=4 B=512 bf16 the kernel
#: measures 36.6 ms vs 77.2 ms for the XLA einsum (2.1x); at T=256 the
#: standalone margin shrinks to 1.2x and in-situ XLA fusion with
#: neighbors historically wins, so tiny maps stay on the einsum path.
_PALLAS_MIN_TOKENS = 1024


def _use_pallas_auto(T: int, d: int, num_heads: int = 1) -> bool:
    """Auto rule: flash kernel only where it earns its keep (large token
    counts whose [T, T] scores XLA would materialize), and only when one
    program's blocks + scratch fit VMEM.  K/V stream, so the bound no
    longer scales with T."""
    if not _HAS_PALLAS or T < _PALLAS_MIN_TOKENS:
        return False
    C_pad = -(-(num_heads * d) // _LANE) * _LANE
    bq, bkv = _block_sizes(T)
    vmem = (2 * bq * C_pad          # q block + output block
            + 2 * bkv * C_pad      # k + v blocks
            + bq * C_pad           # acc scratch
            + bq * bkv             # score tile (transient)
            ) * 4
    return vmem < 12 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention(q, k, v, num_heads: int, scale: float, use_pallas: bool):
    """Multi-head attention core on folded [B, T, C] operands."""
    if use_pallas:
        # Select per lowering platform: the Pallas kernel on TPU, the XLA
        # einsum path everywhere else (CPU test meshes, interpreters).
        return jax.lax.platform_dependent(
            q, k, v,
            tpu=functools.partial(_attention_flash, num_heads=num_heads,
                                  scale=scale),
            default=functools.partial(_attention_xla, num_heads=num_heads,
                                      scale=scale),
        )
    return _attention_xla(q, k, v, num_heads=num_heads, scale=scale)


def _attention_xla(q, k, v, num_heads: int, scale: float):
    B = q.shape[0]
    out = attention_reference(
        _split_heads(q, num_heads), _split_heads(k, num_heads),
        _split_heads(v, num_heads), scale)
    return _merge_heads(out, B, num_heads)


def _attention_fwd(q, k, v, num_heads: int, scale: float, use_pallas: bool):
    return _attention(q, k, v, num_heads, scale, use_pallas), (q, k, v)


#: largest [BH, T, T] f32 score temp the one-shot backward may allocate;
#: beyond this the backward runs chunked over query blocks.  512 MB keeps
#: the flagship cond-UNet train step (sa6: BH=256, T=4096 would need
#: 3x16 GB one-shot — an instant HBM OOM on v5e) well inside HBM.
_BWD_TEMP_BYTES = 512 * 1024 * 1024


def _attention_bwd(num_heads: int, scale: float, use_pallas: bool, res, g):
    """Recompute-based backward in plain XLA (float32 accumulation).

    One-shot when the [BH, T, T] score temp is small; otherwise a
    flash-style ``lax.scan`` over query blocks: each step recomputes its
    [BH, cq, T] score slab, emits dq for the block, and accumulates
    dk/dv — peak temp bounded by ``_BWD_TEMP_BYTES`` regardless of T.
    """
    qm, km, vm = res
    B = qm.shape[0]
    q = _split_heads(qm, num_heads)
    k = _split_heads(km, num_heads)
    v = _split_heads(vm, num_heads)
    g = _split_heads(g, num_heads)
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
    else:
        # ---- chunked: scan over query blocks -------------------------
        cq = max(_LANE, _BWD_TEMP_BYTES // (4 * BH * T) // _LANE * _LANE)
        cq = min(cq, T)
        t_pad = -(-T // cq) * cq
        # zero-padded q rows give uniform softmax rows but a zero
        # cotangent, so dlogits vanishes and they contribute nothing to
        # dk/dv
        qp = _pad_to(qf, 1, cq).reshape(BH, t_pad // cq, cq, d)
        gp = _pad_to(gf, 1, cq).reshape(BH, t_pad // cq, cq, d)

        def step(carry, xs):
            dk_acc, dv_acc = carry
            qc, gc = xs                                 # [BH, cq, d]
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

    return (_merge_heads(dq.astype(qm.dtype), B, num_heads),
            _merge_heads(dk.astype(km.dtype), B, num_heads),
            _merge_heads(dv.astype(vm.dtype), B, num_heads))


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
    if use_pallas is None:
        use_pallas = _use_pallas_auto(T, d, num_heads)
    return _attention(q, k, v, num_heads, scale, bool(use_pallas))
