"""Microbenchmark: flash-attention kernel variants at the flagship hot shape.

The flagship-128 profile (SUITE_r04.json sampler_top_ops) shows one Pallas
attention call (cond-UNet sa6: T=16384, C=64, H=4, d=16) eating 15.3s of the
20.3s DDIM-50 generate phase.  At d=16 the matmuls are trivial; the kernel is
bound by per-score-element VPU work.  This bench measures variants that shave
those ops:

  v0  current ops.attention kernel (baseline)
  v1  fold scale*log2e into the q load; PV in f32 (drop the p->bf16 convert)
  v2  v1 + row-sum on the MXU (p->bf16 once, dot with a ones matrix)
  v4  v1 with 512/2048 blocks (fewer programs / per-row rescales)

Run ON THE REAL TPU: python experiments/flashbench_v2.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from advshadow_tpu.ops import attention as A

LOG2E = 1.4426950408889634


def _variant_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                    num_heads, head_dim, t_actual, n_kv, scale, variant):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    c = scale * scale * LOG2E
    # fold the whole scalar into q at load: one multiply per [BQ, C]
    # element instead of one per [BQ, BKV] score element
    q = (q_ref[0].astype(jnp.float32) * c).astype(q_ref.dtype)
    k = k_ref[0]
    if variant == "v2":
        v = v_ref[0]
        ones = jnp.ones((k.shape[0], 8), dtype=v.dtype)
    else:
        v = v_ref[0].astype(jnp.float32)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_prev = m_ref[:, h]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new[:, None])
        if variant == "v2":
            p = p.astype(v.dtype)
            lsum = jax.lax.dot_general(
                p, ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:, 0]
        else:
            lsum = jnp.sum(p, axis=-1)
        l_ref[:, h] = l_ref[:, h] * alpha + lsum
        pv = jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:, sl] = acc_ref[:, sl] * alpha[:, None] + pv
        m_ref[:, h] = m_new

    @pl.when(j == n_kv - 1)
    def _finalize():
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            o_ref[0, :, sl] = (
                acc_ref[:, sl] / l_ref[:, h][:, None]).astype(o_ref.dtype)


def flash_variant(q, k, v, num_heads, scale, variant, bq, bkv):
    B, T, C = q.shape
    d = C // num_heads
    assert T % bq == 0 and T % bkv == 0
    n_q, n_kv = T // bq, T // bkv
    return pl.pallas_call(
        functools.partial(_variant_kernel, num_heads=num_heads, head_dim=d,
                          t_actual=T, n_kv=n_kv, scale=scale, variant=variant),
        out_shape=jax.ShapeDtypeStruct((B, T, C), q.dtype),
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
            pltpu.VMEM((bq, num_heads), jnp.float32),
            pltpu.VMEM((bq, num_heads), jnp.float32),
            pltpu.VMEM((bq, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T * T * C,
            bytes_accessed=(q.size + (k.size + v.size) * n_q + q.size
                            ) * q.dtype.itemsize,
            transcendentals=B * T * T * num_heads,
        ),
    )(q, k, v)


def _fusedqk_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                    num_heads, head_dim, t_actual, n_kv, scale):
    """Round-4 verdict #8 probe: ONE padded d=C QK^T pass for all heads.

    K is tiled in VMEM into [H*BKV, C] with block h carrying only its
    head's channels (zeros elsewhere), so a single [BQ, C] x [C, H*BKV]
    matmul emits every head's scores side by side — trading 4x MXU
    padding (3/4 of each contraction is zeros) for stream count (one
    systolic pass instead of H).  Softmax/PV bookkeeping identical to
    the production kernel, per head on static column slices.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = (q_ref[0].astype(jnp.float32) * (scale * scale * LOG2E)
         ).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0].astype(jnp.float32)
    bq, bkv = q.shape[0], k.shape[0]
    C = q.shape[1]
    # VMEM head-tiling of K: block h = k masked to its channel slice
    ch = jax.lax.broadcasted_iota(jnp.int32, (bkv, C), 1)
    k_tiled = jnp.concatenate(
        [jnp.where((ch >= h * head_dim) & (ch < (h + 1) * head_dim), k, 0)
         for h in range(num_heads)], axis=0)       # [H*BKV, C]
    s_all = jax.lax.dot_general(
        q, k_tiled, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [BQ, H*BKV]
    masked = t_actual < n_kv * bkv
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
        invalid = col >= t_actual

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = s_all[:, h * bkv:(h + 1) * bkv]
        if masked:
            s = jnp.where(invalid, -jnp.inf, s)
        m_prev = m_ref[:, h]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new[:, None])
        l_ref[:, h] = l_ref[:, h] * alpha + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:, sl] = acc_ref[:, sl] * alpha[:, None] + pv
        m_ref[:, h] = m_new

    @pl.when(j == n_kv - 1)
    def _finalize():
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            o_ref[0, :, sl] = (
                acc_ref[:, sl] / l_ref[:, h][:, None]
            ).astype(o_ref.dtype)


def fused_qk_attention(q, k, v, num_heads, scale, bq=256, bkv=512):
    """pallas_call wrapper for the fused-QK probe (small blocks: the
    [BQ, H*BKV] f32 score strip must fit VMEM alongside k_tiled)."""
    B, T, C = q.shape
    d = C // num_heads
    qp = A._pad_to(q, 1, bq)
    kp = A._pad_to(k, 1, bkv)
    vp = A._pad_to(v, 1, bkv)
    n_q, n_kv = qp.shape[1] // bq, kp.shape[1] // bkv
    return pl.pallas_call(
        functools.partial(_fusedqk_kernel, num_heads=num_heads,
                          head_dim=d, t_actual=T, n_kv=n_kv, scale=scale),
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
            pltpu.VMEM((bq, num_heads), jnp.float32),
            pltpu.VMEM((bq, num_heads), jnp.float32),
            pltpu.VMEM((bq, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=A._INTERPRET,
    )(qp, kp, vp)[:, :T]


def probe_fused_qk():
    """Bounded round-4 verdict #8 experiment at the sa6 hot shape.

    Structural prediction (module docstring of ops/attention.py): the
    kernel is bound by score egress through the MXU; a [BQ, C=64] x
    [C, H*BKV] pass emits the SAME B*H*T^2 score elements as H d=16
    passes and both round up to one 128-deep systolic pass per output
    tile, so fusing buys nothing and pays extra VPU tiling work +
    smaller blocks.  Measured here either way — the kernel's final word.

    MEASURED (round 5, v5e, xplane device self time at the shape below):
    v0 per-head 52.2 ms vs fused-qk(bq=256,bkv=1024) 61.0 ms —
    fused is 1.17x SLOWER, exactly the predicted shape (same score
    egress; the VMEM K-tiling and the smaller blocks the [BQ, H*BKV]
    f32 score strip forces are pure overhead).  Wall-clock grid:
    83.4 ms at 256/1024, 164-200 ms at 512-wide strips.  The production
    kernel stands; this avenue is closed permanently.
    """
    from advshadow_tpu.utils.runtime import runtime_init
    runtime_init()
    B, T, C, H = 16, 16384, 64, 4
    scale = (C // H) ** -0.25
    elems = B * H * T * T

    def make_args(seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        return tuple(jax.random.normal(kk, (B, T, C), jnp.float32)
                     .astype(jnp.bfloat16) for kk in ks)

    ref = make_args(123)
    f0 = jax.jit(lambda q, k, v: A._attention_flash(q, k, v, H, scale))
    t0, _ = bench(f0, make_args)
    base = np.asarray(f0(*ref), np.float32)
    print(f"v0 per-head (prod): {t0*1e3:8.1f} ms "
          f"{elems/t0/1e9:7.1f} G elem/s")
    for bq, bkv in ((256, 512), (256, 1024), (512, 512)):
        f = jax.jit(lambda q, k, v, _bq=bq, _bkv=bkv:
                    fused_qk_attention(q, k, v, H, scale, _bq, _bkv))
        try:
            t, _ = bench(f, make_args)
        except Exception as e:
            print(f"fused-qk bq={bq} bkv={bkv}: FAILED {repr(e)[:120]}")
            continue
        err = np.max(np.abs(np.asarray(f(*ref), np.float32) - base))
        print(f"fused-qk bq={bq:4d} bkv={bkv:4d}: {t*1e3:8.1f} ms  "
              f"{elems/t/1e9:7.1f} G elem/s  x{t0/t:.2f} vs v0  "
              f"max|diff|={err:.2e}")


def bench(fn, make_args, reps=5):
    # fresh inputs each rep: the axon runtime short-circuits identical
    # (program, args) executions (CLAUDE.md)
    ts = []
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    for r in range(1, reps + 1):
        args = make_args(r)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    from advshadow_tpu.utils.runtime import runtime_init
    runtime_init()
    B, T, C, H = 16, 16384, 64, 4
    d = C // H
    scale = d ** -0.25
    elems = B * H * T * T

    def make_args(seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        return tuple(
            (jax.random.normal(kk, (B, T, C), jnp.float32)).astype(jnp.bfloat16)
            for kk in ks)

    ref_q, ref_k, ref_v = make_args(123)

    f0 = jax.jit(lambda q, k, v: A._attention_flash(q, k, v, H, scale))
    t0, out0 = bench(f0, make_args)
    print(f"v0 current : {t0*1e3:8.1f} ms  {elems/t0/1e9:7.1f} G elem/s  "
          f"{4*B*T*T*C/t0/1e12:5.1f} TF/s-equiv")
    base = np.asarray(f0(ref_q, ref_k, ref_v), np.float32)

    for variant, bq, bkv in [("v1", 256, 1024), ("v2", 256, 1024),
                             ("v1", 512, 2048), ("v2", 512, 2048),
                             ("v2", 512, 1024), ("v1", 256, 2048)]:
        f = jax.jit(lambda q, k, v, _v=variant, _bq=bq, _bkv=bkv:
                    flash_variant(q, k, v, H, scale, _v, _bq, _bkv))
        t, out = bench(f, make_args)
        got = np.asarray(f(ref_q, ref_k, ref_v), np.float32)
        err = np.max(np.abs(got - base))
        print(f"{variant} bq={bq:4d} bkv={bkv:4d}: {t*1e3:8.1f} ms  "
              f"{elems/t/1e9:7.1f} G elem/s  {4*B*T*T*C/t/1e12:5.1f} TF/s-equiv"
              f"  max|diff vs v0|={err:.2e}")


if __name__ == "__main__" and "fused" in sys.argv[1:]:
    probe_fused_qk()
elif __name__ == "__main__":
    main()
