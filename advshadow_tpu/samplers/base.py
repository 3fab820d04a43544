"""Sampler shared machinery.

Samplers are pure functions ``sample(coeffs, denoise_fn, rng, shape) -> x``
running as a single ``lax.scan`` over precomputed per-step index tables —
no Python loop, no per-step host syncs (the reference pulls every step to
host, ref: diff_model.py:405-407).  The denoise function signature is
``fn(x, t) -> eps`` with conditioning and CFG already closed over.

Classifier-free guidance is a *single fused 2N-batch forward*: conditional
and unconditional rows are concatenated so the MXU sees one big batch
instead of two sequential N-batch forwards (mathematically identical to
the reference's two calls + torch.lerp, ref: model/samples/ddpm.py:62-74).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DenoiseFn", "make_denoise_fn", "framework_time_pairs"]

DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def make_denoise_fn(
    apply_fn: Callable,
    params,
    labels: Optional[jax.Array] = None,
    cfg_scale: Optional[float] = None,
    cfg_rescale: float = 0.0,
    cfg_interval: Optional[tuple] = None,
) -> DenoiseFn:
    """Close a Flax apply over params/labels/CFG into ``fn(x, t) -> eps``.

    - labels None, cfg None  -> unconditional forward
    - labels set,  cfg None/0 -> conditional forward (no guidance)
    - labels set,  cfg > 0    -> fused 2N CFG forward,
      eps = lerp(uncond, cond, cfg_scale)  (ref: model/samples/ddpm.py:70-74)

    Guidance fixes for the fast-sampler path (beyond-reference; both are
    no-ops at their defaults and compose with any sampler):

    - ``cfg_rescale`` in [0, 1]: guidance rescale (Lin et al. 2023,
      2305.08891 eq. 15-16).  Per-sample, the guided prediction's std over
      pixels is shrunk back to the conditional prediction's std, then
      lerped with the unrescaled guidance by ``cfg_rescale``.  Counters
      the overexposure/saturation large CFG induces — the failure mode
      that makes deterministic DPM-Solver++ unusable at CFG 3.
    - ``cfg_interval`` = (t_lo, t_hi): guidance interval (Kynkäänniemi et
      al. 2024, 2404.07724).  Guidance is applied only for timesteps in
      [t_lo, t_hi]; outside, the plain conditional prediction is used.
      Restricting CFG to mid-noise levels removes its harmful effect at
      the trajectory's ends.
    """

    if labels is None:
        def fn(x: jax.Array, t: jax.Array) -> jax.Array:
            return apply_fn(params, x, t)
        return fn

    if not cfg_scale:
        def fn(x: jax.Array, t: jax.Array) -> jax.Array:
            return apply_fn(params, x, t, labels)
        return fn

    def fn(x: jax.Array, t: jax.Array) -> jax.Array:
        n = x.shape[0]
        null = jnp.full((n,), -1, dtype=jnp.int32)
        y2 = jnp.concatenate([labels.astype(jnp.int32), null])
        x2 = jnp.concatenate([x, x])
        t2 = jnp.concatenate([t, t])
        eps2 = apply_fn(params, x2, t2, y2)
        cond, uncond = eps2[:n], eps2[n:]
        guided = uncond + cfg_scale * (cond - uncond)
        if cfg_rescale:
            axes = tuple(range(1, guided.ndim))
            std_cond = jnp.std(cond, axis=axes, keepdims=True)
            std_cfg = jnp.std(guided, axis=axes, keepdims=True)
            rescaled = guided * (std_cond / jnp.maximum(std_cfg, 1e-8))
            guided = cfg_rescale * rescaled + (1.0 - cfg_rescale) * guided
        if cfg_interval is not None:
            t_lo, t_hi = cfg_interval
            gate = ((t >= t_lo) & (t <= t_hi)).reshape(
                (-1,) + (1,) * (guided.ndim - 1))
            guided = jnp.where(gate, guided, cond)
        return guided

    return fn


def framework_time_pairs(noise_steps: int, sample_steps: int) -> np.ndarray:
    """(t, t_prev) pairs of the vendored DDIM/PLMS stride
    (ref: model/samples/ddim.py:44-46): arange(0, T, T//S)+1 with a
    prepended 0, reversed, zipped into consecutive pairs.  Returns an
    int32 array of shape [num_pairs, 2] ordered from high t to low.
    """
    seq = np.arange(0, noise_steps, noise_steps // sample_steps, dtype=np.int64) + 1
    seq = np.concatenate([[0], seq])[::-1]
    return np.stack([seq[:-1], seq[1:]], axis=1).astype(np.int32)
