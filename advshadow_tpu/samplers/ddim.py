"""DDIM samplers as ``lax.scan`` loops.

- :func:`ddim_sample` — the hand-rolled version with uniform/quad stride,
  eta-scaled variance and clip(x0_hat) (ref: diff_model.py:416-474).
- :func:`ddim_sample_framework` — the vendored version with the
  (t, t_prev)-pair stride and eta = 0 (ref: model/samples/ddim.py:20-100).

Both share the formula-(12) update:
  x_prev = sqrt(abar_prev) x0_hat + sqrt(1 - abar_prev - sigma^2) eps + sigma z
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from advshadow_tpu.core.diffusion import DiffusionCoefficients
from advshadow_tpu.samplers.base import DenoiseFn, framework_time_pairs

__all__ = ["ddim_sample", "ddim_sample_framework", "ddim_timestep_sequence"]


def ddim_timestep_sequence(
    timesteps: int, ddim_timesteps: int, method: str = "uniform"
) -> np.ndarray:
    """Strided timestep sequence (+1 shift) (ref: diff_model.py:427-438)."""
    if method == "uniform":
        c = timesteps // ddim_timesteps
        seq = np.asarray(list(range(0, timesteps, c)))
    elif method == "quad":
        seq = (np.linspace(0, np.sqrt(timesteps * 0.8), ddim_timesteps) ** 2).astype(int)
    else:
        raise NotImplementedError(
            f'There is no ddim discretization method called "{method}"'
        )
    return seq + 1


def _ddim_step(coeffs, denoise_fn, x, t, t_prev, key, eta, clip_denoised):
    n = x.shape[0]
    tb = jnp.full((n,), t, dtype=jnp.int32)
    abar_t = coeffs.alphas_cumprod[t]
    abar_prev = coeffs.alphas_cumprod[t_prev]
    eps = denoise_fn(x, tb)

    x0 = (x - jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(abar_t)
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)

    sigma = eta * jnp.sqrt(
        (1 - abar_prev) / (1 - abar_t) * (1 - abar_t / abar_prev)
    )
    dir_xt = jnp.sqrt(1.0 - abar_prev - sigma**2) * eps
    noise = jax.random.normal(key, x.shape, x.dtype)
    return jnp.sqrt(abar_prev) * x0 + dir_xt + sigma * noise


def ddim_sample(
    coeffs: DiffusionCoefficients,
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    shape: Sequence[int],
    ddim_timesteps: int = 50,
    method: str = "uniform",
    eta: float = 0.0,
    clip_denoised: bool = True,
    x_init: jax.Array | None = None,
) -> jax.Array:
    """Hand-rolled DDIM (ref: diff_model.py:416-474). Returns [-1,1] floats.
    ``x_init`` overrides the PRNG initial draw (golden-parity hook)."""
    seq = ddim_timestep_sequence(coeffs.num_timesteps, ddim_timesteps, method)
    prev_seq = np.concatenate([[0], seq[:-1]])
    ts = jnp.asarray(seq[::-1].copy(), dtype=jnp.int32)
    prev_ts = jnp.asarray(prev_seq[::-1].copy(), dtype=jnp.int32)

    rng, init_rng = jax.random.split(rng)
    x0 = x_init if x_init is not None else jax.random.normal(
        init_rng, tuple(shape), dtype=jnp.float32)
    step_rngs = jax.random.split(rng, len(seq))

    def step(x, inp):
        t, t_prev, key = inp
        x = _ddim_step(coeffs, denoise_fn, x, t, t_prev, key, eta, clip_denoised)
        return x, None

    x, _ = jax.lax.scan(step, x0, (ts, prev_ts, step_rngs))
    return x


def ddim_sample_framework(
    coeffs: DiffusionCoefficients,
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    shape: Sequence[int],
    sample_steps: int = 500,
    eta: float = 0.0,
    clip_denoised: bool = True,
    x_init: jax.Array | None = None,
) -> jax.Array:
    """Vendored-framework DDIM (ref: model/samples/ddim.py:20-100).
    ``x_init`` overrides the PRNG initial draw (golden-parity hook)."""
    pairs = framework_time_pairs(coeffs.num_timesteps, sample_steps)
    ts = jnp.asarray(pairs[:, 0])
    prev_ts = jnp.asarray(pairs[:, 1])

    rng, init_rng = jax.random.split(rng)
    x0 = x_init if x_init is not None else jax.random.normal(
        init_rng, tuple(shape), dtype=jnp.float32)
    step_rngs = jax.random.split(rng, pairs.shape[0])

    def step(x, inp):
        t, t_prev, key = inp
        x = _ddim_step(coeffs, denoise_fn, x, t, t_prev, key, eta, clip_denoised)
        return x, None

    x, _ = jax.lax.scan(step, x0, (ts, prev_ts, step_rngs))
    return x
