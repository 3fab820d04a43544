"""DDPM ancestral samplers as ``lax.scan`` loops.

Two reverse processes exist in the reference and both are provided:

- :func:`ddpm_sample` — the vendored framework's update
  x <- 1/sqrt(a) (x - (1-a)/sqrt(1-abar) eps) + sqrt(beta) z, looping t
  from T-1 down to 1, noise only for t > 1 (ref: model/samples/ddpm.py:42-105).
- :func:`p_sample_loop` — the hand-rolled posterior sampler with
  clip(x0_hat) and exp(0.5 logvar) noise scale, looping t from T-1 down
  to 0, no noise at t == 0 (ref: diff_model.py:385-408).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from advshadow_tpu.core.diffusion import (
    DiffusionCoefficients,
    p_mean_variance,
)
from advshadow_tpu.samplers.base import DenoiseFn

__all__ = ["ddpm_sample", "p_sample_loop"]


def ddpm_sample(
    coeffs: DiffusionCoefficients,
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    shape: Sequence[int],
    return_all: bool = False,
    x_init: jax.Array | None = None,
    step_noise: jax.Array | None = None,
) -> jax.Array:
    """Vendored-framework DDPM reverse process. Returns x in [-1, 1] space
    (callers convert with :func:`advshadow_tpu.ops.image.to_uint8`).
    ``return_all`` stacks every intermediate state [T-1, *shape] — the
    reference's save-image-every-step option
    (ref: model/samples/ddpm.py:90-93) without per-step host syncs.
    ``x_init`` / ``step_noise`` ([T-1, *shape], high-t first) override the
    PRNG draws — the reproducibility hook the golden chain-parity tests
    use to feed the torch reference and this sampler identical noise."""
    T = coeffs.num_timesteps
    n = shape[0]
    if x_init is None:
        rng, init_rng = jax.random.split(rng)
        x_init = jax.random.normal(init_rng, tuple(shape), dtype=jnp.float32)
    ts = jnp.arange(T - 1, 0, -1, dtype=jnp.int32)  # T-1 .. 1
    # per-step noise stays inside the scan by default (no [T, *shape]
    # materialization); injected noise rides as a scan input.
    inputs = (ts, jax.random.split(rng, T - 1)) if step_noise is None \
        else (ts, step_noise)

    def step(x, inp):
        i, nz = inp
        t = jnp.full((n,), i, dtype=jnp.int32)
        eps = denoise_fn(x, t)
        alpha = coeffs.alphas[i]
        alpha_hat = coeffs.alphas_cumprod[i]
        beta = coeffs.betas[i]
        draw = (jax.random.normal(nz, x.shape, x.dtype)
                if step_noise is None else nz)
        noise = jnp.where(i > 1, draw, jnp.zeros_like(x))
        x = (
            1.0 / jnp.sqrt(alpha)
            * (x - ((1 - alpha) / jnp.sqrt(1 - alpha_hat)) * eps)
            + jnp.sqrt(beta) * noise
        )
        return x, (x if return_all else None)

    x, xs = jax.lax.scan(step, x_init, inputs)
    return xs if return_all else x


def p_sample_loop(
    coeffs: DiffusionCoefficients,
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    shape: Sequence[int],
    clip_denoised: bool = True,
    return_all: bool = False,
    x_init: jax.Array | None = None,
    step_noise: jax.Array | None = None,
) -> jax.Array:
    """Hand-rolled posterior sampler (ref: diff_model.py:385-408).
    ``return_all`` returns the whole trajectory like the reference's
    ``imgs`` list (without its per-step ``.cpu()`` sync, diff_model.py:407).
    ``x_init`` / ``step_noise`` ([T, *shape], high-t first) override the
    PRNG draws (golden-parity / reproducibility hook)."""
    T = coeffs.num_timesteps
    n = shape[0]
    if x_init is None:
        rng, init_rng = jax.random.split(rng)
        x_init = jax.random.normal(init_rng, tuple(shape), dtype=jnp.float32)
    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)  # T-1 .. 0
    inputs = (ts, jax.random.split(rng, T)) if step_noise is None \
        else (ts, step_noise)

    def step(x, inp):
        i, nz = inp
        t = jnp.full((n,), i, dtype=jnp.int32)
        eps = denoise_fn(x, t)
        mean, _, log_var = p_mean_variance(coeffs, x, t, eps, clip_denoised)
        noise = (jax.random.normal(nz, x.shape, x.dtype)
                 if step_noise is None else nz)
        nonzero = (i != 0).astype(x.dtype)
        x = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        return x, (x if return_all else None)

    x, xs = jax.lax.scan(step, x_init, inputs)
    return xs if return_all else x
