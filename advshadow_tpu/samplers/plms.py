"""PLMS (pseudo linear multistep) sampler as a ``lax.scan``.

Re-design of ref: model/samples/plms.py:23-139: an Improved-Euler
bootstrap on the first step (one extra model call), then 2nd/3rd/4th-order
Adams-Bashforth extrapolation over the raw-eps history.  The history is a
fixed [3, ...] array in the scan carry (newest first) and the order switch
is a ``lax.switch`` on the step counter — static shapes throughout.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from advshadow_tpu.core.diffusion import DiffusionCoefficients
from advshadow_tpu.samplers.base import DenoiseFn, framework_time_pairs

__all__ = ["plms_sample"]


def plms_sample(
    coeffs: DiffusionCoefficients,
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    shape: Sequence[int],
    sample_steps: int = 500,
    eta: float = 0.0,
    clip_denoised: bool = True,
    boot_denoise_fn: DenoiseFn | None = None,
    return_all: bool = False,
    x_init: jax.Array | None = None,
) -> jax.Array:
    """Sample with PLMS.  ``boot_denoise_fn`` is used for the bootstrap's
    extra forward; the reference skips CFG there (ref:
    model/samples/plms.py:104-108), so drivers pass the plain conditional
    fn.  Defaults to ``denoise_fn``.  ``x_init`` overrides the PRNG
    initial draw (golden-parity hook).
    """
    if boot_denoise_fn is None:
        boot_denoise_fn = denoise_fn
    pairs = framework_time_pairs(coeffs.num_timesteps, sample_steps)
    ts = jnp.asarray(pairs[:, 0])
    prev_ts = jnp.asarray(pairs[:, 1])
    n = shape[0]

    rng, init_rng = jax.random.split(rng)
    if x_init is None:
        x_init = jax.random.normal(init_rng, tuple(shape), dtype=jnp.float32)
    step_rngs = jax.random.split(rng, pairs.shape[0])

    def update(x, eps, abar_t, abar_prev, noise):
        x0 = (x - eps * jnp.sqrt(1.0 - abar_t)) / jnp.sqrt(abar_t)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        c1 = eta * jnp.sqrt((1 - abar_t / abar_prev) * (1 - abar_prev) / (1 - abar_t))
        c2 = jnp.sqrt((1 - abar_prev) - c1**2)
        return jnp.sqrt(abar_prev) * x0 + c2 * eps + c1 * noise

    def step(carry, inp):
        x, hist, count = carry
        t, t_prev, key = inp
        tb = jnp.full((n,), t, dtype=jnp.int32)
        pb = jnp.full((n,), t_prev, dtype=jnp.int32)
        abar_t = coeffs.alphas_cumprod[t]
        abar_prev = coeffs.alphas_cumprod[t_prev]
        noise = jnp.where(
            t > 1, jax.random.normal(key, x.shape, x.dtype), jnp.zeros_like(x)
        )
        eps = denoise_fn(x, tb)

        def order1(_):
            # Pseudo Improved Euler: probe x_prev with raw eps, average.
            p_x = update(x, eps, abar_t, abar_prev, noise)
            eps_next = boot_denoise_fn(p_x, pb)
            return (eps + eps_next) / 2.0

        def order2(_):
            return (3.0 * eps - hist[0]) / 2.0

        def order3(_):
            return (23.0 * eps - 16.0 * hist[0] + 5.0 * hist[1]) / 12.0

        def order4(_):
            return (
                55.0 * eps - 59.0 * hist[0] + 37.0 * hist[1] - 9.0 * hist[2]
            ) / 24.0

        eps_prime = jax.lax.switch(
            jnp.minimum(count, 3), [order1, order2, order3, order4], None
        )
        x_new = update(x, eps_prime, abar_t, abar_prev, noise)
        hist_new = jnp.concatenate([eps[None], hist[:2]], axis=0)
        return (x_new, hist_new, count + 1), (x_new if return_all else None)

    hist0 = jnp.zeros((3,) + tuple(shape), dtype=jnp.float32)
    (x, _, _), xs = jax.lax.scan(
        step, (x_init, hist0, jnp.int32(0)), (ts, prev_ts, step_rngs)
    )
    return xs if return_all else x
