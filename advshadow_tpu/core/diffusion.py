"""Gaussian diffusion process as pure functions over a coefficient table.

TPU-first design: all per-timestep coefficients are precomputed in float64 on
the host (matching the reference's float64 schedule math, ref:
diff_model.py:286-331) and stored as a single frozen pytree of float32 device
arrays.  Every process function is a pure ``f(coeffs, ...) -> array`` that
jit/vmap/grad compose over; indexing a coefficient at timestep ``t`` is a
gather that XLA fuses into the surrounding elementwise work.

Images are NHWC and diffusion state lives in [-1, 1].
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from advshadow_tpu.core import schedules as _schedules

__all__ = ["DiffusionCoefficients", "make_diffusion", "q_sample", "q_posterior",
           "predict_x0_from_noise", "p_mean_variance", "mse_eps_loss"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionCoefficients:
    """Precomputed diffusion chain coefficients, one entry per timestep.

    Mirrors the closed-form quantities the reference precomputes
    (ref: diff_model.py:300-331), stored as jnp arrays so the whole struct
    can be closed over or passed through jit boundaries.
    """

    betas: jax.Array
    alphas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_diffusion(
    timesteps: int = 1000,
    beta_schedule: str = "cosine",
    dtype: jnp.dtype = jnp.float32,
    **schedule_kwargs,
) -> DiffusionCoefficients:
    """Build the coefficient table (float64 host math, then cast).

    ``beta_schedule`` accepts every name in
    :func:`advshadow_tpu.core.schedules.make_beta_schedule`.
    """
    betas = _schedules.make_beta_schedule(beta_schedule, timesteps, **schedule_kwargs)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    posterior_variance = (
        betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    )
    # The reference substitutes variance[1] for the zero variance at t=0
    # instead of clamping (ref: diff_model.py:320-322); match that exactly.
    posterior_log_variance_clipped = np.log(
        np.concatenate([posterior_variance[1:2], posterior_variance[1:]])
    )

    as_dev = lambda a: jnp.asarray(a, dtype=dtype)
    return DiffusionCoefficients(
        betas=as_dev(betas),
        alphas=as_dev(alphas),
        alphas_cumprod=as_dev(alphas_cumprod),
        alphas_cumprod_prev=as_dev(alphas_cumprod_prev),
        sqrt_alphas_cumprod=as_dev(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_dev(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=as_dev(posterior_variance),
        posterior_log_variance_clipped=as_dev(posterior_log_variance_clipped),
        posterior_mean_coef1=as_dev(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=as_dev(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
    )


def _extract(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep coefficients and broadcast to an ``ndim`` tensor.

    ``t`` is an integer array of shape [batch] (or scalar); result has shape
    [batch, 1, ..., 1] so it broadcasts against NHWC images.
    (ref: diff_model.py:334-338)
    """
    out = jnp.take(table, t, axis=0)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_sample(
    coeffs: DiffusionCoefficients,
    x_start: jax.Array,
    t: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """Forward process: x_t = sqrt(abar_t) x_0 + sqrt(1-abar_t) eps.
    (ref: diff_model.py:340-347, model/samples/base.py:87-99)"""
    return (
        _extract(coeffs.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + _extract(coeffs.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def q_posterior(
    coeffs: DiffusionCoefficients,
    x_start: jax.Array,
    x_t: jax.Array,
    t: jax.Array,
):
    """Posterior q(x_{t-1} | x_t, x_0) mean / variance / clipped log-variance.
    (ref: diff_model.py:356-363)"""
    mean = (
        _extract(coeffs.posterior_mean_coef1, t, x_t.ndim) * x_start
        + _extract(coeffs.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    variance = _extract(coeffs.posterior_variance, t, x_t.ndim)
    log_variance = _extract(coeffs.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, variance, log_variance


def predict_x0_from_noise(
    coeffs: DiffusionCoefficients,
    x_t: jax.Array,
    t: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """Invert q_sample: x_0 = sqrt(1/abar_t) x_t - sqrt(1/abar_t - 1) eps.
    (ref: diff_model.py:366-370)"""
    return (
        _extract(coeffs.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - _extract(coeffs.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def p_mean_variance(
    coeffs: DiffusionCoefficients,
    x_t: jax.Array,
    t: jax.Array,
    pred_noise: jax.Array,
    clip_denoised: bool = True,
):
    """Model posterior p(x_{t-1} | x_t) stats given predicted noise.
    (ref: diff_model.py:373-382)"""
    x_recon = predict_x0_from_noise(coeffs, x_t, t, pred_noise)
    if clip_denoised:
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
    return q_posterior(coeffs, x_recon, x_t, t)


def mse_eps_loss(noise: jax.Array, pred_noise: jax.Array) -> jax.Array:
    """Plain epsilon-prediction MSE (ref: diff_model.py:477-484)."""
    return jnp.mean(jnp.square(pred_noise.astype(jnp.float32) - noise.astype(jnp.float32)))


def sample_timesteps(
    rng: jax.Array, batch: int, num_timesteps: int, low: int = 1
) -> jax.Array:
    """Uniform timestep draw in [low, T). The vendored framework uses low=1
    (ref: model/samples/base.py:101-109); the hand-rolled trainer uses low=0
    (ref: diff_model.py:561)."""
    return jax.random.randint(rng, (batch,), low, num_timesteps)
