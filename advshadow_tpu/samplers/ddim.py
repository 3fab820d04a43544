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

__all__ = ["ddim_sample", "ddim_sample_framework", "ddim_timestep_sequence",
           "boundary_times"]


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


def boundary_times(
    alphas_cumprod: np.ndarray, timesteps: int, sample_steps: int,
    method: str,
) -> np.ndarray:
    """Descending N+1 timestep boundaries (ending at 0), all grid methods.

    ``uniform``/``quad`` reuse the reference's DDIM stride
    (ref: diff_model.py:427-438).  Two spacings beyond the reference
    target the few-step regime, where *where* a sampler spends its steps
    dominates quality (shared by DDIM and DPM-Solver++):

    - ``logsnr``: boundaries uniform in lambda = log(alpha/sigma)
      (Lu et al. 2206.00927 Sec. 3.3's recommended grid) — equal
      solver-space intervals, so the 2M coefficient c_i = 1/2 everywhere.
    - ``karras``: boundaries uniform in the EDM noise scale
      sigma_edm^(1/rho), rho = 7 (Karras et al. 2206.00364 eq. 5),
      mapped to the discrete t grid by nearest lambda — concentrates
      steps near the clean-data end.
    """
    if method in ("uniform", "quad"):
        seq = ddim_timestep_sequence(timesteps, sample_steps, method)
        return np.concatenate([seq[::-1], [0]]).astype(np.int64)
    abar = np.asarray(alphas_cumprod, np.float64)
    lam = 0.5 * (np.log(abar) - np.log1p(-abar))  # monotone decreasing in t
    t_hi = timesteps - 1
    if method == "logsnr":
        target = np.linspace(lam[t_hi], lam[0], sample_steps + 1)
    elif method == "karras":
        rho = 7.0
        sig = np.exp(-lam)                        # EDM sigma = sigma/alpha
        grid = np.linspace(sig[t_hi] ** (1 / rho), sig[0] ** (1 / rho),
                           sample_steps + 1)
        target = -np.log(grid**rho)
    else:
        raise NotImplementedError(
            f'There is no discretization method called "{method}"')
    return np.abs(lam[None, :] - target[:, None]).argmin(axis=1)


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
    ``x_init`` overrides the PRNG initial draw (golden-parity hook).
    ``method`` accepts the reference's ``uniform``/``quad`` strides plus
    the beyond-reference few-step grids ``logsnr``/``karras`` (see
    :func:`boundary_times`) — measured on the trained flagship, the
    non-uniform grids change few-step guided FID materially
    (artifacts/real_run/dpm_quality.json)."""
    times = boundary_times(np.asarray(coeffs.alphas_cumprod),
                           coeffs.num_timesteps, ddim_timesteps, method)
    times = -np.unique(-times)  # dedup: nearest-t grids can repeat steps
    ts = jnp.asarray(times[:-1], dtype=jnp.int32)
    prev_ts = jnp.asarray(times[1:], dtype=jnp.int32)

    rng, init_rng = jax.random.split(rng)
    x0 = x_init if x_init is not None else jax.random.normal(
        init_rng, tuple(shape), dtype=jnp.float32)
    step_rngs = jax.random.split(rng, int(ts.shape[0]))

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
    method: str = "framework",
) -> jax.Array:
    """Vendored-framework DDIM (ref: model/samples/ddim.py:20-100).
    ``x_init`` overrides the PRNG initial draw (golden-parity hook).
    ``method="framework"`` (default) keeps the reference's (t, t_prev)
    pair stride; ``uniform``/``quad``/``logsnr``/``karras`` select the
    shared :func:`boundary_times` grids instead (the non-uniform grids
    are the beyond-reference few-step option, same as the dpmpp
    samplers')."""
    if method == "framework":
        pairs = framework_time_pairs(coeffs.num_timesteps, sample_steps)
        ts = jnp.asarray(pairs[:, 0])
        prev_ts = jnp.asarray(pairs[:, 1])
    else:
        times = boundary_times(np.asarray(coeffs.alphas_cumprod),
                               coeffs.num_timesteps, sample_steps, method)
        times = -np.unique(-times)  # dedup: nearest-t grids repeat steps
        ts = jnp.asarray(times[:-1], dtype=jnp.int32)
        prev_ts = jnp.asarray(times[1:], dtype=jnp.int32)

    rng, init_rng = jax.random.split(rng)
    x0 = x_init if x_init is not None else jax.random.normal(
        init_rng, tuple(shape), dtype=jnp.float32)
    step_rngs = jax.random.split(rng, int(ts.shape[0]))

    def step(x, inp):
        t, t_prev, key = inp
        x = _ddim_step(coeffs, denoise_fn, x, t, t_prev, key, eta, clip_denoised)
        return x, None

    x, _ = jax.lax.scan(step, x0, (ts, prev_ts, step_rngs))
    return x
