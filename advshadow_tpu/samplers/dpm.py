"""DPM-Solver++(2M) — fast deterministic + SDE samplers (beyond-reference).

The reference ships DDPM / DDIM / PLMS (ref: model/samples/, and the
hand-rolled ``ddim_sample`` at diff_model.py:416-474).  This module adds
the second-order multistep DPM-Solver++ (Lu et al. 2022, 2211.01095) in
the data-prediction ("++") form, which reaches DDIM-50 sample quality in
~15-25 denoiser calls — a direct throughput multiplier for the shadowed
image generation pipeline, since sampling is the dominant phase on v5e
(bench.py: generate ~103 imgs/s vs attack ~313 imgs/s at batch 256).

TPU-native shape: one ``lax.scan`` over per-step coefficient tables
precomputed in float64 on host (same policy as core/schedules.py), the
eps->x0 conversion and the 2M update fused into the scan body; no
per-step host syncs and no data-dependent control flow (the first-order
bootstrap step is the same update with the D1 correction coefficient set
to zero, so the scan body is branch-free).

Update rule (data prediction, multistep 2M), with
``lambda = log(alpha/sigma)``, ``h_i = lambda_i - lambda_{i-1}``:

  D_bar_i = (1 + c_i) x0_i - c_i x0_{i-1},   c_i = h_i / (2 h_{i-1})
  x_i = (sigma_i/sigma_{i-1}) x_{i-1} - alpha_i expm1(-h_i) D_bar_i

(c_1 = 0 recovers the first-order DDIM-like bootstrap step.)

The SDE variant (``sde=True``; SDE-DPM-Solver++(2M), Lu et al. 2211.01095
Sec. 4 / App. E) keeps the *same* multistep combination D_bar but runs the
reverse SDE instead of the probability-flow ODE:

  x_i = (sigma_i/sigma_{i-1}) e^{-h_i} x_{i-1}
        + alpha_i (1 - e^{-2 h_i}) D_bar_i
        + sigma_i sqrt(1 - e^{-2 h_i}) z_i,    z_i ~ N(0, I)

The injected noise re-randomizes the trajectory each step, which is the
standard remedy for the low-frequency saturation the deterministic 2M
update develops under large classifier-free guidance (the paper's CFG=3
operating point) — measured in artifacts/real_run/dpm_quality.json.  Pair
with ``cfg_rescale``/``cfg_interval`` in samplers.base.make_denoise_fn
for the guided fast-sampling path.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from advshadow_tpu.core.diffusion import DiffusionCoefficients
from advshadow_tpu.samplers.base import DenoiseFn
from advshadow_tpu.samplers.ddim import ddim_timestep_sequence

__all__ = ["dpmpp2m_sample", "dpmpp2m_sde_sample", "dpmpp2m_tables"]


def _boundary_times(
    alphas_cumprod: np.ndarray, timesteps: int, sample_steps: int,
    method: str,
) -> np.ndarray:
    """Descending N+1 timestep boundaries (ending at 0) for the 2M scan.

    ``uniform``/``quad`` reuse the reference's DDIM stride
    (ref: diff_model.py:427-438).  Two spacings beyond the reference
    target the few-step regime, where *where* the solver spends its
    steps dominates quality:

    - ``logsnr``: boundaries uniform in lambda = log(alpha/sigma)
      (Lu et al. 2206.00927 Sec. 3.3's recommended grid) — equal
      solver-space intervals, so the multistep coefficient c_i = 1/2
      everywhere.
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
            f'There is no dpmpp discretization method called "{method}"')
    return np.abs(lam[None, :] - target[:, None]).argmin(axis=1)


def dpmpp2m_tables(
    alphas_cumprod: np.ndarray, timesteps: int, sample_steps: int,
    method: str = "uniform",
):
    """Host-side f64 per-step coefficient tables for the 2M scan.

    Returns int32 ``t`` (denoiser conditioning per step, high -> low) and
    f32 ``alpha_cur, sigma_cur, sigma_ratio, alpha_phi1, c, ratio_sde,
    alpha_phi_sde, noise_sde`` arrays of length ``n_steps`` (boundary grid
    per :func:`_boundary_times`, deduplicated — the quad grid's int cast
    and the nearest-t mapping can repeat timesteps, which would make
    ``h = 0`` and divide the 2M coefficient by zero; after dedup
    ``n_steps`` may be smaller than ``sample_steps``).
    """
    times = _boundary_times(alphas_cumprod, timesteps, sample_steps, method)
    # strictly-decreasing dedup (degenerate grids repeat timesteps)
    times = -np.unique(-times)
    if times.size < 2:
        raise ValueError(
            f"degenerate timestep grid for sample_steps={sample_steps}, "
            f"method={method!r}: fewer than 2 unique boundaries")
    abar = np.asarray(alphas_cumprod, np.float64)[times]
    alpha = np.sqrt(abar)
    sigma = np.sqrt(1.0 - abar)
    lam = np.log(alpha / sigma)
    h = np.diff(lam)  # length N, > 0 (lambda grows toward clean data)
    c = np.zeros_like(h)
    c[1:] = h[1:] / (2.0 * h[:-1])
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return (
        jnp.asarray(times[:-1], jnp.int32),
        f32(alpha[:-1]),
        f32(sigma[:-1]),
        f32(sigma[1:] / sigma[:-1]),
        f32(alpha[1:] * np.expm1(-h)),
        f32(c),
        f32((sigma[1:] / sigma[:-1]) * np.exp(-h)),
        f32(alpha[1:] * -np.expm1(-2.0 * h)),
        f32(sigma[1:] * np.sqrt(-np.expm1(-2.0 * h))),
    )


def dpmpp2m_sample(
    coeffs: DiffusionCoefficients,
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    shape: Sequence[int],
    sample_steps: int = 20,
    method: str = "uniform",
    clip_denoised: bool = True,
    x_init: jax.Array | None = None,
    sde: bool = False,
) -> jax.Array:
    """Sample with DPM-Solver++(2M). Returns x in [-1, 1] space.

    ``sample_steps`` is the number of denoiser calls (15-25 typical).
    ``x_init`` overrides the PRNG initial draw (parity/eval hook).
    ``sde=True`` selects SDE-DPM-Solver++(2M) (ancestral noise each step;
    better under large CFG — see module docstring).
    """
    (ts, alpha_cur, sigma_cur, sigma_ratio, alpha_phi1, c,
     ratio_sde, alpha_phi_sde, noise_sde) = dpmpp2m_tables(
        np.asarray(coeffs.alphas_cumprod), coeffs.num_timesteps,
        sample_steps, method)
    n_steps = ts.shape[0]

    n = shape[0]
    rng, init_rng = jax.random.split(rng)
    x0 = x_init if x_init is not None else jax.random.normal(
        init_rng, tuple(shape), dtype=jnp.float32)
    step_keys = jax.random.split(rng, n_steps)

    def step(carry, inp):
        x, d_prev = carry
        t, a_t, s_t, s_ratio, a_phi, ci, r_sde, a_sde, n_sde, key = inp
        eps = denoise_fn(x, jnp.full((n,), t, dtype=jnp.int32))
        d = (x - s_t * eps) / a_t
        if clip_denoised:
            d = jnp.clip(d, -1.0, 1.0)
        d_bar = (1.0 + ci) * d - ci * d_prev  # ci=0 on the bootstrap step
        if clip_denoised:
            # under CFG the 2M extrapolation can overshoot the data range
            # even when each x0 prediction is clipped; the overshoot
            # accumulates as low-frequency saturation (measured: FID
            # 2.09 -> see dpm_quality.json).  Clip the extrapolated
            # combination to the same range the model was trained on.
            d_bar = jnp.clip(d_bar, -1.0, 1.0)
        if sde:
            z = jax.random.normal(key, x.shape, x.dtype)
            x = r_sde * x + a_sde * d_bar + n_sde * z
        else:
            x = s_ratio * x - a_phi * d_bar
        return (x, d), None

    (x, _), _ = jax.lax.scan(
        step, (x0, jnp.zeros_like(x0)),
        (ts, alpha_cur, sigma_cur, sigma_ratio, alpha_phi1, c,
         ratio_sde, alpha_phi_sde, noise_sde, step_keys))
    return x


def dpmpp2m_sde_sample(
    coeffs: DiffusionCoefficients,
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    shape: Sequence[int],
    sample_steps: int = 20,
    method: str = "uniform",
    clip_denoised: bool = True,
    x_init: jax.Array | None = None,
) -> jax.Array:
    """Registry entry point for SDE-DPM-Solver++(2M) (``--sample dpmpp_sde``)."""
    return dpmpp2m_sample(coeffs, denoise_fn, rng, shape,
                          sample_steps=sample_steps, method=method,
                          clip_denoised=clip_denoised, x_init=x_init,
                          sde=True)
