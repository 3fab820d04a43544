"""Diffusion beta schedules.

Pure numpy (float64) schedule construction — schedules are tiny (T ≤ a few
thousand scalars) and are precomputed once on the host, then shipped to the
device as float32 coefficient tables.  Computing them in float64 matches the
reference precision (ref: diff_model.py:269-285 uses torch.float64 betas).

Two families exist in the reference and both are reproduced exactly:

- the "hand-rolled" library (ref: diff_model.py:269-285): ``linear`` is scaled
  by 1000/T, ``cosine`` is the Nichol & Dhariwal schedule built from a T+1
  point linspace.
- the vendored framework (ref: model/samples/base.py:40-85): ``linear`` is an
  unscaled linspace(beta_start, beta_end), ``cosine`` evaluates the alpha-hat
  ratio at (i/T, (i+1)/T), plus ``sqrt_linear`` and ``sqrt`` variants.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "framework_linear_schedule",
    "framework_cosine_schedule",
    "sqrt_linear_schedule",
    "sqrt_schedule",
    "make_beta_schedule",
]


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """Scaled-linear schedule (ref: diff_model.py:269-273)."""
    scale = 1000.0 / timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Nichol-Dhariwal cosine schedule (ref: diff_model.py:275-285)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


def framework_linear_schedule(
    timesteps: int, beta_start: float = 1e-4, beta_end: float = 2e-2
) -> np.ndarray:
    """Unscaled linear schedule (ref: model/samples/base.py:46-49)."""
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def framework_cosine_schedule(timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """Vendored-framework cosine schedule (ref: model/samples/base.py:50-78).

    beta_t = min(1 - alpha_hat(t2)/alpha_hat(t1), max_beta) with
    alpha_hat(t) = cos((t + 0.008)/1.008 * pi/2)^2 evaluated at i/T, (i+1)/T.
    """
    i = np.arange(timesteps, dtype=np.float64)
    t1 = i / timesteps
    t2 = (i + 1) / timesteps

    def alpha_hat(t: np.ndarray) -> np.ndarray:
        return np.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = 1.0 - alpha_hat(t2) / alpha_hat(t1)
    return np.minimum(betas, max_beta)


def sqrt_linear_schedule(
    timesteps: int, beta_start: float = 1e-4, beta_end: float = 2e-2
) -> np.ndarray:
    """linspace(sqrt(start), sqrt(end))**2 (ref: model/samples/base.py:79-80)."""
    return (
        np.linspace(beta_start**0.5, beta_end**0.5, timesteps, dtype=np.float64) ** 2
    )


def sqrt_schedule(
    timesteps: int, beta_start: float = 1e-4, beta_end: float = 2e-2
) -> np.ndarray:
    """linspace(start, end)**0.5 (ref: model/samples/base.py:81-82)."""
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64) ** 0.5


_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "framework_linear": framework_linear_schedule,
    "framework_cosine": framework_cosine_schedule,
    "sqrt_linear": sqrt_linear_schedule,
    "sqrt": sqrt_schedule,
}


def make_beta_schedule(name: str, timesteps: int, **kwargs) -> np.ndarray:
    """Build a beta schedule by name. Raises on unknown names, mirroring
    the reference's ValueError (ref: diff_model.py:298-299)."""
    try:
        fn = _SCHEDULES[name]
    except KeyError:
        raise ValueError(
            f"unknown beta schedule {name!r}; choices: {sorted(_SCHEDULES)}"
        ) from None
    return fn(timesteps, **kwargs)
