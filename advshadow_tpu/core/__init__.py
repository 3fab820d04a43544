from advshadow_tpu.core.diffusion import (
    DiffusionCoefficients,
    make_diffusion,
    mse_eps_loss,
    p_mean_variance,
    predict_x0_from_noise,
    q_posterior,
    q_sample,
    sample_timesteps,
)
from advshadow_tpu.core.schedules import make_beta_schedule

__all__ = [
    "DiffusionCoefficients",
    "make_diffusion",
    "mse_eps_loss",
    "p_mean_variance",
    "predict_x0_from_noise",
    "q_posterior",
    "q_sample",
    "sample_timesteps",
    "make_beta_schedule",
]
