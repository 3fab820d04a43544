from advshadow_tpu.samplers.base import (
    framework_time_pairs,
    make_denoise_fn,
)
from advshadow_tpu.samplers.ddim import (
    ddim_sample,
    ddim_sample_framework,
    ddim_timestep_sequence,
)
from advshadow_tpu.samplers.ddpm import ddpm_sample, p_sample_loop
from advshadow_tpu.samplers.dpm import dpmpp2m_sample, dpmpp2m_sde_sample
from advshadow_tpu.samplers.plms import plms_sample

#: Sampler registry — the working equivalent of the reference's missing
#: ``config.choices`` sampler list (ref: utils/initializer.py:158-175),
#: plus the beyond-reference DPM-Solver++(2M) fast sampler.
SAMPLERS = {
    "ddpm": ddpm_sample,
    "ddim": ddim_sample_framework,
    "plms": plms_sample,
    "dpmpp": dpmpp2m_sample,
    "dpmpp_sde": dpmpp2m_sde_sample,
}


def make_sampler(name: str):
    try:
        return SAMPLERS[name]
    except KeyError:
        raise ValueError(f"unknown sampler {name!r}; choices: {sorted(SAMPLERS)}")


__all__ = [
    "framework_time_pairs",
    "make_denoise_fn",
    "ddim_sample",
    "ddim_sample_framework",
    "ddim_timestep_sequence",
    "ddpm_sample",
    "dpmpp2m_sample",
    "dpmpp2m_sde_sample",
    "p_sample_loop",
    "plms_sample",
    "SAMPLERS",
    "make_sampler",
]
