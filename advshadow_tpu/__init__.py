"""AdvShadow-TPU: a TPU-native JAX framework for camouflaged adversarial
attacks via conditional-diffusion-generated shadows.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the full
capability surface of the PyTorch reference
``Raineasy/AdvShadow-Camouflaged-Adversarial-Attacks-via-Conditional-Diffusion-
Model-Generated-Shadows``:

- diffusion schedules & processes   (:mod:`advshadow_tpu.core`)
- denoiser networks (UNet families) (:mod:`advshadow_tpu.models`)
- Pallas TPU kernels                (:mod:`advshadow_tpu.ops`)
- DDPM / DDIM / PLMS samplers       (:mod:`advshadow_tpu.samplers`)
- adversarial shadow attacks        (:mod:`advshadow_tpu.attack`)
- victim classifier zoo             (:mod:`advshadow_tpu.victims`)
- data pipeline                     (:mod:`advshadow_tpu.data`)
- training (EMA/CFG/ckpt/mesh)      (:mod:`advshadow_tpu.train`)
- SPMD parallelism                  (:mod:`advshadow_tpu.parallel`)
- evaluation (ASR/PSNR/SSIM/FID)    (:mod:`advshadow_tpu.eval`)
- mask extraction & procedural data (:mod:`advshadow_tpu.masks`)
- serving / CLI                     (:mod:`advshadow_tpu.serve`, ``.cli``)

Conventions (deliberately different from the torch reference):
- images are NHWC (TPU native layout), not NCHW
- diffusion state lives in [-1, 1]; attack/eval pixel space is [0, 1]
- everything in the hot path is jit-compatible: static shapes,
  ``lax.scan``/``lax.cond`` control flow, no per-step host syncs.
"""

__version__ = "0.1.0"
