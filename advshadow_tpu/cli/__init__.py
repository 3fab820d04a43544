"""Command-line entry points.

- ``python -m advshadow_tpu.cli.train``        diffusion training
- ``python -m advshadow_tpu.cli.train_shadow`` shadow-diffusion training
- ``python -m advshadow_tpu.cli.generate``     ckpt-driven generation
- ``python -m advshadow_tpu.cli.evaluate``     ASR / PSNR-SSIM / FID
- ``python -m advshadow_tpu.cli.mask_dataset`` offline mask extraction
- ``python -m advshadow_tpu.cli.deploy``       TCP generation server
- ``python -m advshadow_tpu.cli.distill``      progressive guided
  distillation into few-step CFG-free students (beyond-reference)
"""
