from advshadow_tpu.eval.asr import compute_asr, compute_asr_folder, load_folder_images
from advshadow_tpu.eval.fid import (
    activation_statistics,
    compute_fid,
    fid_from_features,
    frechet_distance,
)
from advshadow_tpu.eval.gradcam import grad_cam, make_resnet_cam_fn, show_cam_on_image
from advshadow_tpu.eval.psnr_ssim import batch_psnr_ssim, psnr, ssim

__all__ = [
    "compute_asr",
    "compute_asr_folder",
    "load_folder_images",
    "activation_statistics",
    "compute_fid",
    "fid_from_features",
    "frechet_distance",
    "grad_cam",
    "make_resnet_cam_fn",
    "show_cam_on_image",
    "batch_psnr_ssim",
    "psnr",
    "ssim",
]
