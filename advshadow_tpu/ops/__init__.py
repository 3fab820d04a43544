from advshadow_tpu.ops.attention import spatial_attention
from advshadow_tpu.ops.blur import gaussian_blur, gaussian_kernel_1d
from advshadow_tpu.ops.image import (
    from_uint8,
    image_grid,
    pixel_shuffle,
    resize,
    to_uint8,
)
from advshadow_tpu.ops.sqrtm import sqrtm_newton_schulz, trace_sqrtm_product

__all__ = [
    "spatial_attention",
        "gaussian_blur",
    "gaussian_kernel_1d",
    "from_uint8",
    "image_grid",
    "pixel_shuffle",
    "resize",
    "to_uint8",
    "sqrtm_newton_schulz",
    "trace_sqrtm_product",
]
