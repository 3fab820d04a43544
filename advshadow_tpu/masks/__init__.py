from advshadow_tpu.masks.extract import (
    combine_detection_masks,
    extract_and_save_masks,
    grabcut_refine,
    make_jax_maskrcnn_detector,
    make_opencv_maskrcnn_detector,
    process_image,
    saliency_rect_detector,
)
from advshadow_tpu.masks.maskrcnn import (
    Detections,
    MaskRCNN,
    MaskRCNNConfig,
    detections_to_opencv,
)
from advshadow_tpu.masks.tools import (
    auto_label_folder,
    label_json_from_filenames,
    pick_images_and_masks,
    resize_images_in_folder,
)

__all__ = [
    "Detections",
    "MaskRCNN",
    "MaskRCNNConfig",
    "detections_to_opencv",
    "combine_detection_masks",
    "extract_and_save_masks",
    "grabcut_refine",
    "make_jax_maskrcnn_detector",
    "make_opencv_maskrcnn_detector",
    "process_image",
    "saliency_rect_detector",
    "auto_label_folder",
    "label_json_from_filenames",
    "pick_images_and_masks",
    "resize_images_in_folder",
]
