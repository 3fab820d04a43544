from advshadow_tpu.data.dataset import (
    BatchLoader,
    ImageFolderDataset,
    RandomResizedCrop,
    ShadowPairDataset,
    default_transform,
    list_image_folder,
)

__all__ = [
    "BatchLoader",
    "ImageFolderDataset",
    "RandomResizedCrop",
    "ShadowPairDataset",
    "default_transform",
    "list_image_folder",
]
