from advshadow_tpu.data.dataset import (
    BatchLoader,
    ImageFolderDataset,
    RandomResizedCrop,
    ShadowPairDataset,
    default_transform,
    list_image_folder,
)
from advshadow_tpu.data.sr_dataset import SRDataset

__all__ = [
    "SRDataset",
    "BatchLoader",
    "ImageFolderDataset",
    "RandomResizedCrop",
    "ShadowPairDataset",
    "default_transform",
    "list_image_folder",
]
