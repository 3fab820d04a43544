"""Super-resolution dataset — the working equivalent of the reference's
missing ``sr.dataset.SRDataset`` import (broken at ref: utils/utils.py:20,
utils/utils_shadow.py:23; consumed by ``get_sr_dataset`` at
utils/utils.py:164-174).

Yields (lr, hr) pairs in [0, 1]: HR is a random crop of ``image_size``,
LR is the bicubic ``1/scale`` downsample — the standard RDN/SRv1 protocol
(SRv1 upscales x4, ref: model/networks/sr/srv1.py:20).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
from PIL import Image

from advshadow_tpu.data.dataset import IMAGE_EXTENSIONS

__all__ = ["SRDataset"]


class SRDataset:
    def __init__(self, image_size: int, dataset_path: str, scale: int = 4,
                 seed: int = 0):
        assert image_size % scale == 0, "image_size must divide by scale"
        self.image_size = image_size
        self.scale = scale
        self.rng = np.random.default_rng(seed)
        self.paths: List[str] = []
        for root, _, files in os.walk(dataset_path):
            for name in sorted(files):
                if name.lower().endswith(IMAGE_EXTENSIONS):
                    self.paths.append(os.path.join(root, name))

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        size = self.image_size
        with Image.open(self.paths[idx]) as img:
            img = img.convert("RGB")
            w, h = img.size
            if min(w, h) < size:
                ratio = size / min(w, h)
                img = img.resize((max(int(round(w * ratio)), size),
                                  max(int(round(h * ratio)), size)),
                                 Image.BICUBIC)
                w, h = img.size
            x0 = int(self.rng.integers(0, w - size + 1))
            y0 = int(self.rng.integers(0, h - size + 1))
            hr = img.crop((x0, y0, x0 + size, y0 + size))
            lr = hr.resize((size // self.scale, size // self.scale),
                           Image.BICUBIC)
            hr_a = np.asarray(hr, np.float32) / 255.0
            lr_a = np.asarray(lr, np.float32) / 255.0
        return lr_a, hr_a
