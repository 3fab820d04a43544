"""Data pipeline: ImageFolder semantics, shadow-mask pairing, loaders.

TPU-first re-design of the reference's torchvision pipeline
(ref: utils/utils.py:94-161, utils/utils_shadow.py:155-276): pure
Python/PIL/numpy on the host producing NHWC float batches, with a
threaded double-buffered prefetcher instead of torch DataLoader workers,
and deterministic per-host index sharding instead of DistributedSampler.

Augmentations reproduce the reference transform exactly:
Resize(image_size * 1.25) -> RandomResizedCrop(image_size, scale=(.8, 1))
-> Normalize(0.5, 0.5) into [-1, 1] (ref: utils/utils.py:139-152).
Image/mask pairs crop with the SAME random parameters — the reference
applies two independently-random transforms to image and mask (a bug that
misaligns them); pass ``independent_mask_transform=True`` for compat.
"""

from __future__ import annotations

import json
import math
import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

__all__ = [
    "IMAGE_EXTENSIONS",
    "list_image_folder",
    "RandomResizedCrop",
    "default_transform",
    "ImageFolderDataset",
    "ShadowPairDataset",
    "BatchLoader",
]

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def list_image_folder(root: str) -> Tuple[List[str], List[int], List[str]]:
    """torchvision ImageFolder semantics: sorted class subdirs -> labels.
    Returns (paths, labels, class_names)."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    paths, labels = [], []
    for idx, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for name in sorted(os.listdir(cdir)):
            if name.lower().endswith(IMAGE_EXTENSIONS):
                paths.append(os.path.join(cdir, name))
                labels.append(idx)
    return paths, labels, classes


class RandomResizedCrop:
    """torchvision RandomResizedCrop parity: sample area scale in
    ``scale`` and log-uniform aspect ratio in (3/4, 4/3), 10 attempts,
    center-crop fallback; bilinear resize to ``size``."""

    def __init__(self, size: int, scale=(0.8, 1.0), ratio=(3 / 4, 4 / 3)):
        self.size = size
        self.scale = scale
        self.ratio = ratio

    def sample_params(self, w: int, h: int, rng: np.random.Generator):
        area = w * h
        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        for _ in range(10):
            target_area = area * rng.uniform(*self.scale)
            aspect = math.exp(rng.uniform(*log_ratio))
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                i = int(rng.integers(0, h - ch + 1))
                j = int(rng.integers(0, w - cw + 1))
                return i, j, ch, cw
        # center fallback
        in_ratio = w / h
        if in_ratio < self.ratio[0]:
            cw, ch = w, int(round(w / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            ch, cw = h, int(round(h * self.ratio[1]))
        else:
            cw, ch = w, h
        return (h - ch) // 2, (w - cw) // 2, ch, cw

    def apply(self, img: Image.Image, params) -> Image.Image:
        i, j, ch, cw = params
        return img.resize(
            (self.size, self.size), Image.BILINEAR,
            box=(j, i, j + cw, i + ch),
        )


def default_transform(image_size: int):
    """The reference's train transform factory (utils/utils.py:139-152)."""
    resize_to = int(image_size + image_size / 4)
    rrc = RandomResizedCrop(image_size)

    def transform(img: Image.Image, rng: np.random.Generator) -> np.ndarray:
        img = img.convert("RGB")
        w, h = img.size
        short = min(w, h)
        nw, nh = int(round(w * resize_to / short)), int(round(h * resize_to / short))
        img = img.resize((nw, nh), Image.BILINEAR)
        params = rrc.sample_params(nw, nh, rng)
        img = rrc.apply(img, params)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        return arr * 2.0 - 1.0  # Normalize(0.5, 0.5)

    return transform


class ImageFolderDataset:
    """Class-per-subdir dataset yielding ([-1,1] HWC float, int label).

    ``split``/``val_fraction`` give the 80/20 train/val behavior of the
    reference's ad-hoc driver (ref: main.py:69-78): a seeded permutation
    is partitioned so 'train' and 'val' are disjoint and reproducible.
    """

    def __init__(self, root: str, image_size: int = 64, seed: int = 0,
                 split: Optional[str] = None, val_fraction: float = 0.2):
        self.paths, self.labels, self.classes = list_image_folder(root)
        if split is not None:
            perm = np.random.default_rng(seed).permutation(len(self.paths))
            n_val = int(round(len(perm) * val_fraction))
            idx = perm[n_val:] if split == "train" else perm[:n_val]
            self.paths = [self.paths[i] for i in idx]
            self.labels = [self.labels[i] for i in idx]
        self.transform = default_transform(image_size)
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int):
        with Image.open(self.paths[idx]) as img:
            x = self.transform(img, self.rng)
        return x, self.labels[idx]


class ShadowPairDataset:
    """(image, mask, label, name) with ``mask_<name>`` pairing
    (ref: utils/utils_shadow.py:252-276) and optional JSON label map
    (ref: ddim2/main2.py:32-66, image_labels.json {name: class}).

    Image and mask share crop parameters so they stay aligned;
    ``independent_mask_transform=True`` reproduces the reference's
    misaligned behavior for comparison runs.  Unreadable files are
    skipped at listing time (ref: ddim2/main2.py:63-66 skip-corrupt).
    """

    def __init__(
        self,
        image_dir: str,
        mask_dir: str,
        image_size: int = 64,
        labels_json: Optional[str] = None,
        class_names: Optional[Sequence[str]] = None,
        seed: int = 0,
        independent_mask_transform: bool = False,
    ):
        self.image_dir = image_dir
        self.mask_dir = mask_dir
        self.image_size = image_size
        self.independent = independent_mask_transform
        self.rng = np.random.default_rng(seed)

        label_map = None
        if labels_json:
            with open(labels_json) as f:
                label_map = json.load(f)
        names = sorted(
            n for n in os.listdir(image_dir)
            if n.lower().endswith(IMAGE_EXTENSIONS)
        )
        self.items: List[Tuple[str, int]] = []
        if label_map is not None:
            classes = class_names or sorted(set(label_map.values()))
            cls_to_idx = {c: i for i, c in enumerate(classes)}
            self.classes = list(classes)
            for n in names:
                key = n if n in label_map else os.path.splitext(n)[0]
                if key in label_map:
                    self.items.append((n, cls_to_idx[label_map[key]]))
        else:
            self.classes = []
            self.items = [(n, -1) for n in names]
        # drop entries without a mask file
        self.items = [
            (n, l) for n, l in self.items
            if os.path.exists(os.path.join(mask_dir, f"mask_{n}"))
        ]
        self.rrc = RandomResizedCrop(image_size)
        self.resize_to = int(image_size + image_size / 4)

    def __len__(self) -> int:
        return len(self.items)

    def _load_resized(self, path: str, mode: str) -> Image.Image:
        with Image.open(path) as img:
            img = img.convert(mode)
            w, h = img.size
            short = min(w, h)
            nw = int(round(w * self.resize_to / short))
            nh = int(round(h * self.resize_to / short))
            return img.resize((nw, nh), Image.BILINEAR)

    def __getitem__(self, idx: int):
        name, label = self.items[idx]
        img = self._load_resized(os.path.join(self.image_dir, name), "RGB")
        mask = self._load_resized(os.path.join(self.mask_dir, f"mask_{name}"),
                                  "L")
        params = self.rrc.sample_params(*img.size, self.rng)
        mask_params = (
            self.rrc.sample_params(*mask.size, self.rng)
            if self.independent else params
        )
        x = np.asarray(self.rrc.apply(img, params), np.float32) / 255.0
        m = np.asarray(self.rrc.apply(mask, mask_params), np.float32) / 255.0
        return x * 2.0 - 1.0, (m > 0.5).astype(np.float32), label, name


class BatchLoader:
    """Shuffled, per-host-sharded, prefetching batch iterator.

    Replaces DataLoader + DistributedSampler: each host iterates its own
    deterministic shard of the epoch permutation (same seed on every
    host), yielding stacked numpy batches ready for
    :func:`advshadow_tpu.parallel.shard_batch`.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_hosts: int = 1,
        host_id: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = -(-len(self.dataset) // self.num_hosts)  # padded per-host count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + self.epoch).permutation(n)
        else:
            idx = np.arange(n)
        # DistributedSampler semantics: pad to a multiple of num_hosts by
        # wrapping so every sample appears on some host each epoch
        # (ref: utils/utils.py:153-157; torch pads with leading indices).
        if n % self.num_hosts:
            idx = np.concatenate(
                [idx, idx[: self.num_hosts - n % self.num_hosts]])
        per_host = len(idx) // self.num_hosts
        return idx[self.host_id * per_host: (self.host_id + 1) * per_host]

    def __iter__(self) -> Iterator:
        idx = self._indices()
        self.epoch += 1
        batches = [
            idx[i: i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    items = [self.dataset[int(i)] for i in b]
                    cols = list(zip(*items))
                    out = tuple(
                        np.stack(c) if isinstance(c[0], np.ndarray)
                        else (np.asarray(c) if not isinstance(c[0], str)
                              else list(c))
                        for c in cols
                    )
                    q.put(out)
                q.put(stop)
            except BaseException as e:  # propagate instead of hanging
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
