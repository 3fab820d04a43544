"""Image saving / run-dir scaffolding (host-side).

Re-design of ref: utils/utils.py:26-236: grid save, per-image save,
run-directory creation, and the args-append train.log.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np
from PIL import Image

__all__ = ["save_images", "save_one_image_in_images", "setup_logging",
           "append_args_log"]


def _to_pil(arr: np.ndarray) -> Image.Image:
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    return Image.fromarray(arr)


def save_images(images: np.ndarray, path: str, nrow: int = 4) -> None:
    """Save a [N, H, W, C] uint8 batch as one grid image
    (ref: utils/utils.py:51-66)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = -(-n // nrow) if n >= nrow else n
    rows = -(-n // max(ncol, 1))
    grid = np.zeros((rows * h, ncol * w, c), dtype=np.uint8)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = images[i]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    _to_pil(grid).save(path)


def save_one_image_in_images(
    images: np.ndarray, path: str, generate_name: str,
    image_size: Optional[int] = None, image_format: str = "jpg",
) -> None:
    """Save each image of a batch as its own file
    (ref: utils/utils.py:69-91)."""
    os.makedirs(path, exist_ok=True)
    for idx, img in enumerate(np.asarray(images)):
        pil = _to_pil(img)
        if image_size is not None:
            pil = pil.resize((image_size, image_size), Image.LANCZOS)
        pil.save(os.path.join(path, f"{generate_name}_{idx}.{image_format}"))


def setup_logging(save_path: str, run_name: str) -> Dict[str, str]:
    """Create the run directory tree (ref: utils/utils.py:176-195):
    results/<run_name>/{vis,tensorboard} — returns the paths."""
    results_dir = os.path.join(save_path, run_name)
    vis_dir = os.path.join(results_dir, "vis")
    tb_dir = os.path.join(results_dir, "tensorboard")
    for d in (save_path, results_dir, vis_dir, tb_dir):
        os.makedirs(d, exist_ok=True)
    return {"results_dir": results_dir, "vis_dir": vis_dir, "tb_dir": tb_dir}


def append_args_log(results_dir: str, args: Any) -> None:
    """Append the run's arguments to train.log (ref: utils/utils.py:214-224)."""
    payload = vars(args) if hasattr(args, "__dict__") else dict(args)
    with open(os.path.join(results_dir, "train.log"), "a") as f:
        f.write(f"[{time.strftime('%Y-%m-%d %H:%M:%S')}]: "
                f"{json.dumps(payload, default=str)}\n")
