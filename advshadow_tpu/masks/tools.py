"""Misc dataset tooling (host-side).

Working equivalents of the reference's small data scripts:
- filename-prefix labeling -> JSON (ref: label_json.py:8-24)
- classifier-based auto-labeling (ref: classifer_model.py:36-60 — the
  fastai learner is replaced by any zoo victim fn)
- random image+mask subset sampling for ablation (ref: ablation.py:6-46)
- batch resize utility (ref: train_classifer.py:44-70)
"""

from __future__ import annotations

import json
import os
import random
import shutil
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

__all__ = ["label_json_from_filenames", "auto_label_folder",
           "pick_images_and_masks", "resize_images_in_folder"]

_EXTS = (".png", ".jpg", ".jpeg")


def label_json_from_filenames(folder: str, output_json: str) -> Dict[str, str]:
    """{name: name.split('_')[0]} label map (ref: label_json.py:8-24).
    Note the reference splits on the FIRST underscore, so multi-word
    classes truncate — kept for parity; use
    :func:`advshadow_tpu.victims.labels.true_label_from_filename` for the
    last-underscore variant the eval scripts use."""
    labels = {
        n: n.split("_")[0]
        for n in sorted(os.listdir(folder))
        if n.lower().endswith(_EXTS)
    }
    with open(output_json, "w") as f:
        json.dump(labels, f, indent=2)
    return labels


def auto_label_folder(
    folder: str,
    output_json: str,
    victim_fn: Callable,
    class_names: Sequence[str],
    image_size: int = 224,
    batch_size: int = 64,
) -> Dict[str, str]:
    """Label every image with a classifier's prediction
    (ref: classifer_model.py:36-60, fastai predict loop -> one batched
    device call per chunk)."""
    import jax.numpy as jnp

    names = [n for n in sorted(os.listdir(folder))
             if n.lower().endswith(_EXTS)]
    labels: Dict[str, str] = {}
    for i in range(0, len(names), batch_size):
        chunk = names[i: i + batch_size]
        imgs = []
        for n in chunk:
            with Image.open(os.path.join(folder, n)) as im:
                im = im.convert("RGB").resize((image_size, image_size),
                                              Image.BILINEAR)
                imgs.append(np.asarray(im, np.float32) / 255.0)
        logits = victim_fn(jnp.asarray(np.stack(imgs)))
        preds = np.asarray(jnp.argmax(logits, axis=-1))
        for n, p in zip(chunk, preds):
            labels[n] = class_names[int(p)]
    with open(output_json, "w") as f:
        json.dump(labels, f, indent=2)
    return labels


def pick_images_and_masks(
    image_dir: str,
    mask_dir: str,
    out_image_dir: str,
    out_mask_dir: str,
    n: int = 500,
    seed: Optional[int] = None,
) -> List[str]:
    """Random image+mask pair subset (ref: ablation.py:6-46)."""
    rng = random.Random(seed)
    names = [
        name for name in sorted(os.listdir(image_dir))
        if name.lower().endswith(_EXTS)
        and os.path.exists(os.path.join(mask_dir, f"mask_{name}"))
    ]
    chosen = rng.sample(names, min(n, len(names)))
    os.makedirs(out_image_dir, exist_ok=True)
    os.makedirs(out_mask_dir, exist_ok=True)
    for name in chosen:
        shutil.copyfile(os.path.join(image_dir, name),
                        os.path.join(out_image_dir, name))
        shutil.copyfile(os.path.join(mask_dir, f"mask_{name}"),
                        os.path.join(out_mask_dir, f"mask_{name}"))
    return chosen


def resize_images_in_folder(folder: str, output_folder: str,
                            size: int = 64) -> int:
    """Batch-resize a folder (ref: train_classifer.py:44-70)."""
    os.makedirs(output_folder, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(folder)):
        if not name.lower().endswith(_EXTS):
            continue
        with Image.open(os.path.join(folder, name)) as im:
            im = im.convert("RGB").resize((size, size), Image.LANCZOS)
            im.save(os.path.join(output_folder, name))
        count += 1
    return count
