"""Attack Success Rate — batched on-device evaluation.

Re-design of ref: ASR_fast.py:101-191: the reference classifies attacked
images one file at a time (batch size 1) against each victim; here the
whole folder is one (or a few) batched device call(s).  True labels come
from the filename prefix (``<class>_<idx>.<ext>``), mapped through the
victim's own label ordering (the 4 config JSONs differ per classifier —
ref: ASR_fast.py:67-75).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from advshadow_tpu.victims.labels import true_label_from_filename
from advshadow_tpu.victims.zoo import safe_argmax

__all__ = ["compute_asr", "compute_asr_folder", "load_folder_images"]


def compute_asr(
    victim_fn: Callable[[jax.Array], jax.Array],
    images: jax.Array,
    true_labels: jax.Array,
    batch_size: int = 256,
) -> Dict[str, float]:
    """ASR over [N, H, W, C] images in [0, 1].

    Returns {"asr": misclassification rate, "accuracy": (1-asr),
    "n": N} — the reference prints (1-asr)*100 (ref: ASR_fast.py:133).
    """
    # one jitted region per chunk (forward + argmax): eager per-op
    # dispatches cost ~33 ms each through the TPU relay, which dominates
    # multi-chunk evals otherwise
    predict = jax.jit(lambda im: safe_argmax(victim_fn(im)))
    preds = []
    for i in range(0, images.shape[0], batch_size):
        preds.append(predict(images[i: i + batch_size]))
    preds = jnp.concatenate(preds)
    success = preds != true_labels
    asr = float(jnp.mean(success.astype(jnp.float32)))
    return {"asr": asr, "accuracy": 1.0 - asr, "n": int(images.shape[0])}


def load_folder_images(
    folder: str,
    image_size: int = 224,
    label_to_int: Optional[Dict[str, int]] = None,
):
    """Load an attacked-image folder: [N, H, W, C] float [0,1] + labels
    from filename prefixes (ref: ASR_fast.py:105-119)."""
    names = sorted(
        n for n in os.listdir(folder)
        if n.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    imgs: List[np.ndarray] = []
    labels: List[int] = []
    kept: List[str] = []
    skipped = 0
    for n in names:
        cls = true_label_from_filename(n)
        if label_to_int is not None and cls not in label_to_int:
            skipped += 1
            continue
        with Image.open(os.path.join(folder, n)) as im:
            im = im.convert("RGB").resize((image_size, image_size),
                                          Image.BILINEAR)
            imgs.append(np.asarray(im, np.float32) / 255.0)
        labels.append(label_to_int[cls] if label_to_int else -1)
        kept.append(n)
    if skipped:
        import warnings

        warnings.warn(
            f"{skipped}/{len(names)} files skipped: filename prefix not in "
            f"the label map (ASR expects '<class>_<i>.<ext>' names)",
            stacklevel=2)
    return (np.stack(imgs) if imgs
            else np.zeros((0, image_size, image_size, 3), np.float32)), \
        np.asarray(labels, np.int32), kept


def compute_asr_folder(
    victim_fn: Callable[[jax.Array], jax.Array],
    folder: str,
    label_to_int: Dict[str, int],
    image_size: int = 224,
    batch_size: int = 256,
) -> Dict[str, float]:
    """Folder-protocol ASR matching the reference script end to end."""
    images, labels, _ = load_folder_images(folder, image_size, label_to_int)
    if images.shape[0] == 0:
        return {"asr": 0.0, "accuracy": 0.0, "n": 0}
    return compute_asr(victim_fn, jnp.asarray(images), jnp.asarray(labels),
                       batch_size)
