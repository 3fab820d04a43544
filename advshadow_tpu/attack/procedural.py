"""Procedural triangle shadows — offline data tooling.

Numpy re-design of the reference's PIL/OpenCV triangle-shadow scripts
(ref: add_shadow.py:11-63, shadow_for_attack.py:22-93): a triangle is
rasterized inside (a sub-region of) the object mask's bounding box and
composited with 50% black alpha, then the masked region's brightness is
scaled by ``factor``.  Host-side prep code, not in the jit path; no PIL /
cv2 dependency (half-plane rasterization replaces ImageDraw.polygon).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = [
    "mask_bounding_box",
    "rasterize_triangle",
    "generate_triangle_shadow",
    "adjust_shadow_brightness",
    "adjust_shadow_brightness_lab",
    "add_shadow_to_mask_area",
]


def mask_bounding_box(mask: np.ndarray) -> Optional[Tuple[int, int, int, int]]:
    """(x, y, w, h) of the nonzero region of a [H, W] mask; None if empty.

    The reference takes cv2.boundingRect of the largest contour
    (add_shadow.py:40-46); the full-foreground bbox is equivalent for the
    single-object Oxford-Pet masks.
    """
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return None
    x0, x1 = int(xs.min()), int(xs.max())
    y0, y1 = int(ys.min()), int(ys.max())
    return x0, y0, x1 - x0 + 1, y1 - y0 + 1


def rasterize_triangle(
    height: int, width: int, vertices: np.ndarray
) -> np.ndarray:
    """Binary [H, W] mask of the triangle given 3 (x, y) vertices, via
    half-plane (edge-function) tests."""
    ys, xs = np.mgrid[0:height, 0:width]
    v = np.asarray(vertices, dtype=np.float64)

    def edge(a, b):
        return (xs - a[0]) * (b[1] - a[1]) - (ys - a[1]) * (b[0] - a[0])

    e0, e1, e2 = edge(v[0], v[1]), edge(v[1], v[2]), edge(v[2], v[0])
    inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
    return inside.astype(np.uint8)


def generate_triangle_shadow(
    mask: np.ndarray,
    rng: Optional[np.random.Generator] = None,
    sub_region: bool = True,
) -> Optional[np.ndarray]:
    """Alpha mask [H, W] in [0, 1] of a triangle placed at the mask bbox
    center (ref: shadow_for_attack.py:22-47).  ``sub_region`` restricts to
    the central quarter like the attack script; False matches
    add_shadow.py's full-bbox variant.  Alpha is 128/255 where covered.
    """
    del rng  # placement is deterministic given the mask, as in the ref
    bbox = mask_bounding_box(mask)
    if bbox is None:
        return None
    x, y, w, h = bbox
    if sub_region:
        x, y, w, h = x + w // 4, y + h // 4, w // 2, h // 2
        size = min(w, h) // 3
    else:
        size = min(w, h) // 2
    cx, cy = x + w // 2, y + h // 2
    tri = rasterize_triangle(
        mask.shape[0], mask.shape[1],
        [(cx, cy - size), (cx - size, cy + size), (cx + size, cy + size)],
    )
    return tri.astype(np.float32) * (128.0 / 255.0)


def adjust_shadow_brightness(
    image: np.ndarray, mask: np.ndarray, factor: float = 0.43
) -> np.ndarray:
    """Scale brightness by ``factor`` inside the mask (RGB variant,
    ref: shadow_for_attack.py:49-73). uint8 [H, W, C] in/out."""
    out = image.astype(np.float32)
    m = mask.astype(bool)
    out[m] *= factor
    return np.clip(out, 0, 255).astype(np.uint8)


def adjust_shadow_brightness_lab(
    image: np.ndarray, mask: np.ndarray, factor: float = 0.43
) -> np.ndarray:
    """LAB-space variant: scale only the L channel inside the mask
    (ref: add_shadow.py:11-32). Requires OpenCV; uint8 RGB in/out."""
    import cv2

    lab = cv2.cvtColor(image, cv2.COLOR_RGB2Lab)
    l, a, b = cv2.split(lab)
    l = l.astype(np.float32)
    l = np.where(mask.astype(bool), l * factor, l)
    l = np.clip(l, 0, 255).astype(np.uint8)
    return cv2.cvtColor(cv2.merge([l, a, b]), cv2.COLOR_Lab2RGB)


def add_shadow_to_mask_area(
    image: np.ndarray, mask: np.ndarray, factor: float = 0.43
) -> np.ndarray:
    """Full procedural pipeline (ref: shadow_for_attack.py:76-93):
    triangle alpha-composite restricted to the object mask, then masked
    brightness scaling. uint8 [H, W, 3] image, [H, W] mask."""
    tri = generate_triangle_shadow(mask)
    if tri is None:
        return image
    alpha = tri * (mask > 0)
    composited = (
        image.astype(np.float32) * (1.0 - alpha[..., None])
        + 0.0 * alpha[..., None]  # black shadow layer
    )
    composited = np.clip(composited, 0, 255).astype(np.uint8)
    return adjust_shadow_brightness(composited, mask > 0, factor)
