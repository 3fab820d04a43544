"""Deterministic procedural mask-paired dataset for real training runs.

The reference trains on the Oxford-IIIT Pet images with Mask-RCNN+GrabCut
foreground masks (ref: ddim2/main2.py:32-66, mask_rcnn_grabcut2.py); this
host has zero network egress, so no real photographs exist.  This module
generates a *structurally equivalent* dataset — per-class foreground
objects on varied textured backgrounds with exact paired masks and a
``labels.json`` map — rich enough that (a) a victim classifier has a
non-trivial decision surface to learn and (b) the conditional diffusion
model has real per-class image structure to model.  Everything is a pure
function of ``(seed, class, index)``, so the dataset is reproducible
bit-for-bit from the repo without committing image binaries.

Ten classes, each a distinct silhouette rendered from a signed-distance
function with anti-aliased edges, random pose (position / scale /
rotation), class-tinted albedo texture, directional shading, and a
background built from low-frequency value noise + a color gradient.
Layout matches the reference protocol exactly: flat ``images/`` +
``masks/mask_<name>`` pairing (ref: utils/utils_shadow.py:252-276),
``byclass/<class>/`` ImageFolder tree, and ``labels.json``
{filename: class} (ref: ddim2/main2.py:32-66).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np

CLASSES: Tuple[str, ...] = (
    "disk", "ring", "triangle", "square", "star", "cross",
    "crescent", "hexagon", "diamond", "heart",
)


def _rot(xy: np.ndarray, theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    x, y = xy[..., 0], xy[..., 1]
    return np.stack([c * x - s * y, s * x + c * y], axis=-1)


def _sdf_circle(p, r):
    return np.hypot(p[..., 0], p[..., 1]) - r


def _sdf_box(p, bx, by):
    qx = np.abs(p[..., 0]) - bx
    qy = np.abs(p[..., 1]) - by
    outside = np.hypot(np.maximum(qx, 0.0), np.maximum(qy, 0.0))
    inside = np.minimum(np.maximum(qx, qy), 0.0)
    return outside + inside


def _sdf_ngon(p, r, n, rot=0.0):
    """Regular n-gon via polar half-plane intersection."""
    ang = np.arctan2(p[..., 1], p[..., 0]) + rot
    rad = np.hypot(p[..., 0], p[..., 1])
    sector = np.pi / n
    a = np.mod(ang, 2 * sector) - sector
    return rad * np.cos(a) - r * np.cos(sector)


def _sdf_star(p, r, n=5, inner=0.45):
    ang = np.arctan2(p[..., 1], p[..., 0])
    rad = np.hypot(p[..., 0], p[..., 1])
    sector = np.pi / n
    a = np.mod(ang, 2 * sector) - sector
    # boundary radius interpolates outer->inner across the half-sector
    frac = np.abs(a) / sector
    rb = r * (1.0 - (1.0 - inner) * frac)
    return rad - rb


def _shape_sdf(cls: str, p: np.ndarray, rng: np.random.Generator):
    """SDF for one class silhouette on pose-normalized coords (unit scale)."""
    if cls == "disk":
        return _sdf_circle(p, 1.0)
    if cls == "ring":
        return np.abs(_sdf_circle(p, 0.78)) - 0.30
    if cls == "triangle":
        return _sdf_ngon(p, 1.0, 3, rot=np.pi / 2)
    if cls == "square":
        return _sdf_box(p, 0.82, 0.82)
    if cls == "star":
        return _sdf_star(p, 1.05, 5, inner=0.42)
    if cls == "cross":
        return np.minimum(_sdf_box(p, 1.0, 0.36), _sdf_box(p, 0.36, 1.0))
    if cls == "crescent":
        d1 = _sdf_circle(p, 1.0)
        bite = p.copy()
        bite[..., 0] -= 0.55
        return np.maximum(d1, -_sdf_circle(bite, 0.80))
    if cls == "hexagon":
        return _sdf_ngon(p, 0.95, 6)
    if cls == "diamond":
        return _sdf_box(_rot(p, np.pi / 4), 0.72, 0.72)
    if cls == "heart":
        # implicit heart: (x^2 + y^2 - 1)^3 - x^2 y^3 <= 0, y flipped
        x = p[..., 0] * 1.2
        y = -p[..., 1] * 1.2 + 0.25
        f = (x * x + y * y - 1.0) ** 3 - x * x * y ** 3
        # pseudo-SDF: signed value scaled to behave like a distance
        return np.sign(f) * np.abs(f) ** (1.0 / 3.0) * 0.5
    raise ValueError(cls)


# distinct albedo tint per class (kept apart in hue so color is a usable
# but not sufficient feature — pose/shape still matter)
_TINTS: Dict[str, Tuple[float, float, float]] = {
    "disk": (0.85, 0.30, 0.25), "ring": (0.95, 0.60, 0.15),
    "triangle": (0.90, 0.85, 0.25), "square": (0.35, 0.75, 0.30),
    "star": (0.20, 0.70, 0.65), "cross": (0.25, 0.45, 0.85),
    "crescent": (0.55, 0.35, 0.85), "hexagon": (0.85, 0.35, 0.75),
    "diamond": (0.60, 0.60, 0.60), "heart": (0.90, 0.45, 0.55),
}


def _value_noise(rng: np.random.Generator, size: int, cells: int) -> np.ndarray:
    """Low-frequency smooth noise: bilinear-upsampled random grid."""
    grid = rng.random((cells + 1, cells + 1)).astype(np.float32)
    idx = np.linspace(0, cells, size, endpoint=False)
    i0 = idx.astype(np.int32)
    f = idx - i0
    g = grid
    top = g[i0][:, i0] * np.outer(1 - f, 1 - f) \
        + g[i0][:, i0 + 1] * np.outer(1 - f, f) \
        + g[i0 + 1][:, i0] * np.outer(f, 1 - f) \
        + g[i0 + 1][:, i0 + 1] * np.outer(f, f)
    return top


def render_sample(cls: str, index: int, image_size: int, seed: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """One (image uint8 [H,W,3], mask uint8 [H,W]) pair, deterministic in
    (cls, index, seed)."""
    cls_id = CLASSES.index(cls)
    rng = np.random.default_rng(
        np.random.SeedSequence([seed, cls_id, index]))
    s = image_size

    # --- background: gradient + 2-octave value noise -------------------
    c0 = rng.random(3) * 0.5 + 0.3
    c1 = rng.random(3) * 0.5 + 0.3
    theta_bg = rng.uniform(0, 2 * np.pi)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
    ramp = (np.cos(theta_bg) * xx + np.sin(theta_bg) * yy + 1.0) / 2.0
    bg = c0[None, None] + (c1 - c0)[None, None] * ramp[..., None]
    bg += 0.18 * (_value_noise(rng, s, 4)[..., None] - 0.5)
    bg += 0.08 * (_value_noise(rng, s, 12)[..., None] - 0.5)

    # --- pose ----------------------------------------------------------
    scale = rng.uniform(0.22, 0.34) * s          # object radius in px
    cx = rng.uniform(0.32, 0.68) * s
    cy = rng.uniform(0.32, 0.68) * s
    theta = rng.uniform(0, 2 * np.pi)

    pix = np.stack([xx * s - cx, yy * s - cy], axis=-1) / scale
    d = _shape_sdf(cls, _rot(pix, theta), rng)        # SDF in pose units
    # anti-aliased coverage over ~1px
    aa = 1.0 / scale
    cov = np.clip(0.5 - d / (2 * aa), 0.0, 1.0)

    # --- foreground albedo + directional shading -----------------------
    tint = np.array(_TINTS[cls], np.float32)
    tint = np.clip(tint + rng.uniform(-0.08, 0.08, 3), 0.05, 1.0)
    tex = 0.75 + 0.5 * _value_noise(rng, s, 6)[..., None]
    light = rng.uniform(0, 2 * np.pi)
    # shade by the SDF gradient projected on the light direction
    gy, gx = np.gradient(d)
    gn = np.hypot(gx, gy) + 1e-6
    shade = 0.85 + 0.3 * ((gx / gn) * np.cos(light) + (gy / gn) * np.sin(light))
    fg = tint[None, None] * tex * shade[..., None]

    img = bg * (1 - cov[..., None]) + fg * cov[..., None]
    img += rng.normal(0.0, 0.015, img.shape)          # sensor noise
    img = np.clip(img, 0.0, 1.0)

    mask = (cov > 0.5).astype(np.uint8) * 255
    return (img * 255).astype(np.uint8), mask


def generate_dataset(root: str, n_per_class: int = 200, image_size: int = 64,
                     seed: int = 0, classes: Tuple[str, ...] = CLASSES,
                     start_index: int = 0) -> Dict[str, str]:
    """Write images/, masks/, byclass/, labels.json under ``root``.

    ``start_index`` offsets the per-class sample indices so disjoint
    train/eval splits come from the same (seed-keyed) distribution.
    Returns the paths dict {images, masks, labels_json, byclass}.
    """
    from PIL import Image

    flat = os.path.join(root, "images")
    masks = os.path.join(root, "masks")
    byclass = os.path.join(root, "byclass")
    os.makedirs(flat, exist_ok=True)
    os.makedirs(masks, exist_ok=True)
    labels: Dict[str, str] = {}
    for cls in classes:
        os.makedirs(os.path.join(byclass, cls), exist_ok=True)
        for i in range(start_index, start_index + n_per_class):
            img, mask = render_sample(cls, i, image_size, seed)
            name = f"{cls}_{i:04d}.png"
            Image.fromarray(img).save(os.path.join(flat, name))
            Image.fromarray(img).save(os.path.join(byclass, cls, name))
            Image.fromarray(mask).save(os.path.join(masks, f"mask_{name}"))
            labels[name] = cls
    labels_json = os.path.join(root, "labels.json")
    if os.path.exists(labels_json):
        # extending an existing root (e.g. a later start_index chunk):
        # merge so earlier files keep their labels
        with open(labels_json) as f:
            labels = {**json.load(f), **labels}
    with open(labels_json, "w") as f:
        json.dump(labels, f)
    return {"images": flat, "masks": masks, "labels_json": labels_json,
            "byclass": byclass}


def main(argv: List[str] | None = None):
    import argparse

    p = argparse.ArgumentParser(description="procedural mask-paired dataset")
    p.add_argument("--root", required=True)
    p.add_argument("--n_per_class", type=int, default=200)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--start_index", type=int, default=0)
    args = p.parse_args(argv)
    paths = generate_dataset(args.root, args.n_per_class, args.image_size,
                             args.seed, start_index=args.start_index)
    print(json.dumps(paths))


if __name__ == "__main__":
    main()
