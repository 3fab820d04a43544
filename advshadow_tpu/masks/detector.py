"""JAX-native detection primitives for on-device segmentation.

The reference runs Mask-RCNN through OpenCV's C++ DNN backend
(ref: mask_for_dataset.py:18-23); the TPU-native path re-hosts the
detector in JAX (SURVEY.md §2.7).  This module provides the detector
building blocks as pure, jit/vmap-compatible functions with static
shapes (fixed-size NMS via iterative suppression masks — no dynamic
shapes, TPU-friendly):

- box utilities: area / IoU matrix / xyxy<->cxcywh
- :func:`nms` — fixed-output non-maximum suppression
- :func:`roi_align` — bilinear ROIAlign (torchvision semantics,
  aligned=False, sampling_ratio=1 grid at bin centers)
- :func:`generate_anchors` — multi-scale/aspect grid anchors
- :func:`decode_boxes` — anchor-relative (dx,dy,dw,dh) decoding

A full RPN+heads Mask-RCNN assembles from these; detection outputs feed
:func:`advshadow_tpu.masks.extract.combine_detection_masks` unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["box_area", "box_iou", "nms", "roi_align", "generate_anchors",
           "decode_boxes"]


def box_area(boxes: jax.Array) -> jax.Array:
    """[N, 4] xyxy -> [N] areas."""
    return jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0)


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N, 4] x [M, 4] -> [N, M] IoU matrix."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@partial(jax.jit, static_argnums=(2,))
def nms(boxes: jax.Array, scores: jax.Array, max_outputs: int,
        iou_threshold: float = 0.5) -> Tuple[jax.Array, jax.Array]:
    """Fixed-size NMS: returns (indices[max_outputs], valid[max_outputs]).

    Static shapes throughout — an iterative argmax/suppress loop as a
    ``lax.fori_loop``, the TPU-friendly formulation (no dynamic gather
    sizes).  Suppressed/exhausted slots report index 0 with valid=False.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(i, state):
        alive, out_idx, out_valid = state
        masked_scores = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked_scores)
        valid = masked_scores[best] > -jnp.inf
        out_idx = out_idx.at[i].set(jnp.where(valid, best, 0))
        out_valid = out_valid.at[i].set(valid)
        # suppress best and its overlaps
        suppress = (iou[best] > iou_threshold) | (
            jnp.arange(n) == best)
        alive = alive & (~suppress | ~valid)
        return alive, out_idx, out_valid

    alive0 = jnp.ones((n,), bool)
    idx0 = jnp.zeros((max_outputs,), jnp.int32)
    valid0 = jnp.zeros((max_outputs,), bool)
    _, out_idx, out_valid = jax.lax.fori_loop(
        0, max_outputs, body, (alive0, idx0, valid0))
    return out_idx, out_valid


def roi_align(
    features: jax.Array,
    boxes: jax.Array,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jax.Array:
    """ROIAlign (torchvision aligned=False semantics).

    Args:
      features: [H, W, C] feature map.
      boxes: [N, 4] xyxy in input coordinates.
      output_size: output bins per side.
      spatial_scale: feature-map scale relative to box coordinates.
      sampling_ratio: sample points per bin side (averaged).
    Returns [N, output_size, output_size, C].
    """
    H, W, C = features.shape

    def one_box(box):
        x0, y0, x1, y1 = box * spatial_scale
        bw = jnp.maximum(x1 - x0, 1.0)
        bh = jnp.maximum(y1 - y0, 1.0)
        bin_w = bw / output_size
        bin_h = bh / output_size
        s = sampling_ratio
        # sample grid: s*output_size points per side at bin-subcell centers
        ys = y0 + (jnp.arange(output_size * s) + 0.5) * (bin_h / s)
        xs = x0 + (jnp.arange(output_size * s) + 0.5) * (bin_w / s)

        def bilinear(yy, xx):
            yy = jnp.clip(yy - 0.5, 0.0, H - 1.0)
            xx = jnp.clip(xx - 0.5, 0.0, W - 1.0)
            y0i = jnp.floor(yy).astype(jnp.int32)
            x0i = jnp.floor(xx).astype(jnp.int32)
            y1i = jnp.minimum(y0i + 1, H - 1)
            x1i = jnp.minimum(x0i + 1, W - 1)
            wy = yy - y0i
            wx = xx - x0i
            v00 = features[y0i, x0i]
            v01 = features[y0i, x1i]
            v10 = features[y1i, x0i]
            v11 = features[y1i, x1i]
            return ((1 - wy) * (1 - wx))[..., None] * v00 + \
                   ((1 - wy) * wx)[..., None] * v01 + \
                   (wy * (1 - wx))[..., None] * v10 + \
                   (wy * wx)[..., None] * v11

        grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
        samples = bilinear(grid_y, grid_x)  # [S*out, S*out, C]
        pooled = samples.reshape(output_size, s, output_size, s, C)
        return pooled.mean(axis=(1, 3))

    return jax.vmap(one_box)(boxes)


def generate_anchors(
    feature_hw: Tuple[int, int],
    stride: int,
    scales: Sequence[float] = (32, 64, 128),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> jax.Array:
    """[H*W*A, 4] xyxy grid anchors centered on feature cells."""
    h, w = feature_hw
    cy = (jnp.arange(h) + 0.5) * stride
    cx = (jnp.arange(w) + 0.5) * stride
    gy, gx = jnp.meshgrid(cy, cx, indexing="ij")
    centers = jnp.stack([gx, gy], axis=-1).reshape(-1, 1, 2)  # [HW, 1, 2]
    whs = []
    for s in scales:
        for r in ratios:
            whs.append((s * (r**0.5), s / (r**0.5)))
    wh = jnp.asarray(whs)  # [A, 2]
    half = wh / 2.0
    mins = centers - half[None]
    maxs = centers + half[None]
    return jnp.concatenate([mins, maxs], axis=-1).reshape(-1, 4)


def decode_boxes(anchors: jax.Array, deltas: jax.Array,
                 clip_hw: Tuple[int, int] | None = None,
                 weights: Tuple[float, float, float, float] = (1., 1., 1., 1.),
                 ) -> jax.Array:
    """Anchor-relative (dx, dy, dw, dh) decoding (R-CNN convention;
    ``weights`` divide the deltas — torchvision uses (1,1,1,1) for the
    RPN and (10,10,5,5) for the ROI heads)."""
    wx, wy, ww, wh = weights
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + aw / 2
    acy = anchors[:, 1] + ah / 2
    cx = acx + deltas[:, 0] / wx * aw
    cy = acy + deltas[:, 1] / wy * ah
    w = aw * jnp.exp(jnp.clip(deltas[:, 2] / ww, -10, 10))
    h = ah * jnp.exp(jnp.clip(deltas[:, 3] / wh, -10, 10))
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    if clip_hw is not None:
        H, W = clip_hw
        boxes = jnp.clip(boxes, 0.0,
                         jnp.asarray([W, H, W, H], boxes.dtype))
    return boxes
