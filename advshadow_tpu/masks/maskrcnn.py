"""Mask-RCNN re-hosted in JAX — the TPU-native detector.

The reference runs a TF Mask-RCNN frozen graph through OpenCV's C++ DNN
(ref: mask_for_dataset.py:16-23).  This module rebuilds the detector the
TPU way (SURVEY §2.7): a torchvision-``maskrcnn_resnet50_fpn``-compatible
architecture (ResNet+FPN backbone, RPN, ROI box/mask heads) as one
jittable, FIXED-SHAPE inference graph — proposal selection, NMS, and
detection filtering all run with static shapes (top-k + validity masks
instead of dynamic filtering), so the whole forward compiles once and
runs on-device with no host syncs.

Weight porting from torchvision checkpoints is
:func:`advshadow_tpu.victims.port.port_generic`-style via
:func:`port_maskrcnn`; with random weights the graph still exercises the
full pipeline (shape/fixed-point tests).  Detections adapt to the OpenCV
output layout so :func:`advshadow_tpu.masks.extract.combine_detection_masks`
consumes them unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advshadow_tpu.masks.detector import (
    box_iou,
    decode_boxes,
    generate_anchors,
    nms,
    roi_align,
)
from advshadow_tpu.victims.resnet import ResNet, Bottleneck

__all__ = ["MaskRCNNConfig", "MaskRCNN", "Detections", "detections_to_opencv"]


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig:
    num_classes: int = 91                 # COCO (torchvision default)
    fpn_channels: int = 256
    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)  # one per level
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    pre_nms_top_n: int = 256              # per level (fixed-shape top-k)
    post_nms_top_n: int = 128             # proposals kept after NMS
    rpn_nms_threshold: float = 0.7
    max_detections: int = 32
    box_score_threshold: float = 0.05
    box_nms_threshold: float = 0.5
    box_reg_weights: Tuple[float, float, float, float] = (10., 10., 5., 5.)


class Detections(NamedTuple):
    boxes: jax.Array    # [D, 4] xyxy (input coordinates)
    scores: jax.Array   # [D]
    classes: jax.Array  # [D] int32
    valid: jax.Array    # [D] bool
    masks: jax.Array    # [D, 28, 28] sigmoid probabilities for the class


class _FPN(nn.Module):
    """Feature pyramid (torchvision FPN naming: inner/layer blocks)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, c2, c3, c4, c5):
        inner = [
            nn.Conv(self.out_channels, (1, 1), name=f"inner{i}")(c)
            for i, c in enumerate((c2, c3, c4, c5))
        ]
        # top-down pathway with nearest x2 upsampling
        p5 = inner[3]
        laterals = [p5]
        for i in (2, 1, 0):
            up = jax.image.resize(
                laterals[0],
                (inner[i].shape[0], inner[i].shape[1], inner[i].shape[2],
                 self.out_channels),
                method="nearest")
            laterals.insert(0, inner[i] + up)
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, name=f"layer{i}")(p)
            for i, p in enumerate(laterals)
        ]
        # P6 for the RPN only (stride-2 maxpool of P5)
        p6 = nn.max_pool(outs[3], (1, 1), strides=(2, 2))
        return outs + [p6]


class _RPNHead(nn.Module):
    num_anchors: int

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(feats[0].shape[-1], (3, 3), padding=1, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name="bbox_pred")
        logits, deltas = [], []
        for f in feats:
            h = nn.relu(conv(f))
            logits.append(cls(h))
            deltas.append(reg(h))
        return logits, deltas


class _BoxHead(nn.Module):
    """TwoMLPHead + FastRCNNPredictor (torchvision naming)."""

    num_classes: int

    @nn.compact
    def __call__(self, pooled):  # [N, 7, 7, C]
        n = pooled.shape[0]
        # torch flattens NCHW; transpose for weight-port parity
        h = pooled.transpose(0, 3, 1, 2).reshape(n, -1)
        h = nn.relu(nn.Dense(1024, name="fc6")(h))
        h = nn.relu(nn.Dense(1024, name="fc7")(h))
        scores = nn.Dense(self.num_classes, name="cls_score")(h)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred")(h)
        return scores, deltas


class _MaskHead(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, pooled):  # [N, 14, 14, C]
        h = pooled
        for i in range(1, 5):
            h = nn.relu(nn.Conv(256, (3, 3), padding=1,
                                name=f"mask_fcn{i}")(h))
        h = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                                     name="conv5_mask")(h))
        return nn.Conv(self.num_classes, (1, 1), name="mask_fcn_logits")(h)


def _fpn_level_for_boxes(boxes: jax.Array) -> jax.Array:
    """FPN level assignment k = floor(4 + log2(sqrt(area)/224)), clipped to
    [2, 5] (torchvision LevelMapper), returned as 0-based P2..P5 index."""
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    k = jnp.floor(4 + jnp.log2(jnp.sqrt(w * h) / 224.0 + 1e-9))
    return jnp.clip(k, 2, 5).astype(jnp.int32) - 2


def _multilevel_roi_align(feats, boxes, output_size, strides=(4, 8, 16, 32)):
    """ROIAlign each box from its assigned FPN level (fixed shapes: align
    against every level, then select)."""
    levels = _fpn_level_for_boxes(boxes)
    pooled_all = jnp.stack([
        roi_align(feats[i][0], boxes, output_size, 1.0 / strides[i],
                  sampling_ratio=2)
        for i in range(4)
    ])  # [4, N, s, s, C]
    return jnp.take_along_axis(
        pooled_all, levels[None, :, None, None, None], axis=0)[0]


class MaskRCNN(nn.Module):
    """Fixed-shape Mask-RCNN inference graph (batch of one image)."""

    config: MaskRCNNConfig = MaskRCNNConfig()

    @nn.compact
    def __call__(self, image: jax.Array) -> Detections:
        """image: [H, W, 3] float (already normalized); H, W static."""
        cfg = self.config
        H, W = image.shape[0], image.shape[1]
        A = len(cfg.anchor_ratios)

        backbone = ResNet(Bottleneck, (3, 4, 6, 3), name="body")
        c2, c3, c4, c5 = backbone(image[None], return_pyramid=True)
        feats = _FPN(cfg.fpn_channels, name="fpn")(c2, c3, c4, c5)

        rpn_logits, rpn_deltas = _RPNHead(A, name="rpn_head")(feats)

        # --- proposals: per-level fixed top-k, then joint fixed NMS ---
        strides = (4, 8, 16, 32, 64)
        all_boxes, all_scores = [], []
        for lvl in range(5):
            fh, fw = feats[lvl].shape[1], feats[lvl].shape[2]
            anchors = generate_anchors(
                (fh, fw), strides[lvl], scales=(cfg.anchor_sizes[lvl],),
                ratios=cfg.anchor_ratios)
            logits = rpn_logits[lvl][0].reshape(-1)
            deltas = rpn_deltas[lvl][0].reshape(-1, 4)
            k = min(cfg.pre_nms_top_n, logits.shape[0])
            top_scores, top_ix = jax.lax.top_k(logits, k)
            boxes = decode_boxes(anchors[top_ix], deltas[top_ix],
                                 clip_hw=(H, W))
            all_boxes.append(boxes)
            all_scores.append(top_scores)
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        keep_ix, keep_valid = nms(boxes, scores, cfg.post_nms_top_n,
                                  cfg.rpn_nms_threshold)
        proposals = boxes[keep_ix]  # [P, 4]; invalid slots degenerate to box 0

        # --- box head: class-aware postprocess (torchvision semantics:
        # every foreground class of every proposal is a detection
        # candidate; per-class NMS via the class-offset trick; all with
        # fixed shapes) ---
        pooled = _multilevel_roi_align(feats, proposals, 7)
        cls_scores, box_deltas = _BoxHead(cfg.num_classes,
                                          name="box_head")(pooled)
        probs = jax.nn.softmax(cls_scores, axis=-1)
        P, K = probs.shape
        fg = K - 1  # class 0 = background
        box_deltas = box_deltas.reshape(P, K, 4)[:, 1:]          # [P, fg, 4]

        def decode_class(deltas_k):
            return decode_boxes(proposals, deltas_k, clip_hw=(H, W),
                                weights=cfg.box_reg_weights)

        boxes_all = jax.vmap(decode_class, in_axes=1, out_axes=1)(
            box_deltas)                                           # [P, fg, 4]
        scores_all = jnp.where(
            keep_valid[:, None] & (probs[:, 1:] > cfg.box_score_threshold),
            probs[:, 1:], 0.0)                                    # [P, fg]
        cls_all = jnp.broadcast_to(
            jnp.arange(1, K, dtype=jnp.int32)[None], (P, fg))

        flat_scores = scores_all.reshape(-1)
        cand = min(4 * cfg.max_detections, flat_scores.shape[0])
        top_scores, top_ix = jax.lax.top_k(flat_scores, cand)
        cand_boxes = boxes_all.reshape(-1, 4)[top_ix]
        cand_cls = cls_all.reshape(-1)[top_ix]
        # per-class NMS: shift each class into its own coordinate region
        offset = float(max(H, W) + 2)
        shifted = cand_boxes + (cand_cls[:, None].astype(jnp.float32)
                                * offset)
        det_ix, det_valid = nms(shifted, top_scores, cfg.max_detections,
                                cfg.box_nms_threshold)
        final_boxes = cand_boxes[det_ix]
        final_scores = top_scores[det_ix]
        final_cls = cand_cls[det_ix]
        final_valid = det_valid & (final_scores > 0)

        # --- mask head on the final boxes ---
        mask_pooled = _multilevel_roi_align(feats, final_boxes, 14)
        mask_logits = _MaskHead(cfg.num_classes,
                                name="mask_head")(mask_pooled)
        per_class = jnp.take_along_axis(
            mask_logits, final_cls[:, None, None, None], axis=-1)[..., 0]
        masks = jax.nn.sigmoid(per_class)  # [D, 28, 28]

        return Detections(final_boxes, final_scores, final_cls.astype(
            jnp.int32), final_valid, masks)


def detections_to_opencv(det: Detections, image_hw: Tuple[int, int],
                         num_classes: int) -> Tuple[np.ndarray, np.ndarray]:
    """Adapt :class:`Detections` to the OpenCV DNN output layout consumed
    by :func:`advshadow_tpu.masks.extract.combine_detection_masks`:
    boxes [1, 1, D, 7] (batch, class, conf, x0, y0, x1, y1 normalized) and
    masks [D, num_classes, 28, 28]."""
    H, W = image_hw
    d = int(det.boxes.shape[0])
    boxes = np.zeros((1, 1, d, 7), np.float32)
    boxes[0, 0, :, 1] = np.asarray(det.classes)
    boxes[0, 0, :, 2] = np.where(np.asarray(det.valid),
                                 np.asarray(det.scores), 0.0)
    scaled = np.asarray(det.boxes) / np.asarray([W, H, W, H], np.float32)
    boxes[0, 0, :, 3:7] = scaled
    masks = np.zeros((d, num_classes, 28, 28), np.float32)
    masks[np.arange(d), np.asarray(det.classes)] = np.asarray(det.masks)
    return boxes, masks
