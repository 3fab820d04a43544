"""Single-image mask-pipeline debugger.

Re-design of ref: mask_rcnn_grabcut.py:24-98 — the reference's
interactive script runs Mask-RCNN + GrabCut on ONE image and cv2.imshows
each stage (detections, combined mask, refined mask, overlay) in a
window loop.  Headless TPU hosts have no display, so this CLI renders
the same stage sequence into one side-by-side panel image (and can still
pop cv2 windows with ``--show`` when a display exists):

  [ original | detection boxes | combined RCNN mask | GrabCut mask | overlay ]

Shares the exact pipeline functions the batch extractor uses
(:mod:`advshadow_tpu.masks.extract`), so what you debug here is what
``cli.mask_dataset`` runs at scale.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from advshadow_tpu.utils.choices import str2bool
from advshadow_tpu.masks.extract import (
    combine_detection_masks,
    grabcut_refine,
    make_opencv_maskrcnn_detector,
    saliency_rect_detector,
)
from advshadow_tpu.utils import get_logger

logger = get_logger("mask_debug")

try:
    import cv2

    _HAS_CV2 = True
except Exception:                                     # pragma: no cover
    _HAS_CV2 = False


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="single-image mask debug panel")
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--out", type=str, default=None,
                   help="panel output path (default <image>_maskdebug.png)")
    p.add_argument("--mask_rcnn_path", type=str, default=None,
                   help="dir with frozen_inference_graph.pb (+pbtxt); "
                        "falls back to the weights-free detector")
    p.add_argument("--confidence_threshold", type=float, default=0.7)
    p.add_argument("--mask_threshold", type=float, default=0.3)
    p.add_argument("--grabcut_iter", type=int, default=10)
    p.add_argument("--resize_width", type=int, default=600)
    p.add_argument("--grabcut_backend", type=str, default="native",
                   choices=["native", "cv2"])
    p.add_argument("--show", type=str2bool, default=False,
                   help="also cv2.imshow each stage (needs a display; "
                        "matches the reference's window loop)")
    return p


def _label(panel: np.ndarray, text: str) -> np.ndarray:
    """Caption strip under a BGR panel tile."""
    h, w = panel.shape[:2]
    strip = np.full((18, w, 3), 32, np.uint8)
    if _HAS_CV2:
        cv2.putText(strip, text, (4, 13), cv2.FONT_HERSHEY_SIMPLEX,
                    0.38, (220, 220, 220), 1, cv2.LINE_AA)
    return np.concatenate([panel, strip], axis=0)


def debug_image(args) -> dict:
    if not _HAS_CV2:
        raise RuntimeError("OpenCV is required for the mask debugger")
    img = cv2.imread(args.image)
    if img is None:
        raise SystemExit(f"unable to load {args.image}")
    if args.resize_width:
        h = int(img.shape[0] * args.resize_width / img.shape[1])
        img = cv2.resize(img, (args.resize_width, h))

    detect_fn = (make_opencv_maskrcnn_detector(args.mask_rcnn_path)
                 if args.mask_rcnn_path else saliency_rect_detector())
    boxes, masks = detect_fn(img)

    # stage 2: detection boxes (ref draws each box + score, :38-52)
    H, W = img.shape[:2]
    det_vis = img.copy()
    n_det = 0
    for i in range(boxes.shape[2]):
        conf = float(boxes[0, 0, i, 2])
        if conf <= args.confidence_threshold:
            continue
        x0, y0, x1, y1 = (boxes[0, 0, i, 3:7]
                          * np.array([W, H, W, H])).astype(int)
        cv2.rectangle(det_vis, (x0, y0), (x1, y1), (0, 255, 0), 2)
        cv2.putText(det_vis, f"{conf:.2f}", (x0 + 2, max(y0 - 4, 12)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.45, (0, 255, 0), 1)
        n_det += 1

    # stage 3: combined RCNN mask (ref :54-66)
    combined = combine_detection_masks(
        (H, W), boxes, masks,
        args.confidence_threshold, args.mask_threshold)

    # stage 4: GrabCut refinement (ref :69-80)
    refined = (grabcut_refine(img, combined, args.grabcut_iter,
                              backend=args.grabcut_backend)
               if np.any(combined > 0) else combined)

    # stage 5: overlay (ref :82-88 green blend)
    overlay = img.copy()
    fg = refined > 0
    overlay[fg] = (0.45 * overlay[fg]
                   + 0.55 * np.array([0, 255, 0])).astype(np.uint8)

    tiles = [
        _label(img, "original"),
        _label(det_vis, f"detections ({n_det})"),
        _label(cv2.cvtColor(combined, cv2.COLOR_GRAY2BGR), "rcnn mask"),
        _label(cv2.cvtColor(refined, cv2.COLOR_GRAY2BGR),
               f"grabcut ({args.grabcut_backend})"),
        _label(overlay, "overlay"),
    ]
    panel = np.concatenate(tiles, axis=1)
    out = args.out or (os.path.splitext(args.image)[0] + "_maskdebug.png")
    cv2.imwrite(out, panel)
    logger.info(f"{n_det} detections, fg {fg.mean() * 100:.1f}% -> {out}")

    if args.show:                                      # pragma: no cover
        for name, tile in (("original", img), ("detections", det_vis),
                           ("rcnn_mask", combined), ("grabcut", refined),
                           ("overlay", overlay)):
            cv2.imshow(name, tile)
        cv2.waitKey(0)
        cv2.destroyAllWindows()

    return {"detections": n_det, "fg_fraction": float(fg.mean()),
            "panel": out}


def main(argv=None):
    args = build_parser().parse_args(argv)
    return debug_image(args)


if __name__ == "__main__":
    main(sys.argv[1:])
