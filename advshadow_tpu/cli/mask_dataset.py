"""Mask extraction CLI (ref: mask_for_dataset.py __main__)."""

from __future__ import annotations

import argparse
import sys

from advshadow_tpu.masks import extract_and_save_masks
from advshadow_tpu.utils import get_logger

logger = get_logger("mask_dataset")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Extract foreground masks (Mask-RCNN + GrabCut)")
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--mask_rcnn_path", type=str, default=None,
                   help="dir with frozen_inference_graph.pb; omit for the "
                        "weights-free GrabCut fallback")
    p.add_argument("--confidence_threshold", type=float, default=0.7)
    p.add_argument("--mask_threshold", type=float, default=0.3)
    p.add_argument("--grabcut_iter", type=int, default=10)
    p.add_argument("--use_gpu", type=bool, default=False)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    n = extract_and_save_masks(
        args.dataset_path, args.output_path, args.mask_rcnn_path,
        use_gpu=args.use_gpu,
        confidence_threshold=args.confidence_threshold,
        mask_threshold=args.mask_threshold,
        grabcut_iter=args.grabcut_iter,
    )
    logger.info(f"wrote {n} masks to {args.output_path}")
    return n


if __name__ == "__main__":
    main(sys.argv[1:])
