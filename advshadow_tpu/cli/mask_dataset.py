"""Mask extraction CLI (ref: mask_for_dataset.py __main__)."""

from __future__ import annotations

import argparse
import sys

from advshadow_tpu.utils.choices import str2bool
from advshadow_tpu.masks import extract_and_save_masks
from advshadow_tpu.utils import get_logger

logger = get_logger("mask_dataset")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Extract foreground masks (Mask-RCNN + GrabCut)")
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--mask_rcnn_path", type=str, default=None,
                   help="dir with frozen_inference_graph.pb (opencv "
                        "detector)")
    p.add_argument("--detector", type=str, default="auto",
                   choices=["auto", "opencv", "jax", "saliency"],
                   help="auto = opencv when --mask_rcnn_path is given, "
                        "else saliency; jax = the TPU-native Mask-RCNN "
                        "(advshadow_tpu.masks.maskrcnn)")
    p.add_argument("--jax_weights", type=str, default=None,
                   help="npz (or legacy pkl) of ported torchvision Mask-RCNN variables "
                        "for --detector jax")
    p.add_argument("--confidence_threshold", type=float, default=0.7)
    p.add_argument("--mask_threshold", type=float, default=0.3)
    p.add_argument("--grabcut_iter", type=int, default=10)
    p.add_argument("--use_gpu", type=str2bool, default=False)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.detector == "jax":
        import os

        import cv2
        import numpy as np

        from advshadow_tpu.masks.extract import (
            make_jax_maskrcnn_detector,
            process_image,
        )
        from advshadow_tpu.utils.runtime import runtime_init

        runtime_init()
        variables = None
        if args.jax_weights:
            from advshadow_tpu.victims import load_variables

            variables = load_variables(args.jax_weights)
        detect_fn = make_jax_maskrcnn_detector(variables)
        os.makedirs(args.output_path, exist_ok=True)
        n = 0
        for name in sorted(os.listdir(args.dataset_path)):
            if not name.lower().endswith((".png", ".jpg", ".jpeg")):
                continue
            img = cv2.imread(f"{args.dataset_path}/{name}")
            if img is None:
                continue
            mask = process_image(
                img, detect_fn,
                confidence_threshold=args.confidence_threshold,
                mask_threshold=args.mask_threshold,
                grabcut_iter=args.grabcut_iter)
            if mask is None:
                continue
            cv2.imwrite(f"{args.output_path}/mask_{name}", mask)
            n += 1
    else:
        path = (args.mask_rcnn_path
                if args.detector in ("auto", "opencv") else None)
        n = extract_and_save_masks(
            args.dataset_path, args.output_path, path,
            use_gpu=args.use_gpu,
            confidence_threshold=args.confidence_threshold,
            mask_threshold=args.mask_threshold,
            grabcut_iter=args.grabcut_iter,
        )
    logger.info(f"wrote {n} masks to {args.output_path}")
    return n


if __name__ == "__main__":
    main(sys.argv[1:])
