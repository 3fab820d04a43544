"""Offline foreground mask extraction (data prep, host-side).

Re-design of ref: mask_for_dataset.py:6-80 / mask_rcnn_grabcut.py:24-98:
per-detection box+mask thresholding (conf 0.7 / mask 0.3), OR-combined
binary mask, then GrabCut refinement (10 iters, mask-init with PR_FGD
inside / BGD outside).  This is offline data prep and stays on CPU — it
feeds the TPU pipeline, it is not in the jit path (SURVEY.md §2.7).

Detector abstraction: ``detect_fn(image_bgr) -> (boxes, masks)`` in the
OpenCV Mask-RCNN output layout.  :func:`make_opencv_maskrcnn_detector`
wires the reference's TF frozen graph when the model files exist;
:func:`saliency_rect_detector` is a weights-free fallback (GrabCut from a
center rectangle) so the pipeline runs end-to-end without the 200 MB
frozen graph.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

__all__ = [
    "combine_detection_masks",
    "grabcut_refine",
    "make_opencv_maskrcnn_detector",
    "make_jax_maskrcnn_detector",
    "saliency_rect_detector",
    "process_image",
    "extract_and_save_masks",
]


def combine_detection_masks(
    image_shape: Tuple[int, int],
    boxes: np.ndarray,
    masks: np.ndarray,
    confidence_threshold: float = 0.7,
    mask_threshold: float = 0.3,
) -> np.ndarray:
    """OR-combine per-detection masks into one binary [H, W] uint8 mask
    (0/255), reproducing ref: mask_for_dataset.py:48-66 exactly.

    ``boxes``: [1, 1, N, 7] detection_out_final layout;
    ``masks``: [N, num_classes, mh, mw].
    """
    H, W = image_shape
    final = np.zeros((H, W), dtype=np.uint8)
    for i in range(boxes.shape[2]):
        class_id = int(boxes[0, 0, i, 1])
        conf = float(boxes[0, 0, i, 2])
        if conf <= confidence_threshold:
            continue
        box = boxes[0, 0, i, 3:7] * np.array([W, H, W, H])
        x0, y0, x1, y1 = box.astype(int)
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, W), min(y1, H)
        bw, bh = x1 - x0, y1 - y0
        if bw <= 0 or bh <= 0:
            continue
        m = masks[i, class_id]
        if _HAS_CV2:
            m = cv2.resize(m, (bw, bh), interpolation=cv2.INTER_CUBIC)
        else:
            ys = (np.arange(bh) * m.shape[0] / bh).astype(int)
            xs = (np.arange(bw) * m.shape[1] / bw).astype(int)
            m = m[ys][:, xs]
        binary = (m > mask_threshold).astype(np.uint8) * 255
        final[y0:y1, x0:x1] = np.bitwise_or(final[y0:y1, x0:x1], binary)
    return final


def grabcut_refine(image_bgr: np.ndarray, mask: np.ndarray,
                   iterations: int = 10,
                   backend: str = "native") -> np.ndarray:
    """GrabCut refinement with mask init (ref: mask_for_dataset.py:69-80):
    mask>0 -> probable-foreground, ==0 -> definite background.

    ``backend``: "native" (this framework's C++ GMM+Dinic implementation,
    see native/grabcut.cpp) or "cv2" (OpenCV parity path)."""
    if not (np.any(mask > 0) and np.any(mask == 0)):
        return ((mask > 0) * 255).astype(np.uint8)

    if backend == "native":
        from advshadow_tpu.masks import native as _native

        if _native.native_available():
            gc = np.where(mask > 0, _native.GC_PR_FGD,
                          _native.GC_BGD).astype(np.uint8)
            out = _native.native_grabcut(image_bgr, gc,
                                         iter_count=iterations)
            fg = (out == _native.GC_FGD) | (out == _native.GC_PR_FGD)
            return (fg * 255).astype(np.uint8)
        backend = "cv2"  # fall through

    if not _HAS_CV2:
        return ((mask > 0) * 255).astype(np.uint8)
    gc = mask.copy()
    gc[gc > 0] = cv2.GC_PR_FGD
    gc[gc == 0] = cv2.GC_BGD
    fg = np.zeros((1, 65), np.float64)
    bg = np.zeros((1, 65), np.float64)
    cv2.grabCut(image_bgr, gc, None, bg, fg, iterCount=iterations,
                mode=cv2.GC_INIT_WITH_MASK)
    out = np.where((gc == cv2.GC_BGD) | (gc == cv2.GC_PR_BGD), 0, 1)
    return (out * 255).astype(np.uint8)


def make_opencv_maskrcnn_detector(mask_rcnn_path: str,
                                  use_gpu: bool = False) -> Callable:
    """cv2.dnn TF Mask-RCNN inception-v2 (ref: mask_for_dataset.py:8-23).
    Requires frozen_inference_graph.pb + pbtxt under ``mask_rcnn_path``."""
    if not _HAS_CV2:
        raise RuntimeError("OpenCV is required for the Mask-RCNN detector")
    weights = os.path.join(mask_rcnn_path, "frozen_inference_graph.pb")
    config = os.path.join(mask_rcnn_path,
                          "mask_rcnn_inception_v2_coco_2018_01_28.pbtxt")
    net = cv2.dnn.readNetFromTensorflow(weights, config)
    if use_gpu:
        net.setPreferableBackend(cv2.dnn.DNN_BACKEND_CUDA)
        net.setPreferableTarget(cv2.dnn.DNN_TARGET_CUDA)

    def detect(image_bgr: np.ndarray):
        blob = cv2.dnn.blobFromImage(image_bgr, swapRB=True, crop=False)
        net.setInput(blob)
        return net.forward(["detection_out_final", "detection_masks"])

    return detect


def saliency_rect_detector(margin: float = 0.12) -> Callable:
    """Weights-free fallback: a single pseudo-detection covering the
    center crop, refined by GrabCut (rect-init semantics expressed in the
    detection layout so the downstream pipeline is identical)."""

    def detect(image_bgr: np.ndarray):
        boxes = np.zeros((1, 1, 1, 7), np.float32)
        boxes[0, 0, 0, 1] = 0          # class id
        boxes[0, 0, 0, 2] = 1.0        # confidence
        boxes[0, 0, 0, 3:7] = (margin, margin, 1 - margin, 1 - margin)
        masks = np.ones((1, 1, 15, 15), np.float32)
        return boxes, masks

    return detect


def process_image(
    image_bgr: np.ndarray,
    detect_fn: Callable,
    confidence_threshold: float = 0.7,
    mask_threshold: float = 0.3,
    grabcut_iter: int = 10,
    resize_width: Optional[int] = 600,
    phase_times: Optional[dict] = None,
) -> Optional[np.ndarray]:
    """Full per-image pipeline: resize to width 600 (ref
    mask_for_dataset.py:40), detect, combine, GrabCut. Returns the binary
    mask (uint8 0/255) at the resized resolution, or None when nothing
    was detected.  ``phase_times`` (optional dict) accumulates per-phase
    seconds under "detect" / "grabcut" keys (benchmark breakdown)."""
    import time as _time

    if resize_width and _HAS_CV2:
        h = int(image_bgr.shape[0] * resize_width / image_bgr.shape[1])
        image_bgr = cv2.resize(image_bgr, (resize_width, h))
    t0 = _time.perf_counter()
    boxes, masks = detect_fn(image_bgr)
    t1 = _time.perf_counter()
    combined = combine_detection_masks(
        image_bgr.shape[:2], boxes, masks,
        confidence_threshold, mask_threshold,
    )
    out = (grabcut_refine(image_bgr, combined, grabcut_iter)
           if np.any(combined > 0) else None)
    if phase_times is not None:
        t2 = _time.perf_counter()
        phase_times["detect"] = phase_times.get("detect", 0.0) + (t1 - t0)
        phase_times["grabcut"] = phase_times.get("grabcut", 0.0) + (t2 - t1)
    return out


def extract_and_save_masks(
    dataset_path: str,
    output_path: str,
    mask_rcnn_path: Optional[str] = None,
    use_gpu: bool = False,
    detect_fn: Optional[Callable] = None,
    phase_times: Optional[dict] = None,
    **kwargs,
) -> int:
    """Whole-dataset extraction (ref: mask_for_dataset.py:6-31); returns
    the number of masks written.  Detector priority: an explicit
    ``detect_fn``, else the OpenCV Mask-RCNN when ``mask_rcnn_path`` is
    given, else the weights-free fallback.  ``phase_times`` accumulates
    "io" / "detect" / "grabcut" seconds for benchmark breakdowns."""
    import time as _time

    if not _HAS_CV2:
        raise RuntimeError("OpenCV is required for offline mask extraction")
    if detect_fn is None:
        detect_fn = (
            make_opencv_maskrcnn_detector(mask_rcnn_path, use_gpu)
            if mask_rcnn_path else saliency_rect_detector()
        )
    os.makedirs(output_path, exist_ok=True)
    written = 0
    for name in sorted(os.listdir(dataset_path)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        t0 = _time.perf_counter()
        img = cv2.imread(os.path.join(dataset_path, name))
        if phase_times is not None:
            phase_times["io"] = phase_times.get("io", 0.0) + (
                _time.perf_counter() - t0)
        if img is None:
            print(f"Warning: Unable to load image at {name}. Skipping.")
            continue
        mask = process_image(img, detect_fn, phase_times=phase_times,
                             **kwargs)
        if mask is None:
            continue
        t0 = _time.perf_counter()
        cv2.imwrite(os.path.join(output_path, f"mask_{name}"), mask)
        if phase_times is not None:
            phase_times["io"] = phase_times.get("io", 0.0) + (
                _time.perf_counter() - t0)
        written += 1
    return written


def make_jax_maskrcnn_detector(variables=None, num_classes: int = 91,
                               image_size: int = 512, **config_kwargs):
    """TPU-native Mask-RCNN detector (:mod:`advshadow_tpu.masks.maskrcnn`)
    in the same ``detect_fn(image_bgr) -> (boxes, masks)`` interface as
    the OpenCV DNN path — the SURVEY §2.7 re-host.  ``variables`` are
    ported torchvision weights (:func:`advshadow_tpu.victims.port.port_maskrcnn`);
    None initializes randomly (pipeline smoke mode).
    """
    import jax
    import jax.numpy as jnp

    from advshadow_tpu.masks.maskrcnn import MaskRCNN, MaskRCNNConfig, \
        detections_to_opencv
    from advshadow_tpu.victims.zoo import imagenet_normalize

    cfg = MaskRCNNConfig(num_classes=num_classes, **config_kwargs)
    model = MaskRCNN(cfg)
    if variables is None:
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((image_size, image_size, 3)))
    apply_fn = jax.jit(model.apply)

    def detect(image_bgr: np.ndarray):
        rgb = image_bgr[..., ::-1].astype(np.float32) / 255.0
        h, w = rgb.shape[:2]
        if _HAS_CV2:
            rgb = cv2.resize(rgb, (image_size, image_size))
        x = imagenet_normalize(jnp.asarray(rgb))
        det = apply_fn(variables, x)
        return detections_to_opencv(det, (image_size, image_size),
                                    num_classes)

    return detect
