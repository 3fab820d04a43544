"""Classifier spot-check CLI + Grad-CAM visualization.

Covers the reference's manual inspection scripts:
- single-image / folder prediction against any zoo victim
  (ref: test.py:108-182),
- Grad-CAM heatmap overlays saved next to the inputs
  (ref: ddim2/grad-cam.py:104-119).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from advshadow_tpu.utils.choices import str2bool
from advshadow_tpu.eval import grad_cam, make_resnet_cam_fn, show_cam_on_image
from advshadow_tpu.utils import get_logger
from advshadow_tpu.victims import OXFORD_PET_CLASSES, load_id2label, \
    make_victim_fn, make_victim_model

logger = get_logger("classify")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="AdvShadow-TPU classifier check")
    p.add_argument("--path", type=str, required=True,
                   help="image file or folder")
    p.add_argument("--victim", type=str, default="resnet18")
    p.add_argument("--victim_ckpt", type=str, default=None,
                   help="npz (or legacy pkl) of trained victim variables")
    p.add_argument("--torch_state_dict", type=str, default=None,
                   help="real pretrained torch state_dict (.pth/.pt/.npz) "
                        "ported through victims/port.py (drop-in for the "
                        "reference's ImageNet victims, ASR_fast.py:16-88)")
    p.add_argument("--num_classes", type=int, default=37)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--label_json", type=str, default=None)
    p.add_argument("--gradcam", type=str2bool, default=False,
                   help="save heatmap overlays (ResNet victims)")
    p.add_argument("--output_path", type=str, default=None)
    return p


def classify(args) -> dict:
    model = make_victim_model(args.victim, num_classes=args.num_classes)
    if getattr(args, "torch_state_dict", None):
        from advshadow_tpu.victims import load_torch_state_dict, \
            port_state_dict

        variables = port_state_dict(
            args.victim, load_torch_state_dict(args.torch_state_dict))
    elif args.victim_ckpt:
        from advshadow_tpu.victims import load_variables

        variables = load_variables(args.victim_ckpt)
    else:
        logger.warning("no --victim_ckpt: randomly initialized (smoke mode)")
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.image_size, args.image_size, 3)))
    victim_fn = make_victim_fn(model, variables)

    if args.label_json:
        id2label = load_id2label(args.label_json)
    else:
        id2label = dict(enumerate(OXFORD_PET_CLASSES[: args.num_classes]))

    if os.path.isdir(args.path):
        names = sorted(n for n in os.listdir(args.path)
                       if n.lower().endswith((".png", ".jpg", ".jpeg")))
        paths = [os.path.join(args.path, n) for n in names]
    else:
        names = [os.path.basename(args.path)]
        paths = [args.path]

    imgs = []
    for p in paths:
        with Image.open(p) as im:
            im = im.convert("RGB").resize(
                (args.image_size, args.image_size), Image.BILINEAR)
            imgs.append(np.asarray(im, np.float32) / 255.0)
    x = jnp.asarray(np.stack(imgs))
    logits = victim_fn(x)
    preds = np.asarray(jnp.argmax(logits, axis=-1))
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))

    results = {}
    for name, pred, prob in zip(names, preds, probs):
        results[name] = {"label": id2label.get(int(pred), str(int(pred))),
                         "confidence": float(prob[pred])}

    if args.gradcam:
        if not args.victim.startswith("resnet"):
            raise ValueError("--gradcam currently targets ResNet victims "
                             "(the reference uses resnet layer4, "
                             "ddim2/grad-cam.py:21-22)")
        out_dir = args.output_path or (
            args.path if os.path.isdir(args.path)
            else os.path.dirname(args.path) or ".")
        os.makedirs(out_dir, exist_ok=True)
        cam_fn = make_resnet_cam_fn(model, variables)
        cams = grad_cam(cam_fn, x)
        for name, img, cam in zip(names, imgs, np.asarray(cams)):
            overlay = show_cam_on_image(jnp.asarray(img), jnp.asarray(cam))
            arr = np.clip(np.asarray(overlay) * 255, 0, 255).astype(np.uint8)
            stem = os.path.splitext(name)[0]
            Image.fromarray(arr).save(
                os.path.join(out_dir, f"{stem}_gradcam.png"))
        logger.info(f"saved {len(names)} Grad-CAM overlays to {out_dir}")

    print(json.dumps(results))
    return results


def main(argv=None):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    args = build_parser().parse_args(argv)
    return classify(args)


if __name__ == "__main__":
    main(sys.argv[1:])
