"""Evaluation CLI — ASR / PSNR-SSIM / FID folder protocols.

One entry point covering the reference's three metric scripts
(ref: ASR_fast.py, PSNR_SSIM_fast.py, fid_fast.py) with batched
on-device computation.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from advshadow_tpu.eval import batch_psnr_ssim, compute_asr_folder, \
    fid_from_features, load_folder_images
from advshadow_tpu.utils import get_logger
from advshadow_tpu.victims import OXFORD_PET_CLASSES, label_to_int, \
    load_id2label, make_victim_fn, make_victim_model

logger = get_logger("evaluate")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="AdvShadow-TPU evaluation")
    sub = p.add_subparsers(dest="command", required=True)

    asr = sub.add_parser("asr", help="attack success rate (ref ASR_fast.py)")
    asr.add_argument("--folder", type=str, required=True)
    asr.add_argument("--victim", type=str, default="resnet18")
    asr.add_argument("--victim_ckpt", type=str, default=None)
    asr.add_argument("--torch_state_dict", type=str, default=None,
                     help="real pretrained torch state_dict "
                          "(.pth/.pt/.npz) ported via victims/port.py")
    asr.add_argument("--label_json", type=str, default=None,
                     help="id2label JSON for this victim's ordering")
    asr.add_argument("--image_size", type=int, default=224)
    asr.add_argument("--num_classes", type=int, default=37)

    ps = sub.add_parser("psnr-ssim", help="paired-folder perceptual metrics")
    ps.add_argument("--folder1", type=str, required=True)
    ps.add_argument("--folder2", type=str, required=True)
    ps.add_argument("--image_size", type=int, default=64)
    ps.add_argument("--win_size", type=int, default=7)

    fid = sub.add_parser("fid", help="Frechet distance between folders")
    fid.add_argument("--folder1", type=str, required=True)
    fid.add_argument("--folder2", type=str, required=True)
    fid.add_argument("--feature_victim", type=str, default="resnet18",
                     help="feature extractor (InceptionV3 when ported)")
    fid.add_argument("--victim_ckpt", type=str, default=None)
    fid.add_argument("--torch_state_dict", type=str, default=None,
                     help="real pretrained torch state_dict "
                          "(.pth/.pt/.npz) ported via victims/port.py")
    fid.add_argument("--image_size", type=int, default=224)
    fid.add_argument("--num_classes", type=int, default=37,
                     help="head size of the feature victim's checkpoint "
                          "(features are pre-head, but flax checks shapes)")
    return p


def _victim_fn(name, num_classes, ckpt, image_size,
               torch_state_dict=None):
    model = make_victim_model(name, num_classes=num_classes)
    if torch_state_dict:
        from advshadow_tpu.victims import load_torch_state_dict, \
            port_state_dict

        variables = port_state_dict(name,
                                    load_torch_state_dict(torch_state_dict))
    elif ckpt:
        from advshadow_tpu.victims import load_variables

        variables = load_variables(ckpt)
    else:
        logger.warning("no victim ckpt: randomly initialized (smoke mode)")
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3)))
    return model, variables, make_victim_fn(model, variables)


def run_asr(args) -> dict:
    if args.label_json:
        l2i = label_to_int(load_id2label(args.label_json))
    else:
        l2i = {c: i for i, c in enumerate(OXFORD_PET_CLASSES)}
    _, _, fn = _victim_fn(args.victim, args.num_classes, args.victim_ckpt,
                          args.image_size,
                          getattr(args, "torch_state_dict", None))
    out = compute_asr_folder(fn, args.folder, l2i, args.image_size)
    # the reference prints (1-asr)*100 (ref: ASR_fast.py:133)
    out["reference_print"] = out["accuracy"] * 100.0
    return out


def run_psnr_ssim(args) -> dict:
    a, _, names_a = load_folder_images(args.folder1, args.image_size)
    b, _, names_b = load_folder_images(args.folder2, args.image_size)
    if a.shape[0] != b.shape[0]:
        raise ValueError("Folders must contain the same number of images")
    s, p = batch_psnr_ssim(jnp.asarray(a), jnp.asarray(b), args.win_size)
    return {"mean_ssim": float(s), "mean_psnr": float(p), "n": int(a.shape[0])}


def run_fid(args) -> dict:
    model, variables, _ = _victim_fn(args.feature_victim, args.num_classes,
                                     args.victim_ckpt, args.image_size,
                                     getattr(args, "torch_state_dict", None))

    def feature_fn(x):
        # penultimate (pre-fc) features as the embedding
        out = model.apply(variables, x, return_features=True)
        if isinstance(out, tuple):            # ResNet: (logits, [N,h,w,c])
            return out[1].mean(axis=(1, 2))
        return out                            # InceptionV3: [N, 2048] pooled

    a, _, _ = load_folder_images(args.folder1, args.image_size)
    b, _, _ = load_folder_images(args.folder2, args.image_size)
    fa = feature_fn(jnp.asarray(a))
    fb = feature_fn(jnp.asarray(b))
    return {"fid": float(fid_from_features(fa, fb))}


def main(argv=None):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    args = build_parser().parse_args(argv)
    out = {"asr": run_asr, "psnr-ssim": run_psnr_ssim,
           "fid": run_fid}[args.command](args)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
