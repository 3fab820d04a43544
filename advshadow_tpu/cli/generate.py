"""Generation CLI — checkpoint-metadata-driven sampling.

Mirrors ref: tools/generate.py:26-155: conditional/unconditional,
network/size/act/classes read FROM the checkpoint metadata
(ref: utils/initializer.py:216-256), per-class or single-class output,
EMA weights option, grid + per-image saves.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from advshadow_tpu.utils.choices import str2bool
from advshadow_tpu.core import make_diffusion
from advshadow_tpu.models import make_network
from advshadow_tpu.ops.image import to_uint8
from advshadow_tpu.samplers import make_denoise_fn, make_sampler
from advshadow_tpu.train.checkpoint import load_ckpt
from advshadow_tpu.utils import choices, get_logger, save_images, \
    save_one_image_in_images

logger = get_logger("generate")


def build_parser() -> argparse.ArgumentParser:
    """Flag surface of ref: tools/generate.py:96-154."""
    p = argparse.ArgumentParser(description="AdvShadow-TPU generator")
    p.add_argument("--generate_name", type=str, default="df")
    p.add_argument("--image_size", type=int, default=None,
                   help="overrides ckpt metadata when set")
    p.add_argument("--image_format", type=str, default="png",
                   choices=choices.image_format_choices)
    p.add_argument("--num_images", type=int, default=8)
    p.add_argument("--weight_path", type=str, required=True)
    p.add_argument("--result_path", type=str, default="./generate_results")
    p.add_argument("--sample", type=str, default=None,
                   choices=choices.sample_choices + [None])
    p.add_argument("--use_ema", type=str2bool, default=False)
    p.add_argument("--cfg_scale", type=int, default=None,
                   help="classifier-free guidance scale (default 3; a "
                        "distilled ckpt whose metadata says guidance_baked "
                        "defaults to 0 — its conditional forward is "
                        "already guided)")
    p.add_argument("--cfg_rescale", type=float, default=0.0,
                   help="guidance rescale phi in [0,1] (Lin et al. 2023); "
                        "0 disables")
    p.add_argument("--cfg_interval", type=str, default=None,
                   help="'t_lo,t_hi' guidance interval (Kynkäänniemi et "
                        "al. 2024); outside it the plain conditional "
                        "prediction is used")
    p.add_argument("--class_name", type=int, default=-1,
                   help="-1 = one image per class (ref tools/generate.py:71-74)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="network compute dtype; bf16 is the TPU-native "
                        "fast path (params stay f32, activations bf16 — "
                        "halves sampler HBM traffic and doubles MXU rate)")
    p.add_argument("--sample_steps", type=int, default=None,
                   help="DDIM/PLMS stride steps (default: the reference's "
                        "500-of-1000, ref model/samples/ddim.py:25)")
    p.add_argument("--dynamic_threshold", type=float, default=None,
                   help="Imagen-style per-sample percentile thresholding "
                        "of x0 predictions (e.g. 0.995) for the dpmpp/"
                        "dpmpp_sde samplers; replaces the static clip — "
                        "a third guided-saturation remedy")
    p.add_argument("--sample_method", type=str, default=None,
                   choices=["uniform", "quad", "logsnr", "karras"],
                   help="ddim/dpmpp/dpmpp_sde timestep spacing: "
                        "uniform/quad (the reference's DDIM strides, "
                        "diff_model.py:427-438) or logsnr/karras "
                        "(few-step grids beyond the ref); ddim defaults "
                        "to the reference's pair stride when unset")
    return p


def generate(args) -> np.ndarray:
    tree = load_ckpt(args.weight_path)
    meta = tree["metadata"]
    conditional = meta.get("conditional", False)
    network = meta.get("network", "unet")
    image_size = args.image_size or meta.get("image_size", 64)
    act = meta.get("act", "silu")
    num_classes = meta.get("num_classes", 1)
    sample = args.sample or meta.get("sample", "ddpm")
    # distilled checkpoints (cli/distill.py) self-describe their sampling:
    # N logsnr DDIM steps, guidance already baked into the conditional
    # forward — honor those as defaults so no extra flags are needed
    if args.sample_steps is None and meta.get("sample_steps"):
        args.sample_steps = int(meta["sample_steps"])
    if getattr(args, "sample_method", None) is None and \
            meta.get("sample_method"):
        args.sample_method = meta["sample_method"]
    if args.cfg_scale is None:
        args.cfg_scale = 0 if meta.get("guidance_baked") else 3

    params = tree["ema_model"] if (args.use_ema and tree.get("ema_model")
                                   is not None) else tree["model"]
    net_kwargs = {}
    if meta.get("channel"):
        net_kwargs["channel"] = tuple(meta["channel"])
    if getattr(args, "dtype", "f32") == "bf16":
        net_kwargs["dtype"] = jnp.bfloat16
    model = make_network(network,
                         num_classes=num_classes if conditional else None,
                         act=act, **net_kwargs)
    coeffs = make_diffusion(1000, meta.get("noise_schedule",
                                           "framework_linear"))
    if conditional:
        if args.class_name == -1:
            labels = jnp.arange(num_classes, dtype=jnp.int32)
            n = int(num_classes)
        else:
            labels = jnp.full((args.num_images,), args.class_name, jnp.int32)
            n = args.num_images
        cfg_scale = args.cfg_scale
    else:
        labels, cfg_scale, n = None, None, args.num_images

    cfg_interval = None
    if getattr(args, "cfg_interval", None):
        lo, hi = (int(v) for v in args.cfg_interval.split(","))
        cfg_interval = (lo, hi)
    denoise = make_denoise_fn(model.apply, params, labels, cfg_scale,
                              cfg_rescale=getattr(args, "cfg_rescale", 0.0),
                              cfg_interval=cfg_interval)
    sampler = make_sampler(sample)
    kwargs = {}
    if args.sample_steps and sample in ("ddim", "plms", "dpmpp",
                                        "dpmpp_sde"):
        kwargs["sample_steps"] = args.sample_steps
    if getattr(args, "sample_method", None) and sample in ("ddim", "dpmpp",
                                                           "dpmpp_sde"):
        kwargs["method"] = args.sample_method
    if getattr(args, "dynamic_threshold", None) is not None:
        if not 0.0 < args.dynamic_threshold <= 1.0:
            raise SystemExit("--dynamic_threshold must be a percentile in "
                             f"(0, 1], got {args.dynamic_threshold}")
        if sample in ("dpmpp", "dpmpp_sde"):
            kwargs["dynamic_threshold"] = args.dynamic_threshold
        else:
            logger.warning(f"--dynamic_threshold ignored: sampler {sample!r} "
                           "only supports static clipping (use dpmpp or "
                           "dpmpp_sde)")
    if sample == "plms" and conditional:
        # the reference's PLMS bootstrap forward skips CFG
        # (ref: model/samples/plms.py:104-108)
        kwargs["boot_denoise_fn"] = make_denoise_fn(model.apply, params,
                                                    labels, None)
    x = sampler(coeffs, denoise, jax.random.PRNGKey(args.seed),
                (n, image_size, image_size, 3), **kwargs)
    imgs = np.asarray(to_uint8(x))

    out_dir = f"{args.result_path}/{int(time.time())}"
    save_images(imgs, f"{out_dir}/{args.generate_name}.{args.image_format}")
    save_one_image_in_images(imgs, out_dir, args.generate_name,
                             image_size=image_size,
                             image_format=args.image_format)
    logger.info(f"saved {n} images to {out_dir}")
    return imgs


def main(argv=None):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    args = build_parser().parse_args(argv)
    return generate(args)


if __name__ == "__main__":
    main(sys.argv[1:])
