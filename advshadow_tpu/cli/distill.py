"""Progressive guided distillation CLI (beyond-reference).

Distills a trained checkpoint into few-step students with guidance baked
in (train/distill.py; Salimans & Ho 2202.00512 + Meng et al. 2210.03142).
The reference has no counterpart — its fastest protocol is DDIM-50 with
a CFG double-batch per step (ref: diff_model.py:416-474,
model/samples/ddpm.py:62-74); a distilled student replaces that with
4-16 plain conditional forwards.

Each stage halves the student's step count and writes a normal,
self-describing checkpoint: metadata gains ``sample_steps`` /
``sample_method`` / ``guidance_baked`` / ``distilled_stages``, and the
generate CLI picks those up as defaults — so
``python -m advshadow_tpu.cli.generate --weight_path <stage ckpt>``
samples the student correctly (N logsnr DDIM steps, no CFG) with no
extra flags.

Usage:
  python -m advshadow_tpu.cli.distill \\
    --weight_path .../ckpt_last --use_ema 1 --cfg_scale 3 \\
    --dataset_path <class-per-subdir tree> --stages 16,8,4 \\
    --steps_per_stage 1000 --batch_size 16 --amp 1 \\
    --result_path results/distill --run_name shadow128_distilled
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from advshadow_tpu.core import make_diffusion
from advshadow_tpu.data import BatchLoader, ImageFolderDataset
from advshadow_tpu.models import make_network
from advshadow_tpu.parallel import make_mesh, replicate, shard_batch
from advshadow_tpu.train.checkpoint import load_ckpt, save_ckpt
from advshadow_tpu.train.distill import (
    DistillConfig,
    create_distill_state,
    make_distill_step,
)
from advshadow_tpu.utils import get_logger
from advshadow_tpu.utils.choices import str2bool

logger = get_logger("distill")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="AdvShadow-TPU progressive "
                                            "guided distillation")
    p.add_argument("--weight_path", type=str, required=True,
                   help="teacher checkpoint (ckpt_last dir)")
    p.add_argument("--use_ema", type=str2bool, default=True)
    p.add_argument("--dataset_path", type=str, required=True,
                   help="class-per-subdir image tree (x_t coverage data)")
    p.add_argument("--stages", type=str, default="16,8,4",
                   help="comma list of student step counts, halving")
    p.add_argument("--steps_per_stage", type=int, default=1000)
    p.add_argument("--cfg_scale", type=float, default=3.0,
                   help="guidance scale baked into the stage-1 teacher "
                        "(later stages are CFG-free by construction)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--optim", type=str, default="adamw")
    p.add_argument("--loss_weight", type=str, default="trunc_snr",
                   choices=["trunc_snr", "x0"],
                   help="distillation loss weighting: S&H truncated SNR "
                        "(default) or uniform x0-space MSE (keeps the "
                        "guidance-bearing high-t segments weighted)")
    p.add_argument("--amp", type=str2bool, default=True,
                   help="bf16 activations (TPU fast path)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--result_path", type=str, default="./distill_results")
    p.add_argument("--run_name", type=str, default="distilled")
    p.add_argument("--log_every", type=int, default=50)
    return p


def distill(args) -> dict:
    tree = load_ckpt(args.weight_path)
    meta = tree["metadata"]
    if not meta.get("conditional", False):
        raise SystemExit("distillation requires a conditional checkpoint "
                         "(guidance baking needs a label embedding)")
    image_size = meta.get("image_size", 64)
    num_classes = meta.get("num_classes", 10)
    net_kwargs = {}
    if meta.get("channel"):
        net_kwargs["channel"] = tuple(meta["channel"])
    if args.amp:
        net_kwargs["dtype"] = jnp.bfloat16
    model = make_network(meta.get("network", "unet"),
                         num_classes=num_classes,
                         act=meta.get("act", "silu"), **net_kwargs)
    coeffs = make_diffusion(1000, meta.get("noise_schedule",
                                           "framework_linear"))
    teacher_params = tree["ema_model"] if (
        args.use_ema and tree.get("ema_model") is not None) \
        else tree["model"]
    teacher_params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(p, jnp.float32), teacher_params)

    dataset = ImageFolderDataset(args.dataset_path, image_size,
                                 seed=args.seed)
    data_axis = math.gcd(args.batch_size, jax.local_device_count())
    mesh = make_mesh(data_axis, 1)
    loader = BatchLoader(dataset, args.batch_size, seed=args.seed,
                         num_hosts=jax.process_count(),
                         host_id=jax.process_index())
    rng = jax.random.PRNGKey(args.seed)

    stages = [int(s) for s in args.stages.split(",")]
    history: dict = {"stages": {}}
    teacher_params = replicate(teacher_params, mesh)
    cdt = jnp.bfloat16 if args.amp else jnp.float32
    # a teacher whose metadata says guidance_baked is ALREADY distilled:
    # every stage runs CFG-free and the baked scale is carried through
    # (lets a driver invoke one stage per process, resumably)
    inherited_w = float(meta.get("guidance_baked") or 0.0)
    baked_w = inherited_w or float(args.cfg_scale)
    prior_stages = list(meta.get("distilled_stages") or [])
    for stage_idx, n_student in enumerate(stages):
        cfg_w = 0.0 if (stage_idx > 0 or inherited_w) \
            else float(args.cfg_scale)
        config = DistillConfig(
            n_student=n_student, cfg_w=cfg_w, lr=args.lr, optim=args.optim,
            steps=args.steps_per_stage, compute_dtype=cdt,
            loss_weight=args.loss_weight)
        state = replicate(
            create_distill_state(model, config,
                                 jax.device_get(teacher_params)), mesh)
        step_fn = make_distill_step(coeffs, config, model.apply)
        logger.info(f"stage {stage_idx}: {2 * n_student}->{n_student} "
                    f"steps, cfg_w={cfg_w}, {config.steps} updates")
        losses, done, t0 = [], 0, time.time()
        while done < config.steps:
            for batch in loader:
                if done >= config.steps:
                    break
                sharded = shard_batch(
                    {"x": jnp.asarray(batch[0]),
                     "y": jnp.asarray(batch[1], jnp.int32)}, mesh)
                rng, step_rng = jax.random.split(rng)
                state, metrics = step_fn(state, teacher_params,
                                         sharded["x"], sharded["y"],
                                         step_rng)
                losses.append(metrics["loss"])
                done += 1
                if done % args.log_every == 0:
                    recent = float(jnp.mean(jnp.stack(
                        losses[-args.log_every:])))
                    logger.info(f"stage {stage_idx} step {done}/"
                                f"{config.steps}: loss={recent:.5f} "
                                f"({done / (time.time() - t0):.2f} steps/s)")
        loss_curve = [float(v) for v in jnp.stack(losses)]
        stage_dir = f"{args.result_path}/{args.run_name}_s{n_student}"
        if jax.process_index() == 0:
            save_ckpt(
                stage_dir, epoch=done,
                params=jax.device_get(state.params),
                ema_params=jax.device_get(state.ema_params),
                num_classes=num_classes, conditional=True,
                image_size=image_size, sample="ddim",
                network=meta.get("network", "unet"),
                act=meta.get("act", "silu"),
                classes_name=meta.get("classes_name"),
                noise_schedule=meta.get("noise_schedule",
                                        "framework_linear"),
                channel=meta.get("channel"),
                sample_steps=n_student, sample_method="logsnr",
                guidance_baked=baked_w,
                distilled_stages=prior_stages + stages[: stage_idx + 1],
            )
        logger.info(f"stage {stage_idx} done: final loss "
                    f"{np.mean(loss_curve[-50:]):.5f} -> {stage_dir}")
        history["stages"][n_student] = {
            "loss_first50": float(np.mean(loss_curve[:50])),
            "loss_last50": float(np.mean(loss_curve[-50:])),
            "ckpt": f"{stage_dir}/ckpt_last",
        }
        # next stage's teacher = this stage's EMA student (CFG-free)
        teacher_params = state.ema_params
    return history


def main(argv=None):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    args = build_parser().parse_args(argv)
    return distill(args)


if __name__ == "__main__":
    main(sys.argv[1:])
