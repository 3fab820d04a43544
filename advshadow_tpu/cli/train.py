"""Training CLI — the framework's primary entry point.

Mirrors the reference CLI surface (ref: tools/train.py:292-397) while
running the TPU-native SPMD pipeline: data-sharded batches over a device
mesh, one jitted train step, EMA, per-epoch vis sampling, orbax
checkpoints with self-describing metadata, TensorBoard + train.log.

Distributed flags (--distributed/--main_gpu/--world_size) are accepted
for surface compatibility; SPMD needs no process spawning on a single
host — multi-host runs use ``jax.distributed`` via --coordinator.
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
from advshadow_tpu.data import BatchLoader, ImageFolderDataset
from advshadow_tpu.models import make_network
from advshadow_tpu.ops.image import to_uint8
from advshadow_tpu.parallel import (
    initialize_distributed,
    make_mesh,
    replicate,
    shard_batch,
)
from advshadow_tpu.samplers import make_denoise_fn, make_sampler
from advshadow_tpu.train import (
    TrainConfig,
    create_train_state,
    filter_pretrain_params,
    load_ckpt,
    make_train_step,
    save_ckpt,
)
from advshadow_tpu.utils import (
    append_args_log,
    choices,
    get_logger,
    save_images,
    seed_initializer,
    setup_logging,
)

logger = get_logger("train")


def build_parser() -> argparse.ArgumentParser:
    """Flag surface of ref: tools/train.py:297-395."""
    p = argparse.ArgumentParser(description="AdvShadow-TPU diffusion trainer")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--conditional", type=str2bool, default=True)
    p.add_argument("--sample", type=str, default="ddpm",
                   choices=choices.sample_choices)
    p.add_argument("--network", type=str, default="unet",
                   choices=choices.network_choices)
    p.add_argument("--run_name", type=str, default="df")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--amp", type=str2bool, default=False,
                   help="bf16 compute (TPU-native AMP equivalent)")
    p.add_argument("--optim", type=str, default="adamw",
                   choices=choices.optim_choices)
    p.add_argument("--act", type=str, default="gelu",
                   choices=choices.act_choices)
    p.add_argument("--loss", type=str, default="mse",
                   choices=choices.loss_choices)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--lr_func", type=str, default="linear",
                   choices=choices.lr_func_choices)
    p.add_argument("--result_path", type=str, default="./results")
    p.add_argument("--save_model_interval", type=str2bool, default=False)
    p.add_argument("--start_model_interval", type=int, default=-1)
    p.add_argument("--vis", type=str2bool, default=True)
    p.add_argument("--num_vis", type=int, default=-1)
    p.add_argument("--vis_sample_steps", type=int, default=None,
                   help="sampler steps for the per-epoch vis grids "
                        "(default: the sampler's own default, 500 for "
                        "framework ddim/plms — the reference's per-epoch "
                        "cost; lower for cheaper vis)")
    p.add_argument("--image_format", type=str, default="png",
                   choices=choices.image_format_choices)
    p.add_argument("--noise_schedule", type=str, default="framework_linear",
                   choices=choices.noise_schedule_choices)
    p.add_argument("--resume", type=str2bool, default=False)
    p.add_argument("--start_epoch", type=int, default=None)
    p.add_argument("--pretrain", type=str2bool, default=False)
    p.add_argument("--pretrain_path", type=str, default=None)
    p.add_argument("--cfg_scale", type=int, default=3)
    p.add_argument("--num_classes", type=int, default=37)
    # surface-compat distributed flags (SPMD needs no spawning)
    p.add_argument("--distributed", type=str2bool, default=False)
    p.add_argument("--main_gpu", type=int, default=0)
    p.add_argument("--world_size", type=int, default=1)
    p.add_argument("--use_gpu", type=int, default=0)
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--profile", type=str2bool, default=False,
                   help="write a jax.profiler trace for epoch 0 into the "
                        "run's tensorboard dir")
    p.add_argument("--debug_nans", type=str2bool, default=False)
    p.add_argument("--channels", type=str, default=None,
                   help="comma-separated channel list override, e.g. "
                        "'8,16,32,64,128,256' (unet/cspdarkunet)")
    p.add_argument("--model_channels", type=int, default=None,
                   help="base width override for the unet_ddpm family")
    p.add_argument("--ckpt_every", type=int, default=1,
                   help="save ckpt_last every N epochs (the final epoch "
                        "always saves); >1 skips the per-epoch params "
                        "device_get, which costs ~14s at flagship size "
                        "through the remote-chip tunnel")
    return p


def train(args) -> dict:
    rng = seed_initializer(args.seed)
    if getattr(args, "debug_nans", False):
        from advshadow_tpu.utils import enable_nan_debugging

        enable_nan_debugging(True)
    if args.world_size > 1:
        initialize_distributed(args.coordinator, args.world_size,
                               args.process_id)
    # the data axis must divide the per-host batch; park extra devices
    import math

    data_axis = math.gcd(args.batch_size, jax.local_device_count())
    mesh = make_mesh(data=data_axis, devices=jax.devices()[:data_axis])
    dirs = setup_logging(args.result_path, args.run_name)
    append_args_log(dirs["results_dir"], args)

    tb = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(dirs["tb_dir"])
    except Exception:  # pragma: no cover
        logger.warning("TensorBoard unavailable; JSON metrics only")

    dataset = ImageFolderDataset(args.dataset_path, args.image_size,
                                 seed=args.seed)
    loader = BatchLoader(dataset, args.batch_size, seed=args.seed,
                         num_hosts=jax.process_count(),
                         host_id=jax.process_index())
    steps_per_epoch = max(len(loader), 1)
    num_classes = len(dataset.classes) or args.num_classes

    net_kwargs = {}
    if getattr(args, "channels", None):
        net_kwargs["channel"] = tuple(
            int(c) for c in args.channels.split(","))
    if getattr(args, "model_channels", None):
        net_kwargs["model_channels"] = args.model_channels
    model = make_network(
        args.network,
        num_classes=num_classes if args.conditional else None,
        act=args.act,
        **net_kwargs,
    )
    coeffs = make_diffusion(1000, args.noise_schedule)
    config = TrainConfig(
        lr=args.lr, optim=args.optim, lr_func=args.lr_func,
        epochs=args.epochs, steps_per_epoch=steps_per_epoch,
        conditional=args.conditional, loss=getattr(args, "loss", "mse"),
        compute_dtype=jnp.bfloat16 if args.amp else jnp.float32,
    )

    sample_x = jnp.zeros((args.batch_size, args.image_size, args.image_size, 3))
    sample_y = jnp.zeros((args.batch_size,), jnp.int32) if args.conditional else None
    state = create_train_state(model, rng, sample_x, config, labels=sample_y)

    start_epoch = 0
    if args.resume:
        target = {"model": state.params, "ema_model": state.ema_params,
                  "optimizer": state.opt_state}
        tree = load_ckpt(f"{dirs['results_dir']}/ckpt_last", target=target)
        state = state.replace(params=tree["model"],
                              ema_params=tree["ema_model"],
                              opt_state=tree["optimizer"])
        # metadata start_epoch records the epoch that FINISHED; resume at
        # the next one (same semantics as cli/train_shadow.py), and restore
        # the step counter so the EMA warmup threshold is not re-triggered.
        start_epoch = (args.start_epoch if args.start_epoch is not None
                       else tree["metadata"].get("start_epoch", 0) + 1)
        state = state.replace(step=jnp.asarray(
            start_epoch * steps_per_epoch, state.step.dtype))
        logger.info(f"resumed from epoch {start_epoch}")
    elif args.pretrain and args.pretrain_path:
        tree = load_ckpt(args.pretrain_path)
        merged = filter_pretrain_params(state.params, tree["model"])
        state = state.replace(params=merged, ema_params=merged)
        logger.info("loaded pretrain weights (label embedding reset)")

    state = replicate(state, mesh)
    step_fn = make_train_step(coeffs, config, donate=True)
    sampler = make_sampler(args.sample)

    metrics_hist = []
    profile_ctx = None
    for epoch in range(start_epoch, args.epochs):
        if getattr(args, "profile", False) and epoch == start_epoch:
            from advshadow_tpu.utils import trace as _trace

            profile_ctx = _trace(dirs["tb_dir"])
            profile_ctx.__enter__()
        t0 = time.time()
        losses = []
        for batch in loader:
            x, y = batch[0], batch[1]
            sharded = shard_batch(
                {"x": jnp.asarray(x), "y": jnp.asarray(y, jnp.int32)}, mesh)
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, sharded["x"], sharded["y"],
                                     step_rng)
            losses.append(metrics["loss"])
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)
            profile_ctx = None
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else np.nan
        dt = time.time() - t0
        logger.info(f"epoch {epoch}: loss={mean_loss:.5f} ({dt:.1f}s, "
                    f"{steps_per_epoch / max(dt, 1e-9):.2f} steps/s)")
        metrics_hist.append(mean_loss)
        if tb:
            tb.add_scalar("train/loss", mean_loss, epoch)

        if args.vis and jax.process_index() == 0:
            n = num_classes if args.num_vis <= 0 else args.num_vis
            n = min(n, 16)
            # vis sampling runs the net in bf16 under amp and sub-batches
            # at >=128 px: an f32 CFG-2N sample at the 128 px flagship's
            # full-res attention crashes the axon relay (params are f32
            # either way; vis grids are uint8)
            vis_model = (make_network(
                args.network,
                num_classes=num_classes if args.conditional else None,
                act=args.act, dtype=jnp.bfloat16, **net_kwargs)
                if args.amp else model)
            chunk = 8 if args.image_size >= 128 else n
            vis_kwargs = ({"sample_steps": args.vis_sample_steps}
                          if args.vis_sample_steps
                          and args.sample != "ddpm" else {})
            # the reference saves grids from BOTH the raw and the EMA model
            # per epoch (ref: tools/train.py:240-258)
            for tag, p_ in (("", state.params), ("_ema", state.ema_params)):
                rows = []
                for s in range(0, n, chunk):
                    m = min(chunk, n - s)
                    labels = (jnp.arange(s, s + m, dtype=jnp.int32)
                              % num_classes if args.conditional else None)
                    denoise = make_denoise_fn(
                        vis_model.apply, p_, labels,
                        args.cfg_scale if args.conditional else None)
                    rng, vis_rng = jax.random.split(rng)
                    x = sampler(coeffs, denoise, vis_rng,
                                (m, args.image_size, args.image_size, 3),
                                **vis_kwargs)
                    rows.append(np.asarray(to_uint8(x)))
                save_images(np.concatenate(rows),
                            f"{dirs['vis_dir']}/{args.run_name}-{epoch}{tag}."
                            f"{args.image_format}")

        if jax.process_index() == 0 and (
                epoch % args.ckpt_every == 0 or epoch == args.epochs - 1):
            save_ckpt(
                dirs["results_dir"], epoch,
                params=jax.device_get(state.params),
                ema_params=jax.device_get(state.ema_params),
                opt_state=jax.device_get(state.opt_state),
                save_name=f"ckpt_{epoch}",
                save_model_interval=args.save_model_interval,
                start_model_interval=args.start_model_interval,
                num_classes=num_classes if args.conditional else 1,
                conditional=args.conditional, image_size=args.image_size,
                sample=args.sample, network=args.network, act=args.act,
                classes_name=dataset.classes,
                noise_schedule=args.noise_schedule,
                channel=list(net_kwargs.get("channel", [])) or None,
            )
    return {"loss": metrics_hist, "results_dir": dirs["results_dir"]}


def main(argv=None):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    args = build_parser().parse_args(argv)
    return train(args)


if __name__ == "__main__":
    main(sys.argv[1:])
