"""Super-resolution training CLI (SRv1).

The reference vendors the SRv1 network and an ``sr_network`` registry
(ref: utils/initializer.py:99-112) plus a ``get_sr_dataset`` loader whose
``SRDataset`` module is missing from the snapshot (ref:
utils/utils.py:20,164-174); this supplies the full working path: LR/HR
pair dataset, jitted MSE train step with per-epoch PSNR, cosine LR, EMA,
orbax checkpoints.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from advshadow_tpu.data.dataset import BatchLoader
from advshadow_tpu.data.sr_dataset import SRDataset
from advshadow_tpu.eval.psnr_ssim import psnr
from advshadow_tpu.models import SR_NETWORKS
from advshadow_tpu.parallel import make_mesh, replicate, shard_batch
from advshadow_tpu.train import save_ckpt
from advshadow_tpu.train.lr import make_lr_schedule
from advshadow_tpu.train.trainer import ema_update
from advshadow_tpu.utils import append_args_log, choices, get_logger, \
    seed_initializer, setup_logging

logger = get_logger("train_sr")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="AdvShadow-TPU SR trainer")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--network", type=str, default="srv1",
                   choices=choices.sr_network_choices)
    p.add_argument("--run_name", type=str, default="sr")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--image_size", type=int, default=128,
                   help="HR crop size; LR is image_size/scale")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_func", type=str, default="warmup_cosine",
                   choices=choices.lr_func_choices)
    p.add_argument("--act", type=str, default="silu",
                   choices=choices.act_choices)
    p.add_argument("--result_path", type=str, default="./results")
    p.add_argument("--n_blocks", type=int, default=6)
    p.add_argument("--channels", type=str, default="64")
    return p


def train_sr(args) -> dict:
    rng = seed_initializer(args.seed)
    import math

    data_axis = math.gcd(args.batch_size, jax.local_device_count())
    mesh = make_mesh(data=data_axis, devices=jax.devices()[:data_axis])
    dirs = setup_logging(args.result_path, args.run_name)
    append_args_log(dirs["results_dir"], args)

    dataset = SRDataset(args.image_size, args.dataset_path, args.scale,
                        seed=args.seed)
    loader = BatchLoader(dataset, args.batch_size, seed=args.seed,
                         num_hosts=jax.process_count(),
                         host_id=jax.process_index())
    steps_per_epoch = max(len(loader), 1)

    channel = tuple(int(c) for c in args.channels.split(","))
    model = SR_NETWORKS[args.network](channel=channel, n=args.n_blocks,
                                      scale=args.scale, act=args.act)
    lr_in = args.image_size // args.scale
    params = jax.jit(model.init)(rng, jnp.zeros((1, lr_in, lr_in, 3)))
    schedule = make_lr_schedule(args.lr_func, args.lr, args.epochs,
                                steps_per_epoch)
    tx = optax.adam(schedule)
    opt_state = tx.init(params)
    ema_params = jax.tree_util.tree_map(jnp.copy, params)
    step_count = jnp.zeros((), jnp.int32)

    @jax.jit
    def step_fn(params, ema_params, opt_state, step_count, lr_img, hr_img):
        def loss_fn(p):
            pred = model.apply(p, lr_img)
            return jnp.mean(jnp.square(pred - hr_img)), pred

        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_update(ema_params, params, step_count, 0.995, 2000)
        metrics = {"loss": loss, "psnr": psnr(pred, hr_img, 1.0)}
        return params, ema_params, opt_state, step_count + 1, metrics

    params = replicate(params, mesh)
    ema_params = replicate(ema_params, mesh)
    opt_state = replicate(opt_state, mesh)

    hist = []
    for epoch in range(args.epochs):
        t0 = time.time()
        losses, psnrs = [], []
        for lr_img, hr_img in loader:
            sharded = shard_batch({"lr": jnp.asarray(lr_img),
                                   "hr": jnp.asarray(hr_img)}, mesh)
            params, ema_params, opt_state, step_count, m = step_fn(
                params, ema_params, opt_state, step_count,
                sharded["lr"], sharded["hr"])
            losses.append(m["loss"])
            psnrs.append(m["psnr"])
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else np.nan
        mean_psnr = float(jnp.mean(jnp.stack(psnrs))) if psnrs else np.nan
        logger.info(f"epoch {epoch}: loss={mean_loss:.5f} "
                    f"psnr={mean_psnr:.2f}dB ({time.time() - t0:.1f}s)")
        hist.append(mean_loss)
        if jax.process_index() == 0:
            save_ckpt(dirs["results_dir"], epoch,
                      params=jax.device_get(params),
                      ema_params=jax.device_get(ema_params),
                      network=args.network, image_size=args.image_size,
                      scale=args.scale, act=args.act, conditional=False,
                      channel=list(channel), n_blocks=args.n_blocks)
    return {"loss": hist, "results_dir": dirs["results_dir"]}


def main(argv=None):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    args = build_parser().parse_args(argv)
    return train_sr(args)


if __name__ == "__main__":
    main(sys.argv[1:])
