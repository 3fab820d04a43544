"""Shadow-diffusion training CLI — the paper's core loop.

Re-design of ref: tools/train_shadow.py + ddim2/main2.py:68-213: every
batch is first turned into adversarially-shadowed images (shadow
parameter optimization + masked pixel attack against a frozen victim),
then the diffusion model trains on the shadowed batch so it learns to
generate adversarial shadows conditionally.

TPU design: the reference runs the attack per-image in Python
(ddim2/main2.py:159-168); here the whole batch goes through ONE jitted
``batched_optimize_shadow`` region, then one jitted diffusion train step.
Targeted mode draws a random wrong label per image
(ref: ddim2/main2.py:160-167); non-targeted uses the true label
(ref: ddim2/test_main.py:160-168).
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from advshadow_tpu.utils.choices import str2bool
from advshadow_tpu.attack import TRAIN_CONFIG, ShadowOptConfig, \
    batched_optimize_shadow
from advshadow_tpu.cli.train import build_parser as build_train_parser
from advshadow_tpu.core import make_diffusion
from advshadow_tpu.data import BatchLoader, ShadowPairDataset
from advshadow_tpu.models import make_network
from advshadow_tpu.ops.image import to_uint8
from advshadow_tpu.parallel import make_mesh, replicate, shard_batch
from advshadow_tpu.samplers import make_denoise_fn, make_sampler
from advshadow_tpu.train import TrainConfig, create_train_state, \
    make_train_step, save_ckpt
from advshadow_tpu.utils import append_args_log, get_logger, save_images, \
    seed_initializer, setup_logging
from advshadow_tpu.victims import OXFORD_PET_CLASSES, make_victim_fn, \
    make_victim_model

logger = get_logger("train_shadow")


def build_parser() -> argparse.ArgumentParser:
    p = build_train_parser()
    p.description = "AdvShadow-TPU shadow-diffusion trainer"
    p.add_argument("--mask_dir", type=str, required=True)
    p.add_argument("--labels_json", type=str, default=None)
    p.add_argument("--victim", type=str, default="resnet18")
    p.add_argument("--victim_ckpt", type=str, default=None,
                   help="npz of ported victim variables")
    p.add_argument("--targeted", type=str2bool, default=True)
    p.add_argument("--untargeted", type=str, default="compat",
                   choices=["compat", "ascent"],
                   help="untargeted semantics with --targeted 0: 'compat' "
                        "= the reference's true-label CE-descending inner "
                        "attack (ref ddim2/test_main.py:160-168, a "
                        "measured no-op); 'ascent' = self-label CE ascent "
                        "(ref ddim2/adv_test.py:29-30)")
    p.add_argument("--shadow_intensity", type=float, default=0.43)
    p.add_argument("--shadow_iterations", type=int, default=1)
    p.add_argument("--attack_epsilon", type=float, default=0.05)
    p.add_argument("--attack_alpha", type=float, default=0.005)
    p.add_argument("--attack_iterations", type=int, default=20)
    p.add_argument("--soft_mask", type=str2bool, default=True)
    return p


def _load_victim(args, image_size: int, rng):
    model = make_victim_model(args.victim, num_classes=args.num_classes)
    if args.victim_ckpt:
        from advshadow_tpu.victims import load_variables

        variables = load_variables(args.victim_ckpt)
    else:
        logger.warning("no --victim_ckpt: using randomly initialized victim "
                       "(smoke/benchmark mode)")
        variables = jax.jit(model.init)(
            rng, jnp.zeros((1, image_size, image_size, 3)))
    return make_victim_fn(model, variables)


def train_shadow(args) -> dict:
    rng = seed_initializer(args.seed)
    # the data axis must divide the per-host batch; park extra devices
    import math

    data_axis = math.gcd(args.batch_size, jax.local_device_count())
    mesh = make_mesh(data=data_axis, devices=jax.devices()[:data_axis])
    dirs = setup_logging(args.result_path, args.run_name)
    append_args_log(dirs["results_dir"], args)

    dataset = ShadowPairDataset(
        args.dataset_path, args.mask_dir, args.image_size,
        labels_json=args.labels_json,
        class_names=(OXFORD_PET_CLASSES
                     if args.labels_json and args.num_classes == 37
                     else None),
        seed=args.seed,
    )
    loader = BatchLoader(dataset, args.batch_size, seed=args.seed,
                         num_hosts=jax.process_count(),
                         host_id=jax.process_index())
    num_classes = len(dataset.classes) or args.num_classes
    steps_per_epoch = max(len(loader), 1)

    victim_fn = _load_victim(args, args.image_size, rng)
    attack_cfg = ShadowOptConfig(
        iterations=args.shadow_iterations,
        optimizer=TRAIN_CONFIG.optimizer,
        radius_init=TRAIN_CONFIG.radius_init,
        adv_weight=TRAIN_CONFIG.adv_weight,
        reg_weight=TRAIN_CONFIG.reg_weight,
        shadow_intensity=args.shadow_intensity,
        inner="iga",
        inner_epsilon=args.attack_epsilon,
        inner_alpha=args.attack_alpha,
        inner_iterations=args.attack_iterations,
        hard=not args.soft_mask,
        untargeted_ascent=(not args.targeted
                           and args.untargeted == "ascent"),
    )

    net_kwargs = {}
    if getattr(args, "channels", None):
        net_kwargs["channel"] = tuple(
            int(c) for c in args.channels.split(","))
    model = make_network(args.network, num_classes=num_classes, act=args.act,
                         **net_kwargs)
    coeffs = make_diffusion(1000, args.noise_schedule)
    config = TrainConfig(lr=args.lr, optim=args.optim, lr_func=args.lr_func,
                         epochs=args.epochs, steps_per_epoch=steps_per_epoch,
                         conditional=True, loss=getattr(args, "loss", "mse"),
                         compute_dtype=jnp.bfloat16 if args.amp
                         else jnp.float32)
    sample_x = jnp.zeros((args.batch_size, args.image_size, args.image_size, 3))
    sample_y = jnp.zeros((args.batch_size,), jnp.int32)
    state = create_train_state(model, rng, sample_x, config, labels=sample_y)

    start_epoch = 0
    if args.resume:
        from advshadow_tpu.train import load_ckpt

        last = f"{dirs['results_dir']}/ckpt_last"
        target = {"model": state.params, "ema_model": state.ema_params,
                  "optimizer": state.opt_state}
        try:
            tree = load_ckpt(last, target=target)
        except ValueError:
            # older checkpoints saved without the optimizer state
            target.pop("optimizer")
            tree = load_ckpt(last, target=target)
        state = state.replace(params=tree["model"],
                              ema_params=tree["ema_model"],
                              opt_state=tree.get("optimizer",
                                                 state.opt_state))
        start_epoch = (args.start_epoch if args.start_epoch is not None
                       else tree["metadata"].get("start_epoch", 0) + 1)
        state = state.replace(step=jnp.asarray(
            start_epoch * steps_per_epoch, state.step.dtype))
        logger.info(f"resumed from epoch {start_epoch}")

    state = replicate(state, mesh)
    step_fn = make_train_step(coeffs, config, donate=True)
    sampler = make_sampler(args.sample)

    losses_hist = []
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        losses = []
        for batch in loader:
            images_pm1, masks, labels = batch[0], batch[1], batch[2]
            images01 = (jnp.asarray(images_pm1) + 1.0) / 2.0
            masks = jnp.asarray(masks)
            labels = jnp.asarray(labels, jnp.int32)

            rng, a_rng, t_rng, s_rng = jax.random.split(rng, 4)
            if args.targeted:
                # random label != true (ref: ddim2/main2.py:160-167)
                offset = jax.random.randint(t_rng, labels.shape, 1,
                                            num_classes)
                targets = (labels + offset) % num_classes
            else:
                targets = labels

            shadowed = batched_optimize_shadow(
                victim_fn, images01, masks, targets, a_rng, attack_cfg
            ).image
            shadowed_pm1 = shadowed * 2.0 - 1.0

            sharded = shard_batch({"x": shadowed_pm1, "y": labels}, mesh)
            state, metrics = step_fn(state, sharded["x"], sharded["y"], s_rng)
            losses.append(metrics["loss"])

        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else np.nan
        logger.info(f"epoch {epoch}: loss={mean_loss:.5f} "
                    f"({time.time() - t0:.1f}s)")
        losses_hist.append(mean_loss)

        if args.vis and jax.process_index() == 0:
            n = min(num_classes, 16)
            # bf16 + sub-batching at >=128 px: an f32 CFG-2N sample at
            # the flagship's full-res attention crashes the axon relay
            vis_model = (make_network(args.network, num_classes=num_classes,
                                      act=args.act, dtype=jnp.bfloat16,
                                      **net_kwargs)
                         if args.amp else model)
            chunk = 8 if args.image_size >= 128 else n
            vis_kwargs = ({"sample_steps": args.vis_sample_steps}
                          if args.vis_sample_steps
                          and args.sample != "ddpm" else {})
            rows = []
            for s in range(0, n, chunk):
                m = min(chunk, n - s)
                denoise = make_denoise_fn(
                    vis_model.apply, state.ema_params,
                    jnp.arange(s, s + m, dtype=jnp.int32), args.cfg_scale)
                rng, vis_rng = jax.random.split(rng)
                x = sampler(coeffs, denoise, vis_rng,
                            (m, args.image_size, args.image_size, 3),
                            **vis_kwargs)
                rows.append(np.asarray(to_uint8(x)))
            save_images(np.concatenate(rows),
                        f"{dirs['vis_dir']}/{args.run_name}-{epoch}."
                        f"{args.image_format}")

        if jax.process_index() == 0 and (
                epoch % args.ckpt_every == 0 or epoch == args.epochs - 1):
            save_ckpt(
                dirs["results_dir"], epoch,
                params=jax.device_get(state.params),
                ema_params=jax.device_get(state.ema_params),
                opt_state=jax.device_get(state.opt_state),
                num_classes=num_classes, conditional=True,
                image_size=args.image_size, sample=args.sample,
                network=args.network, act=args.act,
                classes_name=dataset.classes,
                noise_schedule=args.noise_schedule,
                channel=list(net_kwargs.get("channel", [])) or None,
            )
    return {"loss": losses_hist, "results_dir": dirs["results_dir"]}


def main(argv=None):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    args = build_parser().parse_args(argv)
    return train_shadow(args)


if __name__ == "__main__":
    main(sys.argv[1:])
