"""Victim classifier fine-tuning CLI.

The reference assumes ready-made victims (fastai .pkl learners, timm/HF
checkpoints, ref: ASR_fast.py:16-88); this closes the loop by training a
zoo classifier on an ImageFolder dataset in-framework: cross-entropy on
any :mod:`advshadow_tpu.victims` architecture, optionally starting from
ported torch weights (linear-probe or full fine-tune), with top-1
accuracy on a held-out split.

BatchNorm runs with frozen (inference) statistics — the standard
fine-tuning setup for ported backbones; trained victims save their
variables for ``--victim_ckpt`` across the attack/eval CLIs.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from advshadow_tpu.utils.choices import str2bool
from advshadow_tpu.data import BatchLoader, ImageFolderDataset
from advshadow_tpu.parallel import make_mesh, replicate, shard_batch
from advshadow_tpu.utils import append_args_log, get_logger, \
    seed_initializer, setup_logging
from advshadow_tpu.victims import VICTIMS, imagenet_normalize, \
    make_victim_model
from advshadow_tpu.victims.zoo import safe_argmax

logger = get_logger("train_victim")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="AdvShadow-TPU victim trainer")
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--victim", type=str, default="resnet18",
                   choices=sorted(VICTIMS))
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--init_ckpt", type=str, default=None,
                   help="npz (or legacy pkl) of ported variables to "
                        "start from")
    p.add_argument("--head_only", type=str2bool, default=False,
                   help="linear probe: train only Dense layers")
    p.add_argument("--result_path", type=str, default="./results")
    p.add_argument("--run_name", type=str, default="victim")
    return p


def train_victim(args) -> dict:
    rng = seed_initializer(args.seed)
    import math

    data_axis = math.gcd(args.batch_size, jax.local_device_count())
    mesh = make_mesh(data=data_axis, devices=jax.devices()[:data_axis])
    dirs = setup_logging(args.result_path, args.run_name)
    append_args_log(dirs["results_dir"], args)

    train_ds = ImageFolderDataset(args.dataset_path, args.image_size,
                                  seed=args.seed, split="train")
    val_ds = ImageFolderDataset(args.dataset_path, args.image_size,
                                seed=args.seed, split="val")
    num_classes = len(train_ds.classes)
    loader = BatchLoader(train_ds, args.batch_size, seed=args.seed,
                         num_hosts=jax.process_count(),
                         host_id=jax.process_index())

    model = make_victim_model(args.victim, num_classes=num_classes)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, args.image_size, args.image_size, 3)))
    if args.init_ckpt:
        from advshadow_tpu.victims import load_variables

        loaded = load_variables(args.init_ckpt)
        from advshadow_tpu.train import filter_pretrain_params

        variables = jax.tree_util.tree_map(lambda x: x, variables)
        variables = {
            k: (filter_pretrain_params(variables[k], loaded.get(k, {}),
                                       reset_label_embedding=False)
                if k in loaded else variables[k])
            for k in variables
        }
        logger.info("initialized from ported checkpoint (shape-filtered)")

    params = variables["params"]
    frozen = {k: v for k, v in variables.items() if k != "params"}

    def trainable_mask(tree):
        if not args.head_only:
            return jax.tree_util.tree_map(lambda _: True, tree)
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for path, _ in flat:
            key = jax.tree_util.keystr(path)
            out[key] = any(h in key for h in ("fc", "head", "classifier"))
        paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = [out[jax.tree_util.keystr(k)] for k, _ in paths]
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree), leaves)

    tx = optax.multi_transform(
        {"train": optax.adamw(args.lr), "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable_mask(params)),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p, **frozen},
                                 imagenet_normalize(x))
            one_hot = jax.nn.one_hot(y, num_classes)
            loss = optax.softmax_cross_entropy(logits, one_hot).mean()
            acc = (safe_argmax(logits) == y).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    @jax.jit
    def eval_fn(params, x, y):
        logits = model.apply({"params": params, **frozen},
                             imagenet_normalize(x))
        return (safe_argmax(logits) == y).mean()

    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)

    hist = []
    for epoch in range(args.epochs):
        t0 = time.time()
        losses, accs = [], []
        for x, y in loader:
            x01 = (jnp.asarray(x) + 1.0) / 2.0  # dataset emits [-1,1]
            sharded = shard_batch({"x": x01,
                                   "y": jnp.asarray(y, jnp.int32)}, mesh)
            params, opt_state, loss, acc = step_fn(
                params, opt_state, sharded["x"], sharded["y"])
            losses.append(loss)
            accs.append(acc)
        # validation
        val_accs = []
        for i in range(0, len(val_ds), args.batch_size):
            items = [val_ds[j] for j in range(
                i, min(i + args.batch_size, len(val_ds)))]
            if len(items) < 2:
                continue
            vx = (jnp.asarray(np.stack([it[0] for it in items])) + 1) / 2
            vy = jnp.asarray([it[1] for it in items], jnp.int32)
            val_accs.append(float(eval_fn(params, vx, vy)))
        train_acc = float(jnp.mean(jnp.stack(accs))) if accs else 0.0
        val_acc = float(np.mean(val_accs)) if val_accs else float("nan")
        logger.info(f"epoch {epoch}: loss="
                    f"{float(jnp.mean(jnp.stack(losses))):.4f} "
                    f"acc={train_acc:.3f} val_acc={val_acc:.3f} "
                    f"({time.time() - t0:.1f}s)")
        hist.append(train_acc)

    from advshadow_tpu.victims import save_variables

    out_path = save_variables(
        f"{dirs['results_dir']}/victim_{args.victim}.npz",
        {"params": jax.device_get(params), **frozen})
    logger.info(f"saved victim variables to {out_path}")
    return {"train_acc": hist, "ckpt": out_path,
            "classes": train_ds.classes}


def main(argv=None):
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    args = build_parser().parse_args(argv)
    return train_victim(args)


if __name__ == "__main__":
    main(sys.argv[1:])
