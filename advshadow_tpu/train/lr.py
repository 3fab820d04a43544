"""Learning-rate schedules.

Per-epoch cosine schedule with optional linear warmup, matching the
reference's ``set_cosine_lr`` (ref: utils/lr_scheduler.py:11-35) and its
``lr_initializer`` wiring (lr_min = 0.01 * init_lr,
ref: utils/initializer.py:178-198).  Exposed both as a per-epoch function
(reference parity) and as an optax per-step schedule.
"""

from __future__ import annotations

import math

import optax

__all__ = ["cosine_lr", "make_lr_schedule", "LR_FUNCS"]


def cosine_lr(
    current_epoch: int,
    max_epoch: int,
    lr_min: float = 0.0,
    lr_max: float = 0.1,
    warmup: bool = True,
    num_warmup: int = 5,
) -> float:
    """Exact ``set_cosine_lr`` math (ref: utils/lr_scheduler.py:11-35)."""
    warmup_epoch = num_warmup if warmup else 0
    if current_epoch < warmup_epoch:
        return lr_max * current_epoch / warmup_epoch
    if current_epoch < max_epoch:
        return lr_min + (lr_max - lr_min) * (
            1 + math.cos(math.pi * (current_epoch - warmup_epoch)
                         / (max_epoch - warmup_epoch))) / 2
    return lr_min + (lr_max - lr_min) * (
        1 + math.cos(math.pi * (current_epoch - max_epoch) / max_epoch)) / 2


def make_lr_schedule(
    lr_func: str,
    init_lr: float,
    epochs: int,
    steps_per_epoch: int,
) -> optax.Schedule:
    """Per-step optax schedule mirroring ``lr_initializer``:
    'cosine' (no warmup), 'warmup_cosine' (5-epoch linear warmup), anything
    else constant (ref: utils/initializer.py:189-196).  The lr changes at
    epoch granularity, exactly like the reference."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        import jax.numpy as jnp

        if lr_func not in ("cosine", "warmup_cosine"):
            return jnp.asarray(init_lr, jnp.float32)
        lr_min, lr_max = init_lr * 0.01, init_lr
        warmup_epoch = 5 if lr_func == "warmup_cosine" else 0
        e = epoch.astype(jnp.float32) if hasattr(epoch, "astype") else float(epoch)
        warm = lr_max * e / max(warmup_epoch, 1)
        cos = lr_min + (lr_max - lr_min) * (
            1 + jnp.cos(jnp.pi * (e - warmup_epoch) / (epochs - warmup_epoch))
        ) / 2
        return jnp.where(e < warmup_epoch, warm, cos)

    return schedule


#: the working equivalent of the reference's missing ``config.choices``
#: lr-function list.
LR_FUNCS = ("linear", "cosine", "warmup_cosine")
