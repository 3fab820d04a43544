from advshadow_tpu.train.checkpoint import (
    export_params_npz,
    filter_pretrain_params,
    load_ckpt,
    load_ckpt_params,
    restore_ckpt_from_npz,
    save_ckpt,
    separate_ckpt_weights,
    wait_for_async_saves,
)
from advshadow_tpu.train.distill import (
    DistillConfig,
    create_distill_state,
    distill_grid,
    implied_x0_target,
    make_distill_step,
)
from advshadow_tpu.train.lr import LR_FUNCS, cosine_lr, make_lr_schedule
from advshadow_tpu.train.trainer import (
    OPTIMIZERS,
    TrainConfig,
    TrainState,
    create_train_state,
    ema_update,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "filter_pretrain_params",
    "load_ckpt",
    "load_ckpt_params",
    "save_ckpt",
    "separate_ckpt_weights",
    "wait_for_async_saves",
    "DistillConfig",
    "create_distill_state",
    "distill_grid",
    "implied_x0_target",
    "make_distill_step",
    "LR_FUNCS",
    "cosine_lr",
    "make_lr_schedule",
    "OPTIMIZERS",
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "ema_update",
    "make_optimizer",
    "make_train_step",
]
