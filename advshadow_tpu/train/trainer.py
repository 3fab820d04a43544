"""Training: jitted SPMD train step with EMA and CFG label dropout.

TPU re-design of the reference's train loop (ref: tools/train.py:37-275):

- the whole step (timestep draw, q_sample, forward, MSE, grads, optax
  update, EMA) is ONE jitted function; with a data-sharded batch and
  replicated params XLA inserts the gradient all-reduce over ICI — the
  SPMD replacement for DDP + GradScaler + per-step host logic.
- classifier-free-guidance label dropout keeps the reference's semantics
  (whole batch dropped to unconditional with p=0.1,
  ref: tools/train.py:201-204) but draws from the jitted PRNG stream.
- EMA is a pytree incremental update with the reference's warmup rule:
  copy params until ``step_start_ema``, then decay at ``beta``
  (ref: model/modules/ema.py:46-69).
- AMP: TPUs natively accumulate bf16 matmuls in f32; ``compute_dtype``
  bf16 replaces CUDA GradScaler machinery (ref: tools/train.py:193-215).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from advshadow_tpu.core import DiffusionCoefficients, q_sample
from advshadow_tpu.train.lr import make_lr_schedule

__all__ = ["TrainConfig", "TrainState", "make_optimizer", "create_train_state",
           "make_train_step", "ema_update", "OPTIMIZERS", "LOSSES",
           "make_loss_fn"]

#: optimizer registry (working equivalent of the missing ``config.choices``
#: optimizer list, ref: utils/initializer.py:145-153)
OPTIMIZERS = ("adam", "adamw", "sgd")

#: loss registry (ref: utils/initializer.py:115-130 loss_initializer)
LOSSES = ("mse", "l1", "huber", "smooth_l1")


def make_loss_fn(name: str):
    import jax.numpy as _jnp

    def _err(noise, pred):
        return pred.astype(_jnp.float32) - noise.astype(_jnp.float32)

    if name == "mse":
        return lambda n, p: _jnp.mean(_jnp.square(_err(n, p)))
    if name == "l1":
        return lambda n, p: _jnp.mean(_jnp.abs(_err(n, p)))
    if name in ("huber", "smooth_l1"):  # torch SmoothL1/Huber, delta=1
        def fn(n, p):
            e = _jnp.abs(_err(n, p))
            return _jnp.mean(_jnp.where(e < 1.0, 0.5 * e * e, e - 0.5))

        return fn
    raise ValueError(f"unknown loss {name!r}; choices: {LOSSES}")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 3e-4
    optim: str = "adamw"
    lr_func: str = "warmup_cosine"        # linear|cosine|warmup_cosine
    epochs: int = 300
    steps_per_epoch: int = 1
    conditional: bool = True
    cfg_dropout: float = 0.1              # p(drop labels) per batch
    ema_beta: float = 0.995
    ema_start: int = 2000                 # step_start_ema
    timestep_low: int = 1                 # vendored framework draws [1, T)
    loss: str = "mse"                     # mse|l1|huber (loss_initializer)
    compute_dtype: Any = jnp.float32      # jnp.bfloat16 for AMP-equivalent


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    schedule = make_lr_schedule(
        config.lr_func, config.lr, config.epochs, config.steps_per_epoch
    )
    if config.optim == "adam":
        return optax.adam(schedule)
    if config.optim == "adamw":
        return optax.adamw(schedule, weight_decay=0.01)
    if config.optim == "sgd":
        return optax.sgd(schedule, momentum=0.937)
    raise ValueError(f"unknown optimizer {config.optim!r}; choices: {OPTIMIZERS}")


def create_train_state(model, rng, sample_batch, config: TrainConfig,
                       labels=None) -> TrainState:
    if labels is not None:
        params = jax.jit(model.init)(rng, sample_batch,
                                     jnp.zeros((sample_batch.shape[0],),
                                               jnp.int32), labels)
    else:
        params = jax.jit(model.init)(rng, sample_batch,
                                     jnp.zeros((sample_batch.shape[0],),
                                               jnp.int32))
    tx = make_optimizer(config)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def ema_update(ema_params, params, step, beta: float, start: int):
    """Reference EMA: hard copy before ``start`` steps, then decay
    (ref: model/modules/ema.py:46-69)."""
    decay = jnp.where(step < start, 0.0, beta)
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )


def make_train_step(
    coeffs: DiffusionCoefficients,
    config: TrainConfig,
    donate: bool = True,
):
    """Build the jitted diffusion train step.

    Returns ``step_fn(state, images, labels, rng) -> (state, metrics)``.
    ``images`` are [-1, 1] NHWC; ``labels`` int32 [B] (ignored when
    unconditional).  Call with a batch sharded over the mesh 'data' axis.
    """
    T = coeffs.num_timesteps
    loss_metric = make_loss_fn(config.loss)

    def loss_fn(params, apply_fn, images, labels, t, noise, drop):
        x_t = q_sample(coeffs, images, t, noise)
        x_t = x_t.astype(config.compute_dtype)
        if config.conditional:
            # whole-batch CFG dropout (ref: tools/train.py:201-204)
            y = jnp.where(drop, -jnp.ones_like(labels), labels)
            pred = apply_fn(params, x_t, t, y)
        else:
            pred = apply_fn(params, x_t, t)
        return loss_metric(noise, pred)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_fn(state: TrainState, images, labels, rng):
        t_rng, n_rng, d_rng = jax.random.split(rng, 3)
        b = images.shape[0]
        t = jax.random.randint(t_rng, (b,), config.timestep_low, T)
        noise = jax.random.normal(n_rng, images.shape, jnp.float32)
        drop = jax.random.uniform(d_rng) < config.cfg_dropout

        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, state.apply_fn, images, labels, t, noise, drop
        )
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.step,
                                config.ema_beta, config.ema_start)
        new_state = state.replace(
            step=state.step + 1, params=params, ema_params=ema_params,
            opt_state=opt_state,
        )
        return new_state, {"loss": loss}

    return step_fn
