"""Progressive guided distillation — few-step students (4-16 plain
conditional forwards, no CFG double-batch).

Beyond-reference capability (the reference's fastest committed protocol
is DDIM-50 with a fused-2N CFG forward per step, ref:
diff_model.py:416-474 + model/samples/ddpm.py:62-74).  Measured status
(artifacts/at_size_128/distill_metrics.json ``budget_trend``): the
committed 128 px students reach/beat the teacher's marginal FID at
2-3x the e2e throughput, but guidance baking is NOT yet achieved — a
7x stage-1 budget extension (700 -> 5000 updates) left victim-
conditioning at the *unguided* teacher's level (0.141 vs the CFG-3
teacher's 0.231 on the same grid).  The conditioning path itself is
proven correct (tests/test_distill.py: the stage-1 target contains the
label-dependent CFG lift; student outputs depend on y), so this is an
optimization-budget plateau — the source papers spend 10-50k
updates/stage.  Mechanism follows

- Salimans & Ho 2022 (2202.00512), progressive distillation: the
  student's one DDIM step from boundary t_i to t_{i+1} is regressed onto
  the teacher's TWO DDIM steps through the midpoint, halving the step
  count per stage; loss is the truncated-SNR-weighted x0 MSE (their
  eq. 9 / App. E).
- Meng et al. 2023 (2210.03142), guidance distillation at fixed w: the
  stage-1 teacher is the CFG-guided prediction (one fused 2N forward, as
  everywhere in this codebase), so guidance is baked into the student
  and every later stage is CFG-free.

TPU-native shape: ONE jitted step — per-sample boundary indices are
drawn inside the step, both teacher DDIM sub-steps and the student
forward/backward run on batched per-sample (t, t_mid, t_next) gathers
(no Python control flow, no host syncs); teacher params ride as a jit
argument so stages can swap teachers without recompiling the student
update logic.

The distillation grid is the ``logsnr`` boundary grid
(samplers/ddim.py:boundary_times): uniform in lambda = log(alpha/sigma),
the only grid here whose N-step boundaries are exactly every second
boundary of its 2N-step grid — the nesting progressive distillation
requires.  A distilled student is sampled with the stock
``ddim_sample(..., method="logsnr", sample_steps=N)`` at cfg_scale 0;
no special sampler is needed.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from advshadow_tpu.core import DiffusionCoefficients, q_sample
from advshadow_tpu.samplers.ddim import boundary_times
from advshadow_tpu.train.lr import make_lr_schedule
from advshadow_tpu.train.trainer import TrainState, ema_update

__all__ = ["DistillConfig", "distill_grid", "create_distill_state",
           "make_distill_step", "implied_x0_target",
           "make_teacher_targets"]


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """One distillation stage's knobs (Salimans & Ho App. E defaults,
    scaled to this repo's small-data regime)."""

    n_student: int = 8                    # student sampler steps this stage
    cfg_w: float = 0.0                    # stage-1 teacher guidance scale;
    #                                       0 = plain conditional teacher
    lr: float = 1e-4
    optim: str = "adamw"
    lr_func: str = "warmup_cosine"
    steps: int = 1000                     # optimizer updates this stage
    ema_beta: float = 0.995
    ema_start: int = 100                  # short warmup: student starts AT
    #                                       the teacher, not from scratch
    clip_denoised: bool = True            # teacher sub-steps clip x0 like
    #                                       the reference DDIM (diff_model.py:379)
    compute_dtype: Any = jnp.float32      # jnp.bfloat16 = TPU fast path
    loss_weight: str = "trunc_snr"        # "trunc_snr" = max(1, SNR) (S&H
    #   eq. 9) spans 1..1e4 over the chain, so low-t reconstruction
    #   dominates the gradient; "x0" = uniform x0-space MSE, which keeps
    #   the high-t segments (where CFG's class lift is expressed) on an
    #   equal footing — the guidance-baking ablation knob


def distill_grid(coeffs: DiffusionCoefficients, n_student: int) -> np.ndarray:
    """The 2N+1 strictly-descending logsnr boundaries (ending at 0).

    Even entries (``grid[::2]``) are exactly the N-step boundaries the
    student samples with (``ddim_sample(..., sample_steps=n_student,
    method="logsnr")``); odd entries are the teacher midpoints.  Raises
    if the discrete grid degenerates (repeated timesteps) or loses the
    nesting — both only happen when 2N approaches the chain length.
    """
    abar = np.asarray(coeffs.alphas_cumprod)
    T = coeffs.num_timesteps
    fine = boundary_times(abar, T, 2 * n_student, "logsnr")
    if not np.all(np.diff(fine) < 0):
        raise ValueError(
            f"degenerate distillation grid: 2x{n_student} logsnr boundaries "
            f"repeat timesteps on a {T}-step chain")
    coarse = boundary_times(abar, T, n_student, "logsnr")
    if not np.array_equal(fine[::2], coarse):
        raise ValueError(
            "logsnr grid lost N-in-2N nesting (student boundaries are not "
            "a subset of the teacher grid)")
    return fine.astype(np.int64)


def _gather_as(coeffs: DiffusionCoefficients, t: jax.Array, like: jax.Array):
    """(alpha, sigma) = (sqrt(abar_t), sqrt(1-abar_t)) broadcast to NHWC."""
    shape = (-1,) + (1,) * (like.ndim - 1)
    a = coeffs.sqrt_alphas_cumprod[t].reshape(shape)
    s = coeffs.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
    return a, s


def _ddim_substep(coeffs, eps_fn, x, t, t_prev, clip_denoised):
    """One deterministic DDIM step with PER-SAMPLE (t, t_prev) — the
    batched form of samplers.ddim._ddim_step at eta=0."""
    eps = eps_fn(x, t)
    a_t, s_t = _gather_as(coeffs, t, x)
    a_p, s_p = _gather_as(coeffs, t_prev, x)
    x0 = (x - s_t * eps) / a_t
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
    return a_p * x0 + s_p * eps


def implied_x0_target(coeffs, x_t, t, t_next, x_target):
    """Invert the one-step DDIM map in x0 space (Salimans & Ho App. G):
    the x0 a student must predict at ``(x_t, t)`` so its single step to
    ``t_next`` lands on ``x_target``.

    From x' = a' x0 + s' eps with eps = (x_t - a_t x0)/s_t:
      x0* = (x' - (s'/s_t) x_t) / (a' - (s'/s_t) a_t).
    The denominator is a'(1 - e^{-(lambda' - lambda_t)}) — Theta(1) on a
    uniform-lambda (logsnr) grid — so target errors are never amplified.
    The equivalent eps-space inversion divides by ~sigma' instead, which
    blows up ~100x near the clean end of the chain; that conditioning
    difference is exactly why S&H regress x0, not eps (their Sec. 4).
    """
    a_t, s_t = _gather_as(coeffs, t, x_t)
    a_n, s_n = _gather_as(coeffs, t_next, x_t)
    denom = a_n - (s_n / s_t) * a_t
    return (x_target - (s_n / s_t) * x_t) / denom


def create_distill_state(model, config: DistillConfig,
                         teacher_params) -> TrainState:
    """Student state initialized AT the teacher's weights (same arch)."""
    if config.lr_func == "warmup_cosine":
        # step-granular (train.lr's schedules move at EPOCH granularity —
        # a distillation stage is one short run of `steps` updates)
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, config.lr, warmup_steps=max(1, min(100, config.steps // 10)),
            decay_steps=config.steps, end_value=config.lr * 0.01)
    else:
        schedule = make_lr_schedule(config.lr_func, config.lr,
                                    epochs=1, steps_per_epoch=1)
    if config.optim == "adamw":
        tx = optax.adamw(schedule, weight_decay=0.01)
    elif config.optim == "adam":
        tx = optax.adam(schedule)
    elif config.optim == "sgd":
        tx = optax.sgd(schedule, momentum=0.937)
    else:
        raise ValueError(f"unknown optimizer {config.optim!r}")
    # real copies, not views: the step donates state while the teacher
    # params ride as a separate argument — aliased buffers would trip
    # XLA's donation check when the student IS the stage-1 teacher
    params = jax.tree_util.tree_map(
        lambda p: jnp.array(p, jnp.float32, copy=True), teacher_params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def make_teacher_targets(
    coeffs: DiffusionCoefficients,
    config: DistillConfig,
    teacher_apply: Callable,
):
    """The stage's regression-target map, exposed for direct testing
    (round-4 verdict: prove the stage-1 target *contains* the CFG lift).

    Returns ``targets(teacher_params, x_t, labels, t, t_mid, t_next) ->
    x0_tgt``: two teacher DDIM sub-steps through the midpoint (CFG-
    guided fused 2N forward when ``config.cfg_w > 0``, exactly
    samplers.base.make_denoise_fn's null-row convention), inverted to
    the x0 the student must predict.
    """
    cdt = config.compute_dtype

    def teacher_eps(tp, x, t, y):
        xc = x.astype(cdt)
        if config.cfg_w:
            n = x.shape[0]
            null = jnp.full((n,), -1, jnp.int32)
            eps2 = teacher_apply(tp, jnp.concatenate([xc, xc]),
                                 jnp.concatenate([t, t]),
                                 jnp.concatenate([y, null]))
            cond, uncond = eps2[:n], eps2[n:]
            return (uncond + config.cfg_w * (cond - uncond)).astype(
                jnp.float32)
        return teacher_apply(tp, xc, t, y).astype(jnp.float32)

    def targets(tp, x_t, labels, t, t_mid, t_next):
        eps_fn = lambda x, tt: teacher_eps(tp, x, tt, labels)
        x_mid = _ddim_substep(coeffs, eps_fn, x_t, t, t_mid,
                              config.clip_denoised)
        x_tgt = _ddim_substep(coeffs, eps_fn, x_mid, t_mid, t_next,
                              config.clip_denoised)
        x_tgt = jax.lax.stop_gradient(x_tgt)
        return implied_x0_target(coeffs, x_t, t, t_next, x_tgt)

    return targets


def make_distill_step(
    coeffs: DiffusionCoefficients,
    config: DistillConfig,
    student_apply: Callable,
    teacher_apply: Optional[Callable] = None,
):
    """Build the jitted distillation step.

    Returns ``step_fn(state, teacher_params, images, labels, rng) ->
    (state, metrics)``.  ``images`` are [-1, 1] NHWC data samples (they
    provide x_t coverage; targets come from the teacher), ``labels``
    int32 [B].  ``teacher_apply`` defaults to ``student_apply`` (stage 1
    distills the model into itself at fewer steps).

    With ``config.cfg_w > 0`` the teacher prediction is the CFG-guided
    fused 2N forward (null label = -1 row, exactly
    samplers.base.make_denoise_fn); stages after guidance is baked in
    run the teacher as a plain conditional forward.
    """
    teacher_apply = teacher_apply or student_apply
    grid_table = jnp.asarray(distill_grid(coeffs, config.n_student),
                             jnp.int32)
    n_seg = config.n_student
    cdt = config.compute_dtype
    teacher_targets = make_teacher_targets(coeffs, config, teacher_apply)

    def loss_fn(params, tp, images, labels, t, t_mid, t_next, noise):
        x_t = q_sample(coeffs, images, t, noise)
        x0_tgt = teacher_targets(tp, x_t, labels, t, t_mid, t_next)

        eps_s = student_apply(params, x_t.astype(cdt), t,
                              labels).astype(jnp.float32)
        a_t, s_t = _gather_as(coeffs, t, x_t)
        x0_s = (x_t - s_t * eps_s) / a_t
        per = jnp.mean(jnp.square(x0_tgt - x0_s),
                       axis=tuple(range(1, x_t.ndim)), keepdims=True)
        if config.loss_weight == "trunc_snr":
            # truncated-SNR weighting: max(1, alpha^2/sigma^2) (S&H eq. 9)
            w = jnp.maximum(1.0, (a_t / s_t) ** 2)
        elif config.loss_weight == "x0":
            w = jnp.ones_like(a_t)
        else:
            raise ValueError(
                f"unknown loss_weight {config.loss_weight!r}")
        return jnp.mean(w * per)

    @partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, teacher_params, images, labels, rng):
        i_rng, n_rng = jax.random.split(rng)
        b = images.shape[0]
        i = jax.random.randint(i_rng, (b,), 0, n_seg)
        t, t_mid, t_next = (grid_table[2 * i], grid_table[2 * i + 1],
                            grid_table[2 * i + 2])
        noise = jax.random.normal(n_rng, images.shape, jnp.float32)

        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, teacher_params, images, labels, t, t_mid, t_next,
            noise)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.step,
                                config.ema_beta, config.ema_start)
        return state.replace(step=state.step + 1, params=params,
                             ema_params=ema_params, opt_state=opt_state), \
            {"loss": loss}

    return step_fn
