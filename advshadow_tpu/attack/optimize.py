"""Shadow-parameter optimization — the paper's outer attack loop.

Re-design of the reference's three ``optimize_shadow_position`` variants
(ref: ddim2/test.py:479-617, ddim2/diff_model2.py:457-550,
tools/train_shadow.py:76-144) as one config-driven, fully jitted
``lax.scan``, batched over images with ``vmap``.

The reference runs this per-image in Python with the inner attack doing
~10x21 sequential victim calls — its biggest performance flaw (SURVEY.md
§2.8).  Here one jit region covers: soft/hard circular mask -> in-graph
Gaussian blur -> composite -> batched-path IG (or IGA) inner attack ->
victim forward -> shadow-parameter optax step.  In ``hard`` compat mode
the mask has zero gradient w.r.t. (center, radius), so — exactly like the
reference, whose blur breaks the graph and whose optimizer therefore never
steps — the shadow geometry stays fixed while the pixel attack does the
work.  In soft mode (the default) the geometry genuinely optimizes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from advshadow_tpu.attack.perturb import (
    VictimFn,
    cross_entropy,
    integrated_gradients_attack,
    iterative_gradient_attack,
)
from advshadow_tpu.attack.shadow import apply_shadow, mask_centroid

__all__ = [
    "ShadowOptConfig",
    "ShadowOptResult",
    "EVAL_CONFIG",
    "DIFF2_CONFIG",
    "TRAIN_CONFIG",
    "clamp_shadow_params",
    "optimize_shadow_position",
    "batched_optimize_shadow",
]


@dataclasses.dataclass(frozen=True)
class ShadowOptConfig:
    """Knobs covering all three reference variants."""

    iterations: int = 11
    lr: float = 0.1
    optimizer: str = "adamw"          # "adamw" (test.py) | "adam" (others)
    optimize_center: bool = False     # diff_model2 optimizes center too
    radius_init: float = 15.0
    # loss = adv_w * CE + nat_w * MSE + reg_w * reg
    adv_weight: float = -100.0
    nat_weight: float = 0.0
    reg_weight: float = -0.01
    compound: bool = True             # iterate on the running shadowed image
    shadow_intensity: float = 0.051
    blur_kernel_size: int = 5
    # inner pixel attack
    inner: str = "ig"                 # "ig" (path integral) | "iga" (plain)
    inner_epsilon: float = 0.01       # apply_shadow's epsilon default
    inner_alpha: float = 0.005
    inner_iterations: int = 10
    inner_steps: int = 20             # IG path points (ig only)
    # differentiability mode
    hard: bool = False                # True = exact reference mask semantics
    sharpness: float = 1.0
    # Corrected untargeted mode.  The reference's untargeted path passes
    # the TRUE label to the CE-*descending* inner attack
    # (ref: ddim2/test_main.py:160-168) — the pixel attack actively
    # repairs the classification, a measured no-op at size.  With
    # ``untargeted_ascent=True`` the inner attack instead maximizes CE
    # against the victim's own argmax (the self-label loss the reference
    # uses in its FGSM/BIM/PGD baselines, ref: ddim2/adv_test.py:29-30).
    # The OUTER loss needs no sign change: with ``target_label`` = true
    # label, minimizing ``adv_weight * CE`` (adv_weight < 0) already
    # ASCENDS CE of the true label (ref: ddim2/test.py:560) — only the
    # inner direction was broken.  False keeps exact reference compat.
    untargeted_ascent: bool = False
    # The reference initializes the center from
    # torch.nonzero(mask).float().mean(0)[1:] on a [1, H, W] mask — that
    # is (y_bar, x_bar) — and then reads element 0 as the X offset
    # (ref: ddim2/test.py:499-501 vs :641-644), i.e. the shadow starts at
    # the TRANSPOSED centroid.  Default False starts at the true (x, y)
    # centroid (a deliberate fix — the transposed start can land off the
    # object); True replicates the reference bit-for-bit for output
    # parity on asymmetric masks (benchmarks/quality_parity.py).
    center_transpose_compat: bool = False


#: ref: ddim2/test.py:479-617 + :647-681 + :830-871
EVAL_CONFIG = ShadowOptConfig()

#: ref: ddim2/diff_model2.py:457-550 (+ :572-654)
DIFF2_CONFIG = ShadowOptConfig(
    iterations=10, optimizer="adam", optimize_center=True, radius_init=20.0,
    adv_weight=-1.0, nat_weight=1.0, reg_weight=0.1, compound=False,
    shadow_intensity=0.33, inner="iga", inner_iterations=20,
)

#: ref: tools/train_shadow.py:76-266
TRAIN_CONFIG = ShadowOptConfig(
    iterations=1, optimizer="adam", radius_init=20.0,
    adv_weight=-1.0, nat_weight=0.0, reg_weight=0.01,
    shadow_intensity=0.43, inner="iga", inner_iterations=20,
    inner_epsilon=0.05,
)


class ShadowOptResult(NamedTuple):
    center: jax.Array          # (x, y)
    radius: jax.Array          # scalar
    image: jax.Array           # final shadowed+perturbed image, [0,1] HWC
    perturbation: jax.Array    # cumulative perturbation (visualization)


def clamp_shadow_params(params: dict, H: int, W: int) -> dict:
    """Clamp shadow geometry to image bounds (ref: ddim2/test.py:612-615).

    The reference clamps BOTH center coords to ``size(2)`` (=W) — fine on
    its square images, wrong on non-square ones; here the clamp is
    per-dimension, x∈[0,W] × y∈[0,H] (identical for square inputs).
    Radius clamps to min(H, W)/2 exactly like the reference.
    """
    params = dict(params)
    params["radius"] = jnp.clip(params["radius"], 0.0, min(H, W) / 2.0)
    if "center" in params:
        params["center"] = jnp.clip(
            params["center"],
            jnp.zeros((2,), jnp.float32),
            jnp.asarray([float(W), float(H)], jnp.float32),
        )
    return params


def _make_optimizer(config: ShadowOptConfig) -> optax.GradientTransformation:
    if config.optimizer == "adamw":
        # torch AdamW default weight_decay=0.01
        return optax.adamw(config.lr, weight_decay=0.01)
    return optax.adam(config.lr)


def optimize_shadow_position(
    victim_fn: VictimFn,
    image: jax.Array,
    mask: jax.Array,
    target_label: jax.Array,
    rng: jax.Array,
    config: ShadowOptConfig = EVAL_CONFIG,
    ig_baselines: jax.Array | None = None,
) -> ShadowOptResult:
    """Optimize shadow (center, radius) against a frozen victim.

    Args:
      victim_fn: ``fn(images[B,H,W,C] in [0,1]) -> logits``.
      image: [H, W, C] float in [0, 1].
      mask: [H, W] object feature mask.
      target_label: scalar int label for the inner (targeted) attack.
      rng: PRNG key (drives the IG baselines).
      ig_baselines: optional [iterations, H, W, C] IG baselines overriding
        the PRNG draws (cross-pipeline parity hook).
    """
    H, W = image.shape[0], image.shape[1]
    mask_center = mask_centroid(mask)
    center0 = (mask_center[::-1] if config.center_transpose_compat
               else mask_center)
    radius0 = jnp.asarray(config.radius_init, jnp.float32)
    tx = _make_optimizer(config)

    def make_perturb_fn(key, baseline=None):
        def perturb_fn(shadowed, combined_mask):
            if config.inner == "ig":
                adv, pert = integrated_gradients_attack(
                    victim_fn, shadowed, target_label, combined_mask, key,
                    epsilon=config.inner_epsilon, alpha=config.inner_alpha,
                    iterations=config.inner_iterations, steps=config.inner_steps,
                    baseline=baseline, ascent=config.untargeted_ascent,
                )
            else:
                adv, pert = iterative_gradient_attack(
                    victim_fn, shadowed, target_label, combined_mask,
                    epsilon=config.inner_epsilon, alpha=config.inner_alpha,
                    iterations=config.inner_iterations,
                    ascent=config.untargeted_ascent,
                )
            # the reference detaches the attacked image
            # (ref: ddim2/test.py:681); shadow-parameter gradients flow
            # through the compositing mask only.
            return jax.lax.stop_gradient(adv), jax.lax.stop_gradient(pert)

        return perturb_fn

    params0 = {"radius": radius0}
    if config.optimize_center:
        params0["center"] = center0
    opt_state0 = tx.init(params0)

    def loss_fn(params, base_image, key, baseline=None):
        center = params.get("center", center0)
        radius = params["radius"]
        result = apply_shadow(
            base_image, center, radius, mask,
            perturb_fn=make_perturb_fn(key, baseline),
            shadow_intensity=config.shadow_intensity,
            blur_kernel_size=config.blur_kernel_size,
            hard=config.hard, sharpness=config.sharpness,
        )
        logits = victim_fn(result.image[None])
        ce = cross_entropy(logits, jnp.asarray(target_label, jnp.int32)[None])
        mse = jnp.mean(jnp.square(result.image - image))
        reg = jnp.sum(jnp.square(center - mask_center)) + radius**2
        loss = (config.adv_weight * ce + config.nat_weight * mse
                + config.reg_weight * reg)
        return loss, result

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def step(carry, inp):
        key, baseline = inp if ig_baselines is not None else (inp, None)
        params, opt_state, base_image, _ = carry
        grads, result = grad_fn(params, base_image, key, baseline)
        # The reference only steps when the shadow params received gradient
        # (ref: ddim2/test.py:606-609) — in hard-mask mode they never do, so
        # skip the update on all-zero grads for exact compat.
        has_grad = sum(
            jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads)
        ) > 0
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(has_grad, new, old), new_params, params
        )
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(has_grad, new, old), new_opt_state,
            opt_state,
        )
        params = clamp_shadow_params(params, H, W)
        next_base = result.image if config.compound else image
        return (params, opt_state, next_base, result), result.perturbation

    keys = jax.random.split(rng, config.iterations)
    inputs = (keys, ig_baselines) if ig_baselines is not None else keys
    (params, _, _, final), perts = jax.lax.scan(
        step, (params0, opt_state0, image, _empty_result(image, mask)), inputs
    )
    center = params.get("center", center0)
    return ShadowOptResult(
        center=center,
        radius=params["radius"],
        image=final.image,
        perturbation=jnp.sum(perts, axis=0),
    )


def _empty_result(image, mask):
    from advshadow_tpu.attack.shadow import ShadowResult

    return ShadowResult(image, jnp.zeros_like(image), jnp.zeros_like(mask))


@partial(jax.jit, static_argnums=(0, 5))
def batched_optimize_shadow(
    victim_fn: VictimFn,
    images: jax.Array,
    masks: jax.Array,
    target_labels: jax.Array,
    rng: jax.Array,
    config: ShadowOptConfig = EVAL_CONFIG,
) -> ShadowOptResult:
    """The whole attack vmapped over the batch and jitted as one region —
    replaces the reference's per-image Python loop
    (ref: ddim2/main2.py:158-168)."""
    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(
        lambda im, m, y, k: optimize_shadow_position(
            victim_fn, im, m, y, k, config
        )
    )(images, masks, target_labels, rngs)
