"""Masked adversarial pixel perturbations.

The reference's main inner attack is an iterative integrated-gradients
sign attack (ref: ddim2/test.py:647-681): per outer iteration, a 21-point
path integral of dCE/dx from a random baseline to the image, L1-normalized,
masked to the shadow region, and applied as a decaying sign step.

TPU re-design: the reference evaluates the 21 path points *sequentially*
(21 victim forward+backwards per iteration per image).  Here the whole
path is one batched forward/backward — grad of the *sum* of CE over the
stacked path batch equals the per-point gradients because rows are
independent — so a 10-iteration IG attack is 10 batched victim calls, and
``vmap`` over the image batch turns that into 10 calls total for the whole
batch.  This is the headline perf win called out in SURVEY.md §2.8.

``victim_fn(images) -> logits`` takes a [B, H, W, C] float [0,1] batch.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from advshadow_tpu.victims.zoo import safe_argmax

__all__ = [
    "cross_entropy",
    "integrated_gradients_attack",
    "fgsm_perturbation",
    "bim_attack",
    "pgd_attack",
]

VictimFn = Callable[[jax.Array], jax.Array]


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over the batch (torch F.cross_entropy parity)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def integrated_gradients_attack(
    victim_fn: VictimFn,
    image: jax.Array,
    label: jax.Array,
    feature_mask: jax.Array,
    rng: jax.Array,
    epsilon: float = 0.5,
    alpha: float = 0.005,
    iterations: int = 10,
    steps: int = 20,
    baseline: jax.Array | None = None,
    ascent: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Iterative IG sign attack on a single [H, W, C] image.

    Matches ref: ddim2/test.py:647-681: random-normal baseline, path sum
    of grads / steps (over steps+1 points), g / (||g||_1 + 1e-8), masked,
    perturbation -= alpha/sqrt(i+1) * sign(g), clamp to ±epsilon; returns
    (clip(image + perturbation, 0, 1), perturbation).  ``baseline``
    overrides the PRNG draw (cross-pipeline parity hook).

    ``ascent=True`` is the corrected UNTARGETED direction: ``label`` is
    ignored in favor of the victim's own prediction on ``image`` (the
    self-label untargeted loss the reference itself uses in its
    FGSM/BIM/PGD baselines, ref: ddim2/adv_test.py:29-30) and the step
    sign flips so CE is maximized.  The reference's untargeted shadow
    path instead passes the TRUE label to this CE-*descending* attack
    (ref: ddim2/test_main.py:160-168), which actively repairs the
    classification — a measured no-op at 128 px.
    """
    if baseline is None:
        baseline = jax.random.normal(rng, image.shape, image.dtype)
    if ascent:
        label = jax.lax.stop_gradient(
            safe_argmax(victim_fn(image[None]))[0])
    ks = jnp.arange(steps + 1, dtype=jnp.float32) / steps  # [S+1]
    # the whole path as one batch: [S+1, H, W, C].  The reference takes
    # gradients w.r.t. EACH PATH POINT (interp_img.grad,
    # ddim2/test.py:661-666), NOT w.r.t. the endpoint image —
    # differentiating through the path construction would scale point k's
    # gradient by k/steps.  So: build the path, then grad w.r.t. it.
    path = baseline[None] + ks[:, None, None, None] * (image[None] - baseline[None])

    def path_ce(p):
        logits = victim_fn(p)
        labels = jnp.full((steps + 1,), label, dtype=jnp.int32)
        # sum (not mean) so d/dpath decouples into per-point grads
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.sum(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    # The reference recomputes the path integral every iteration
    # (ref: ddim2/test.py:655-666), but it is CONSTANT within one attack
    # call: same baseline, same image, frozen victim. Every iteration
    # steps by -alpha/sqrt(i+1) along the SAME fixed sign direction and
    # clips to ±epsilon; monotone same-direction steps make the stepwise
    # clip equal to one final clip. The closed form below is bit-exact
    # with the reference loop (see test_ig_closed_form_equals_loop) at
    # 1/iterations the victim cost.
    per_point = jax.grad(path_ce)(path)          # [S+1, H, W, C]
    # accumulate SEQUENTIALLY in f32 (integrated_grads += grad/steps,
    # ddim2/test.py:666): the path grads nearly cancel, so the f32
    # reduction ORDER is visible in the sign pattern — a tree-reduce
    # jnp.sum costs ~2 bits of agreement with the reference here.
    ig, _ = jax.lax.scan(lambda acc, g: (acc + g / steps, None),
                         jnp.zeros_like(image), per_point)
    norm_g = ig / (jnp.sum(jnp.abs(ig)) + 1e-8)
    sign = jnp.sign(norm_g * feature_mask[..., None])
    total_step = alpha * jnp.sum(
        1.0 / jnp.sqrt(jnp.arange(iterations, dtype=jnp.float32) + 1.0))
    direction = total_step if ascent else -total_step
    perturbation = jnp.clip(direction * sign, -epsilon, epsilon)
    perturbed = jnp.clip(image + perturbation, 0.0, 1.0)
    return perturbed, perturbation


def iterative_gradient_attack(
    victim_fn: VictimFn,
    image: jax.Array,
    label: jax.Array,
    feature_mask: jax.Array,
    epsilon: float = 0.05,
    alpha: float = 0.005,
    iterations: int = 20,
    ascent: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Plain masked iterative sign attack (IGA) on a single [H, W, C]
    image — the train-time inner attack
    (ref: tools/train_shadow.py:177-221, ddim2/diff_model2.py:572-613):
    grad of CE at (image + perturbation), masked, fixed step alpha,
    clamp to ±epsilon.

    ``ascent=True`` is the corrected UNTARGETED direction: ``label`` is
    ignored; each step maximizes CE against the victim's own argmax,
    recomputed every step (the reference's self-label untargeted loss,
    ref: ddim2/adv_test.py:29-30 — exactly BIM restricted to the mask).
    """
    if ascent:
        ce_batch = _self_label_ce(victim_fn)

        def ce_at(img):
            return ce_batch(img[None])

    else:

        def ce_at(img):
            logits = victim_fn(img[None])
            return cross_entropy(logits, jnp.asarray(label, jnp.int32)[None])

    grad_fn = jax.grad(ce_at)
    step = alpha if ascent else -alpha

    def body(_, perturbation):
        g = grad_fn(image + perturbation)
        masked = g * feature_mask[..., None]
        p = perturbation + step * jnp.sign(masked)
        return jnp.clip(p, -epsilon, epsilon)

    perturbation = jax.lax.fori_loop(0, iterations, body, jnp.zeros_like(image))
    return jnp.clip(image + perturbation, 0.0, 1.0), perturbation


def fgsm_perturbation(
    image: jax.Array, epsilon: float, grad: jax.Array
) -> jax.Array:
    """Single-step FGSM given a precomputed input gradient
    (ref: ddim2/adv_test.py:18-22)."""
    return jnp.clip(image + epsilon * jnp.sign(grad), 0.0, 1.0)


def _self_label_ce(victim_fn: VictimFn):
    """CE against the model's own argmax — the reference's untargeted loss
    (ref: ddim2/adv_test.py:29-30). argmax is recomputed every step."""

    def loss(x):
        logits = victim_fn(x)
        labels = jax.lax.stop_gradient(safe_argmax(logits))
        return cross_entropy(logits, labels)

    return loss


def bim_attack(
    victim_fn: VictimFn,
    image: jax.Array,
    epsilon: float,
    alpha: float,
    num_iterations: int,
) -> jax.Array:
    """Basic Iterative Method on a [B, H, W, C] batch
    (ref: ddim2/adv_test.py:26-38)."""
    loss_grad = jax.grad(_self_label_ce(victim_fn))

    def body(_, x):
        g = loss_grad(x)
        x = x + alpha * jnp.sign(g)
        x = jnp.clip(x, image - epsilon, image + epsilon)
        return jnp.clip(x, 0.0, 1.0)

    return jax.lax.fori_loop(0, num_iterations, body, image)


def pgd_attack(
    victim_fn: VictimFn,
    image: jax.Array,
    epsilon: float,
    alpha: float,
    num_iterations: int,
    rng: jax.Array,
) -> jax.Array:
    """PGD with uniform random start (ref: ddim2/adv_test.py:42-55)."""
    start = image + jax.random.uniform(
        rng, image.shape, image.dtype, -epsilon, epsilon
    )
    x0 = jnp.clip(start, 0.0, 1.0)
    loss_grad = jax.grad(_self_label_ce(victim_fn))

    def body(_, x):
        g = loss_grad(x)
        x = x + alpha * jnp.sign(g)
        x = jnp.minimum(jnp.maximum(x, image - epsilon), image + epsilon)
        return jnp.clip(x, 0.0, 1.0)

    return jax.lax.fori_loop(0, num_iterations, body, x0)
