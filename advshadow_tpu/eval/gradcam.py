"""Grad-CAM — class activation maps with exact intermediate gradients.

Re-design of the reference's pytorch-grad-cam usage
(ref: ddim2/grad-cam.py:21-22, ddim2/test.py:502-549): gradient of the
target-class score w.r.t. the final conv feature map, global-average-
pooled into channel weights, weighted feature sum, ReLU, bilinear
upsample, min-max normalize, jet overlay.

Intermediate gradients use the *feature-offset probe*: the model's apply
accepts a ``feature_offset`` added to the target activation
(see :class:`advshadow_tpu.victims.resnet.ResNet`), and Grad-CAM
differentiates the score w.r.t. that offset at zero — exact d(score)/
d(features) for any head, no hooks, fully jittable.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from advshadow_tpu.victims.zoo import safe_argmax

__all__ = ["grad_cam", "make_resnet_cam_fn", "show_cam_on_image"]

# fn(images, feature_offset) -> (logits, features)
CamModelFn = Callable[[jax.Array, Optional[jax.Array]],
                      Tuple[jax.Array, jax.Array]]


def grad_cam(
    cam_model_fn: CamModelFn,
    images: jax.Array,
    targets: Optional[jax.Array] = None,
) -> jax.Array:
    """CAM heatmaps [B, H, W] in [0, 1] at input resolution.

    ``targets`` defaults to the predicted class (pytorch-grad-cam's
    default, which the reference relies on)."""
    logits, features = cam_model_fn(images, None)
    if targets is None:
        targets = safe_argmax(logits)

    def score(offset):
        lg, _ = cam_model_fn(images, offset)
        return jnp.take_along_axis(lg, targets[:, None], axis=-1).sum()

    grads = jax.grad(score)(jnp.zeros_like(features))  # d score / d features
    weights = grads.mean(axis=(1, 2))                  # GAP -> channel weights
    cam = jax.nn.relu(jnp.einsum("bhwc,bc->bhw", features, weights))
    b = images.shape[0]
    cam = jax.image.resize(cam, (b, images.shape[1], images.shape[2]),
                           method="bilinear")
    cmin = cam.min(axis=(1, 2), keepdims=True)
    cmax = cam.max(axis=(1, 2), keepdims=True)
    return (cam - cmin) / (cmax - cmin + 1e-12)


def make_resnet_cam_fn(model, variables) -> CamModelFn:
    """Adapt a zoo ResNet into the Grad-CAM protocol."""

    def fn(x, offset):
        return model.apply(variables, x, return_features=True,
                           feature_offset=offset)

    return fn


def show_cam_on_image(image: jax.Array, cam: jax.Array,
                      alpha: float = 0.5) -> jax.Array:
    """Jet-colormap overlay (pytorch-grad-cam show_cam_on_image parity).
    image [H, W, C] in [0,1], cam [H, W] in [0,1] -> [H, W, 3]."""
    heat = _jet(cam)
    return jnp.clip(alpha * heat + (1 - alpha) * image, 0.0, 1.0)


def shift_and_blend_heatmap(
    image: jax.Array, cam: jax.Array, dx: int = 0, dy: int = 0,
    alpha: float = 0.5,
) -> jax.Array:
    """Shift a heatmap and blend it over the image — the reference's
    visualization toy (ref: ddim2/try.py:5-37). Out-of-frame regions
    roll around, matching np.roll semantics."""
    shifted = jnp.roll(cam, (dy, dx), axis=(0, 1))
    return show_cam_on_image(image, shifted, alpha)


def _jet(x: jax.Array) -> jax.Array:
    r = jnp.clip(1.5 - jnp.abs(4 * x - 3), 0, 1)
    g = jnp.clip(1.5 - jnp.abs(4 * x - 2), 0, 1)
    b = jnp.clip(1.5 - jnp.abs(4 * x - 1), 0, 1)
    return jnp.stack([r, g, b], axis=-1)
