"""FID — Fréchet Inception Distance, computed on-device.

Re-design of ref: fid_fast.py:11-72: activations from a feature extractor
(InceptionV3 pool features in the reference), Gaussian statistics, and
the Fréchet distance with the matrix square root replaced by the
Newton-Schulz iteration (:mod:`advshadow_tpu.ops.sqrtm`) so the whole
metric runs as matmuls on the MXU instead of scipy's host-side sqrtm.

The feature extractor is injected (``feature_fn``), so FID can be
computed against any embedding (a ported InceptionV3, a victim backbone,
...).  The cross term is computed spectrally (exact up to f32 eigh —
no ridge bias; see :func:`advshadow_tpu.ops.sqrtm.trace_sqrtm_product`),
so near-singular covariances are handled; with fewer samples than
feature dims the *statistics* themselves are still noisy — like the
reference's complex-sqrtm noise in that regime, use enough samples
(N >= D) for meaningful values. Weight porting for torchvision InceptionV3 lives in
:mod:`advshadow_tpu.victims.port`-style converters once weights are
available locally; this module is extractor-agnostic by design.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from advshadow_tpu.ops.sqrtm import trace_sqrtm_product

__all__ = ["activation_statistics", "frechet_distance", "fid_from_features",
           "compute_fid"]


def activation_statistics(features: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(mu, sigma) of [N, D] activations; sigma uses the N-1 normalization
    (np.cov rowvar=False parity, ref: fid_fast.py:32-33)."""
    f = features.astype(jnp.float32)
    mu = jnp.mean(f, axis=0)
    centered = f - mu
    sigma = centered.T @ centered / (f.shape[0] - 1)
    return mu, sigma


def frechet_distance(
    mu1: jax.Array, sigma1: jax.Array, mu2: jax.Array, sigma2: jax.Array,
    sqrtm_iters: int = 30,
) -> jax.Array:
    """||mu1-mu2||^2 + tr(s1 + s2 - 2 sqrtm(s1 s2)) (ref: fid_fast.py:30-45)."""
    ssdiff = jnp.sum(jnp.square(mu1 - mu2))
    covmean_tr = trace_sqrtm_product(sigma1, sigma2, num_iters=sqrtm_iters)
    fd = ssdiff + jnp.trace(sigma1) + jnp.trace(sigma2) - 2.0 * covmean_tr
    # clamp: the stabilizing ridge can push near-identical sets slightly
    # negative (true Frechet distance is non-negative)
    return jnp.maximum(fd, 0.0)


@jax.jit
def fid_from_features(feat1: jax.Array, feat2: jax.Array) -> jax.Array:
    mu1, s1 = activation_statistics(feat1)
    mu2, s2 = activation_statistics(feat2)
    return frechet_distance(mu1, s1, mu2, s2)


def compute_fid(
    feature_fn: Callable[[jax.Array], jax.Array],
    images1: jax.Array,
    images2: jax.Array,
    batch_size: int = 64,
) -> float:
    """End-to-end FID over two [N, H, W, C] image sets in [0, 1]."""

    def extract(images):
        feats = []
        for i in range(0, images.shape[0], batch_size):
            feats.append(feature_fn(images[i: i + batch_size]))
        return jnp.concatenate(feats, axis=0)

    return float(fid_from_features(extract(images1), extract(images2)))
