"""PSNR / SSIM — batched, on-device, skimage-parity.

Replaces the reference's per-pair skimage host loop
(ref: PSNR_SSIM_fast.py:21-66) with a jitted, vmapped implementation:

- PSNR: 10 log10(data_range^2 / MSE) (skimage peak_signal_noise_ratio).
- SSIM: skimage ``structural_similarity`` with ``gaussian_weights=True``
  semantics, exactly: the smoothing kernel is the scipy/skimage Gaussian
  with sigma=1.5 truncated at 3.5 sigma (radius int(3.5*1.5+0.5)=5, an
  11-tap window, 'nearest' edge padding) REGARDLESS of ``win_size`` —
  skimage uses ``win_size`` only for the sample-covariance correction
  NP/(NP-1) and the (win_size-1)//2 border crop of the final mean.
  K1=0.01 / K2=0.03, per-channel mean (channel_axis semantics).  Default
  ``win_size=7`` per the reference's ``compare_folders``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["psnr", "ssim", "batch_psnr_ssim"]

#: skimage structural_similarity(gaussian_weights=True) constants
_SIGMA = 1.5
_TRUNCATE = 3.5


def psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_window(sigma: float = _SIGMA,
                     truncate: float = _TRUNCATE) -> np.ndarray:
    """scipy.ndimage gaussian_filter1d kernel: radius int(t*s+0.5)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _filter2d_valid(img: jax.Array, k1d: jax.Array) -> jax.Array:
    """Separable 'valid' correlation over the leading two dims of [H, W]."""
    w = k1d.shape[0]

    def conv_axis(a, axis):
        out = None
        for i in range(w):
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(i, a.shape[axis] - w + 1 + i)
            term = k1d[i] * a[tuple(sl)]
            out = term if out is None else out + term
        return out

    return conv_axis(conv_axis(img, 0), 1)


def _filter2d_nearest(img: jax.Array, k1d: jax.Array) -> jax.Array:
    """Separable same-size correlation with 'nearest' (edge-replicate)
    boundary handling — scipy.ndimage.gaussian_filter's default mode,
    which skimage's gaussian-weighted SSIM path uses."""
    r = (k1d.shape[0] - 1) // 2
    img = jnp.pad(img, ((r, r), (r, r)), mode="edge")
    return _filter2d_valid(img, k1d)


def ssim(
    a: jax.Array,
    b: jax.Array,
    win_size: int = 7,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Gaussian-weighted SSIM on [H, W, C] images, mean over channels
    (skimage ``channel_axis=2`` + ``gaussian_weights=True`` semantics)."""
    kernel = jnp.asarray(_gaussian_window())
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    # skimage: NP = win^2, cov_norm = NP/(NP-1) on (E[xy] - E[x]E[y]);
    # the final mean drops a (win_size-1)//2 border.
    npix = win_size * win_size
    cov_norm = npix / (npix - 1.0)
    pad = (win_size - 1) // 2

    def channel_ssim(x, y):
        ux = _filter2d_nearest(x, kernel)
        uy = _filter2d_nearest(y, kernel)
        uxx = _filter2d_nearest(x * x, kernel)
        uyy = _filter2d_nearest(y * y, kernel)
        uxy = _filter2d_nearest(x * y, kernel)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux**2 + uy**2 + c1) * (vx + vy + c2)
        )
        return jnp.mean(s[pad:s.shape[0] - pad, pad:s.shape[1] - pad])

    per_channel = jax.vmap(channel_ssim, in_axes=(2, 2))(a, b)
    return jnp.mean(per_channel)


@partial(jax.jit, static_argnums=(2,))
def batch_psnr_ssim(a: jax.Array, b: jax.Array, win_size: int = 7):
    """Mean (ssim, psnr) over paired [N, H, W, C] batches — the whole
    folder comparison as one device program.  data_range follows the
    reference's per-image ``image1.max() - image1.min()``
    (ref: PSNR_SSIM_fast.py:24-26)."""

    def one(x, y):
        dr = jnp.maximum(x.max() - x.min(), 1e-8)
        return ssim(x, y, win_size, dr), psnr(x, y, dr)

    s, p = jax.vmap(one)(a, b)
    return jnp.mean(s), jnp.mean(p)
