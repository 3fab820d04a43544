"""On-device matrix square root via Newton-Schulz iteration.

Replaces the reference's host-side ``scipy.linalg.sqrtm`` in the FID
computation (ref: fid_fast.py:39) with an iteration built entirely from
matmuls — exactly what the MXU is for.  Operates in float64-free,
f32-accumulated arithmetic; for covariance products in FID the iteration
converges in ~30 steps to well below metric noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sqrtm_newton_schulz", "trace_sqrtm_product"]


def sqrtm_newton_schulz(a: jax.Array, num_iters: int = 30) -> jax.Array:
    """Principal square root of a PSD matrix by Newton-Schulz.

    Y_{k+1} = 0.5 Y_k (3I - Z_k Y_k);  Z_{k+1} = 0.5 (3I - Z_k Y_k) Z_k
    with A normalized by its Frobenius norm for convergence.
    """
    n = a.shape[-1]
    norm = jnp.sqrt(jnp.sum(a * a)) + 1e-12
    y0 = a / norm
    eye = jnp.eye(n, dtype=a.dtype)

    def body(carry, _):
        y, z = carry
        t = 0.5 * (3.0 * eye - z @ y)
        return (y @ t, t @ z), None

    (y, _), _ = jax.lax.scan(body, (y0, eye), None, length=num_iters)
    return y * jnp.sqrt(norm)


def trace_sqrtm_product(sigma1: jax.Array, sigma2: jax.Array,
                        num_iters: int = 30, eps: float = 1e-6) -> jax.Array:
    """tr(sqrtm(sigma1 @ sigma2)), the cross term of the Frechet distance.

    A small ridge keeps the product away from singularity, mirroring the
    reference's complex-part discard (ref: fid_fast.py:39-41).
    """
    n = sigma1.shape[-1]
    ridge = eps * jnp.eye(n, dtype=sigma1.dtype)
    prod = (sigma1 + ridge) @ (sigma2 + ridge)
    return jnp.trace(sqrtm_newton_schulz(prod, num_iters))
