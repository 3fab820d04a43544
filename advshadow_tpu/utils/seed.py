"""Seeding (re-design of ref: utils/initializer.py:66-78).

JAX is deterministic by construction (explicit PRNG keys); this seeds the
host-side RNGs (python/numpy, used by the data pipeline) and returns the
root jax key.  The reference's cudnn-determinism toggles have no TPU
equivalent — XLA:TPU is deterministic for a fixed program + seed.
"""

from __future__ import annotations

import random

import jax
import numpy as np

__all__ = ["seed_initializer"]


def seed_initializer(seed: int = 0) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
