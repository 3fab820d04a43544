"""Process-level runtime initialization.

Enables JAX's persistent compilation cache so repeated CLI invocations /
serving restarts don't re-pay XLA (or remote) compilation of the same
programs — first-invocation latency on this class of hosts is dominated
by compiles (a 500-step sampler scan can take minutes to compile and
milliseconds to run).
"""

from __future__ import annotations

import os

import jax

__all__ = ["runtime_init"]

_DONE = False


def runtime_init(cache_dir: str | None = None) -> None:
    """Idempotent: enable the persistent compilation cache."""
    global _DONE
    if _DONE:
        return
    # escape hatch for hosts that pin JAX_PLATFORMS before interpreter
    # startup (sitecustomize): ADVSHADOW_PLATFORM=cpu forces the backend
    # after import, e.g. to drive CLIs while another process holds the TPU
    platform = os.environ.get("ADVSHADOW_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    cache_dir = cache_dir or os.environ.get(
        "ADVSHADOW_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "advshadow_jax"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — older jax without the flags
        pass
    _DONE = True
