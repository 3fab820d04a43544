"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI, so sharding tests use
XLA's forced host-platform device count — the TPU-world equivalent of a
fake backend for multi-device tests (see SURVEY.md §4).
"""

import os
import sys

# Force CPU: the host env pins JAX_PLATFORMS to the (single, contended)
# TPU tunnel and a sitecustomize imports jax at interpreter startup, so the
# env var alone is too late — update the live jax config instead (works
# because backends initialize lazily).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Per-op eager compiles are ~1s each on this CPU; cache compilations across
# test runs so the suite stays fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/advshadow_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

