"""Tracing / profiling / numerical-debug hooks.

The reference has no profiling at all (SURVEY.md §5.1 — tqdm bars only);
this module provides the TPU-native observability surface:

- :func:`trace` — a ``jax.profiler`` trace context writing TensorBoard-
  viewable profiles (per-op timing, HBM usage, MXU utilization);
- :class:`StepTimer` — cheap wall-clock per-step timing with
  steps/sec + images/sec summaries;
- :func:`enable_nan_debugging` — ``jax.debug_nans`` so the first NaN
  raises at the producing op instead of corrupting training silently
  (the SURVEY §5.2 equivalent of the reference's determinism toggles);
- :func:`log_compile_time` — wrap a function to report compile vs run
  wall time, the dominant first-invocation cost on remote-compiled hosts.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax

__all__ = ["trace", "StepTimer", "enable_nan_debugging", "log_compile_time"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Profile everything inside the context into ``log_dir``
    (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Per-step timing with rolling throughput."""

    def __init__(self, items_per_step: int = 1):
        self.items_per_step = items_per_step
        self.reset()

    def reset(self):
        self._t0: Optional[float] = None
        self.steps = 0
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self._t0
        self.steps += 1
        return False

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.elapsed if self.elapsed else 0.0

    @property
    def items_per_sec(self) -> float:
        return self.steps_per_sec * self.items_per_step

    def summary(self) -> dict:
        return {"steps": self.steps, "seconds": round(self.elapsed, 3),
                "steps_per_sec": round(self.steps_per_sec, 3),
                "items_per_sec": round(self.items_per_sec, 3)}


def log_compile_time(fn: Callable, logger=None) -> Callable:
    """Wrap a jitted fn: the first call's wall time is logged as
    compile+run, subsequent calls as run."""
    state = {"first": True}

    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        label = "compile+run" if state["first"] else "run"
        state["first"] = False
        msg = f"{getattr(fn, '__name__', 'fn')}: {label} {dt:.3f}s"
        (logger.info if logger else print)(msg)
        return out

    return wrapped
