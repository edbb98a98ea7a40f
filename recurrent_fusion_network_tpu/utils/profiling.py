"""Profiling hooks.

The reference's only tracing is `time.time()` around each iteration
(train.py:109,167). step_timer keeps that; profile_trace wraps
jax.profiler.trace so a training window can be captured for xprof/tensorboard
analysis on TPU.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def step_timer():
    """Yields a dict filled with {'seconds': wall time} on exit."""
    out = {}
    t0 = time.perf_counter()
    try:
        yield out
    finally:
        out["seconds"] = time.perf_counter() - t0


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture an XLA profiler trace of the enclosed block."""
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
