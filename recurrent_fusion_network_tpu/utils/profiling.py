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


class TraceWindow:
    """Capture a jax.profiler (xprof) trace of training iterations
    [start, start+steps). Driven by --profile_dir/--profile_start/
    --profile_steps; call tick(iteration) at the top of each loop iteration
    and close() on exit. Inert when steps == 0 or log_dir is empty."""

    def __init__(self, log_dir: str, start: int, steps: int):
        self.log_dir, self.start, self.steps = log_dir, start, steps
        self.enabled = bool(log_dir) and steps > 0
        self.active = False

    @classmethod
    def from_opt(cls, opt):
        return cls(
            getattr(opt, "profile_dir", "") or "",
            int(getattr(opt, "profile_start", 5) or 0),
            int(getattr(opt, "profile_steps", 0) or 0),
        )

    def tick(self, iteration: int) -> None:
        if not self.enabled:
            return
        import jax

        if not self.active and iteration >= self.start:
            jax.profiler.start_trace(self.log_dir)
            self.active = True
            self._stop_at = iteration + self.steps
        elif self.active and iteration >= self._stop_at:
            jax.profiler.stop_trace()
            self.active = False
            self.enabled = False  # one window per run
            print(f"profiler trace written to {self.log_dir}")

    def close(self) -> None:
        if self.active:
            import jax

            jax.profiler.stop_trace()
            self.active = False
            self.enabled = False
            print(f"profiler trace written to {self.log_dir}")
