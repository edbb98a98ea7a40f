"""Graceful-preemption guard for the training loops.

TPU VMs (and most cluster schedulers) announce preemption with SIGTERM and
grant a short grace window before SIGKILL. The reference's recovery model is
manual restart from the last periodic checkpoint (its trainers install no
handlers — train.py simply dies and `--start_from` resumes at the last eval
save, losing up to `save_checkpoint_every` iterations of work). Here the
trainers install a `PreemptGuard`: the signal only sets a flag, the loop
checks it at the next iteration boundary, writes a regular (non-best)
checkpoint with the full infos/iterator state, and exits cleanly — resume
with `--start_from` loses at most one iteration.

Semantics:
  * SIGTERM sets the flag (async-signal-safe: no I/O in the handler).
  * A second SIGTERM restores the original dispositions, so a third one
    (an impatient supervisor) acts immediately.
  * `close()` restores the original handlers; the trainers call it in the
    loop epilogue so library callers' signal state is untouched.

Multi-host coordination: on a multi-process runtime the scheduler may
deliver SIGTERM to a SUBSET of hosts first (or only). A checkpoint save is
collective for sharded params (orbax) and the training step itself is a
collective program, so hosts must agree on WHEN to stop — a host breaking
out alone deadlocks the rest inside the next psum. The loops therefore
check the guard through `sync()`: each boundary all-gathers the per-host
flag (one tiny host-scalar collective, negligible next to a train step) and
every host trips together at the first boundary after ANY host was
signalled. Single-process `sync()` is just the flag read — no collective.

Scope guard — the signal handler silently stays uninstalled when not in
the main thread (CPython only delivers signals there, and `signal.signal`
raises elsewhere — e.g. CaptionServer worker threads); `sync()` still
participates in the collective so the host can be stopped by its peers.

Disable with `--graceful_preempt 0` (e.g. when a supervisor wraps the
process and owns SIGTERM itself).
"""

from __future__ import annotations

import signal
import threading


class PreemptGuard:
    """Flag-setting SIGTERM handler with restore-on-close."""

    SIGNALS = (signal.SIGTERM,)

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.triggered = False
        self._installed = []

    @classmethod
    def from_opt(cls, opt) -> "PreemptGuard":
        return cls(enabled=bool(getattr(opt, "graceful_preempt", 1))).install()

    def install(self) -> "PreemptGuard":
        if not self.enabled:
            return self
        if threading.current_thread() is not threading.main_thread():
            return self
        for sig in self.SIGNALS:
            old = signal.signal(sig, self._handler)
            self._installed.append((sig, old))
        return self

    def _handler(self, signum, frame):
        if self.triggered:
            # second signal: step aside so the next one acts immediately
            self.close()
        self.triggered = True

    def sync(self) -> bool:
        """Iteration-boundary check; collectively agreed on multi-host.

        Every process must call this the same number of times (the training
        loops do — they run in lockstep by construction, or their collective
        steps would already deadlock). Returns True on EVERY host once ANY
        host has been signalled, so saves and loop exits stay collective.
        """
        if not self.enabled:
            return False
        import jax

        if jax.process_count() == 1:
            return self.triggered
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.int32(1 if self.triggered else 0)
        )
        if int(np.max(flags)):
            self.triggered = True
        return self.triggered

    def close(self):
        for sig, old in self._installed:
            signal.signal(sig, old)
        self._installed = []
