"""Utilities: logging/metrics sinks, timers, profiling hooks.

The reference's observability is wall-clock prints + in-memory history dicts
persisted in infos.pkl (SURVEY.md §5); this package keeps that surface and
adds structured JSONL metric logging and an XLA profiler hook.
"""

from .logging import JsonlLogger, MetricsLog  # noqa: F401
from .profiling import profile_trace, step_timer  # noqa: F401
