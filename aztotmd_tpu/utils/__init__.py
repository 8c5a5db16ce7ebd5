"""Utilities: profiling/tracing helpers (the reference has none —
SURVEY.md §5 'Tracing / profiling: None. Wall-clock only')."""

from .profiling import StageTimer, trace

__all__ = ["StageTimer", "trace"]
