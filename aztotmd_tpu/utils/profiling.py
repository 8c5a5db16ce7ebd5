"""First-class profiling / tracing.

The reference's only observability is a wall-clock bracket around main()
(main.cu:241,459) and launch-config timings in comments (cuPairs.cu:1131).
Here: a Perfetto/XPlane trace context (viewable in xprof / Perfetto) and
a per-stage wall-clock timer used by `python -m aztotmd_tpu run --profile`.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX profiler trace context -> Perfetto/XPlane dump in log_dir."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock timer keyed by stage name; blocks on the
    given array before reading the clock so device work is included."""

    def __init__(self):
        self.total = {}
        self.count = {}
        self._t0 = None
        self._stage = None

    def start(self, stage: str):
        self._stage = stage
        self._t0 = time.perf_counter()

    def stop(self, wait_on=None):
        if wait_on is not None:
            import jax
            jax.block_until_ready(wait_on)
        dt = time.perf_counter() - self._t0
        self.total[self._stage] = self.total.get(self._stage, 0.0) + dt
        self.count[self._stage] = self.count.get(self._stage, 0) + 1
        self._stage = None
        return dt

    @contextlib.contextmanager
    def stage(self, name: str, wait_on_fn=None):
        self.start(name)
        try:
            yield
        finally:
            self.stop(wait_on_fn() if wait_on_fn else None)

    def report(self) -> str:
        lines = ["stage                    total_s   calls   ms/call"]
        for k in sorted(self.total, key=lambda k: -self.total[k]):
            t, c = self.total[k], self.count[k]
            lines.append(f"{k:<24} {t:8.3f} {c:7d} {1000 * t / c:9.2f}")
        return "\n".join(lines)
