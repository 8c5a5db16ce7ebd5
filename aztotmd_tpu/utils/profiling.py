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
        self._stack = []

    def start(self, stage: str):
        self._stack.append((stage, time.perf_counter()))

    def stop(self, wait_on=None):
        if wait_on is not None:
            import jax
            jax.block_until_ready(wait_on)
        stage, t0 = self._stack.pop()
        dt = time.perf_counter() - t0
        self.total[stage] = self.total.get(stage, 0.0) + dt
        self.count[stage] = self.count.get(stage, 0) + 1
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
