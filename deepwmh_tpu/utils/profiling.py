"""Profiling / tracing hooks.

The reference only has wall-clock timers (SURVEY.md §5); the TPU framework
adds jax.profiler trace capture plus per-stage timing that feeds the run
log.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates named stage durations; renders a summary table."""

    def __init__(self, logger=None):
        self.durations = {}
        self.logger = logger

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.durations[name] = self.durations.get(name, 0.0) + dt
            if self.logger is not None:
                self.logger.write("[timing] %s: %.2fs" % (name, dt))

    def summary(self) -> str:
        from deepwmh_tpu.utils.table import render_table

        rows = [(k, "%.2f s" % v) for k, v in sorted(self.durations.items())]
        return render_table(["stage", "elapsed"], rows)
