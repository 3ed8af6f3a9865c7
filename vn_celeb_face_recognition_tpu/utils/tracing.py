"""Tracing / profiling utilities.

The reference's only observability was wall-clock FPS prints bracketing
the video loop (demo_video.py:82,194-199). Here:

  * ``StageTimer``: named per-stage wall timers with running stats —
    the video pipeline reports decode / detect+align / embed+classify /
    draw / io breakdowns, not just a single FPS;
  * ``trace()``: context manager wiring jax.profiler start/stop_trace
    so a TensorBoard-compatible device trace can be captured around any
    region (JAX_PROFILER_DIR or explicit path);
  * ``annotate()``: TraceAnnotation pass-through for labelling device
    work inside a trace.
"""

import contextlib
import time
from collections import defaultdict


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._starts = {}

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self):
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(
                    1000.0 * self.totals[name] / max(self.counts[name], 1),
                    2,
                ),
            }
            for name in sorted(self.totals)
        }

    def log(self, printer=print):
        for name, stats in self.report().items():
            printer(
                f"  stage {name:20s} total {stats['total_s']:8.2f}s  "
                f"mean {stats['mean_ms']:8.2f}ms  x{stats['count']}"
            )


@contextlib.contextmanager
def trace(log_dir=None):
    """Capture a jax.profiler device trace around the region (no-op if
    log_dir is None and JAX_PROFILER_DIR unset)."""
    import os

    log_dir = log_dir or os.environ.get("JAX_PROFILER_DIR")
    if not log_dir:
        yield
        return
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Label device work inside a captured trace."""
    import jax.profiler

    return jax.profiler.TraceAnnotation(name)
