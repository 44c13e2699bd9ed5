"""Stage timing + profiling hooks (SURVEY.md §6.1 rebuild commitments).

The reference's only observability is tqdm bars; sitator_tpu adds a
structured per-stage timing report and optional ``jax.profiler`` trace
capture around any stage.
"""
from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger(__name__)


class StageTimer:
    """Collects named wall-clock stages; ``report()`` returns/logs a table.

    >>> t = StageTimer()
    >>> with t.stage("landmark"):
    ...     ...
    >>> print(t.report())
    """

    def __init__(self, name="pipeline"):
        self.name = name
        self.stages = []  # (name, seconds)

    @contextlib.contextmanager
    def stage(self, name, trace_dir=None):
        ctx = contextlib.nullcontext()
        if trace_dir is not None:
            import jax
            ctx = jax.profiler.trace(trace_dir)
        t0 = time.perf_counter()
        with ctx:
            yield
        self.stages.append((name, time.perf_counter() - t0))

    @property
    def total(self):
        return sum(s for _, s in self.stages)

    def report(self, log=False):
        width = max((len(n) for n, _ in self.stages), default=5)
        lines = [f"{self.name} timing:"]
        for n, s in self.stages:
            pct = 100.0 * s / self.total if self.total else 0.0
            lines.append(f"  {n:<{width}}  {s:9.3f}s  {pct:5.1f}%")
        lines.append(f"  {'TOTAL':<{width}}  {self.total:9.3f}s")
        out = "\n".join(lines)
        if log:
            logger.info("%s", out)
        return out


@contextlib.contextmanager
def device_trace(trace_dir):
    """Capture a jax profiler trace (view with TensorBoard/XProf)."""
    import jax
    with jax.profiler.trace(trace_dir):
        yield
