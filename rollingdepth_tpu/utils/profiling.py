"""Tracing / profiling utilities.

The reference's observability is tqdm bars + a ``verbose`` flag
(SURVEY.md §5).  Here: structured per-phase wall timers (the pipelines
record ``last_timings``) plus an opt-in ``jax.profiler`` trace — set
``ROLLINGDEPTH_TRACE_DIR`` to capture a TensorBoard-compatible device trace
of any phase.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Dict, Iterator

logger = logging.getLogger(__name__)

TRACE_ENV = "ROLLINGDEPTH_TRACE_DIR"


class PhaseTimer:
    """Accumulates named phase durations; optionally emits jax traces."""

    def __init__(self, verbose: bool = False):
        self.timings: Dict[str, float] = {}
        self.verbose = verbose
        self._trace_dir = os.environ.get(TRACE_ENV)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        ctx = contextlib.nullcontext()
        if self._trace_dir:
            import jax

            ctx = jax.profiler.trace(os.path.join(self._trace_dir, name))
        t0 = time.perf_counter()
        with ctx:
            yield
        dt = time.perf_counter() - t0
        self.timings[name] = self.timings.get(name, 0.0) + dt
        if self.verbose:
            logger.info("phase %s: %.2fs", name, dt)

    def summary(self) -> str:
        total = sum(self.timings.values())
        parts = [f"{k}={v:.2f}s" for k, v in self.timings.items()]
        return f"total={total:.2f}s ({', '.join(parts)})"


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in device traces (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
