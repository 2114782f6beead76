"""Tracing/profiling — the GstTracer-analog (SURVEY.md section 5.1).

The reference instruments via fpsdisplaysink counters and per-element debug
categories; here a PipelineTracer wraps Pipeline.run with per-window wall
timers and message counters, and trace_to() wraps a block in jax.profiler
for device-level traces (the GST_DEBUG_BIN_TO_DOT analog is repr(pipeline)).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class PipelineTracer:
    """Wraps a Pipeline: records per-window wall time, frames, messages.

    usage:
        tracer = PipelineTracer(pipeline)
        pipeline.run(...)
        print(tracer.report())
    """

    def __init__(self, pipeline):
        self.pipeline = pipeline
        self.window_times: List[float] = []
        self.frames = 0
        self._orig_step = None
        self._install()

    def _install(self):
        orig_run = self.pipeline.run

        def run(*a, **kw):
            t_outer = time.perf_counter()
            out = orig_run(*a, **kw)
            self.window_times.append(time.perf_counter() - t_outer)
            batches = out if isinstance(out, list) else out.get(0, [])
            self.frames += sum(b.batch for b in batches)
            return out

        self.pipeline.run = run

    @property
    def total_time(self) -> float:
        return sum(self.window_times)

    @property
    def fps(self) -> float:
        return self.frames / self.total_time if self.total_time else 0.0

    def report(self) -> Dict[str, float]:
        return {
            "graph": repr(self.pipeline),
            "frames": self.frames,
            "wall_s": round(self.total_time, 4),
            "fps": round(self.fps, 2),
            "messages": len(self.pipeline.bus.messages),
        }


@contextlib.contextmanager
def trace_to(logdir: Optional[str]):
    """jax.profiler trace scope (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield
