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

    def profile_elements(self, window: int = 4, reps: int = 3
                         ) -> Dict[str, float]:
        """Per-element cost attribution inside the fused program
        (SURVEY.md §7 hard-part 5): compile each topo-prefix of the graph
        as its own program (XLA dead-code-eliminates everything past the
        prefix's last node) and report the marginal milliseconds each
        element adds.  Marginals can go slightly negative on noisy hosts
        or when XLA fuses an element away entirely; they are clamped at 0.
        """
        import jax

        p = self.pipeline
        if p._order is None:
            p.negotiate()
        order = p._order
        params = p.params()
        times = []
        for i, node in enumerate(order):
            # topo order guarantees every input of a prefix node is inside
            # the prefix; works for source-driven graphs (host-source
            # pipelines need real input windows and aren't profiled here)
            sub = type(p)(nodes=order[:i + 1])
            sub._order = order[:i + 1]
            step = sub.compile(window, jit=True, donate_state=False)
            sub_params = params[:i + 1]
            states = sub.init_states(window)
            _, out, _ = step(sub_params, states, None)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(reps):
                _, out, _ = step(sub_params, states, None)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / reps)
        report = {}
        prev = 0.0
        for node, t in zip(order, times):
            name = node.name or node.element.NAME
            report[name] = round(max(t - prev, 0.0) * 1000, 4)
            prev = t
        report["_total_ms"] = round(times[-1] * 1000, 4)
        return report


@contextlib.contextmanager
def trace_to(logdir: Optional[str]):
    """jax.profiler trace scope (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield
