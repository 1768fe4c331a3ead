"""Named-span timing registry — the tracing/profiling subsystem.

Reference: hlc/controller/common/ControllerTiming.m: named start/stop spans
recorded per time step as (start, duration) against a shared reference
clock, plus once-only timers and a posix start time for cross-machine
normalization (eval/2-processing/normalize_timing_results.m aligns clocks
offline). The span names on the main path are kept
(HighLevelController.m:169,315,380-391):

  hlc_init_all, control_loop, measure, analyze_reachability,
  receive_from_others, couple, prioritize, weigh, cut, group, plan,
  optimize, publish_predictions, receive_fallback

On TPU most of these phases fuse into one jitted step, so per-phase spans
exist for the host-driven loop; in-step phase profiling uses
``jax.profiler`` traces (see :func:`profile_trace`).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class ControllerTiming:
    """Per-step named timers. Reference: ControllerTiming.m."""

    n_steps_hint: int = 0
    controller_start_time: float = field(default_factory=time.time)
    _t0: float = field(default_factory=time.perf_counter)
    _per_step: dict[str, list[tuple[int, float, float]]] = field(
        default_factory=dict
    )
    _once: dict[str, tuple[float, float]] = field(default_factory=dict)
    _open: dict[str, tuple[int | None, float]] = field(default_factory=dict)

    def start(self, name: str, step: int | None = None) -> None:
        self._open[name] = (step, time.perf_counter() - self._t0)

    def stop(self, name: str) -> None:
        step, start = self._open.pop(name)
        duration = (time.perf_counter() - self._t0) - start
        if step is None:
            self._once[name] = (start, duration)
        else:
            self._per_step.setdefault(name, []).append(
                (step, start, duration)
            )

    @contextlib.contextmanager
    def span(self, name: str, step: int | None = None):
        self.start(name, step)
        try:
            yield
        finally:
            self.stop(name)

    def get_all_timings(self) -> dict:
        """Timing struct (ControllerTiming.get_all_timings capability)."""
        out: dict = {"controller_start_time": self.controller_start_time}
        for name, (start, duration) in self._once.items():
            out[name] = np.array([[start], [duration]])
        for name, entries in self._per_step.items():
            n = max(e[0] for e in entries) + 1
            arr = np.full((2, n), np.nan)
            for step, start, duration in entries:
                arr[0, step] = start
                arr[1, step] = duration
            out[name] = arr
        return out


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """In-step profiling via the JAX profiler (XLA op-level trace).

    The TPU-native replacement for per-phase tic/toc inside the fused step:
    ``with profile_trace('/tmp/trace'): run(...)`` then inspect with
    TensorBoard/xprof.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
