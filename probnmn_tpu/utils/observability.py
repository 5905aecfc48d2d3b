r"""
Tracing / profiling / throughput counters (SURVEY.md §5: the reference has no
observability beyond tqdm; the TPU build adds jax.profiler trace hooks and
per-phase step-time / examples-per-sec counters).
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import deque
from typing import Iterator, Optional

import jax

logger = logging.getLogger(__name__)


class StepTimer:
    r"""Rolling step-time and throughput tracker.

    Call :meth:`tick` once per training step (after the step's host work has been
    dispatched). Because JAX dispatch is asynchronous, per-step wall times are
    only meaningful averaged over a window — which is what this reports.
    """

    def __init__(self, window: int = 50, batch_size: Optional[int] = None):
        self._times: deque = deque(maxlen=window)
        self._last: Optional[float] = None
        self._batch_size = batch_size

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    @property
    def step_time_ms(self) -> float:
        if not self._times:
            return 0.0
        return 1000.0 * sum(self._times) / len(self._times)

    @property
    def examples_per_sec(self) -> float:
        if not self._times or not self._batch_size:
            return 0.0
        return self._batch_size / (sum(self._times) / len(self._times))

    def metrics(self) -> dict:
        out = {"step_time_ms": self.step_time_ms}
        if self._batch_size:
            out["examples_per_sec"] = self.examples_per_sec
        return out


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    r"""jax.profiler trace context; view with TensorBoard's profile plugin or
    Perfetto. Usage: ``with profile_trace("/tmp/trace"): run_steps()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Wrote profiler trace to %s", log_dir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    r"""Named region in profiler traces (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
