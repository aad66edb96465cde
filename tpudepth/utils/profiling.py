"""Tracing / profiling utilities.

The reference's observability is wall-clock meters with ETA strings
(``src/train.py:74,117-119``), data_time/gpu_time splits
(``src/GuideDepth/training.py:118-126``) and sync-bracketed FPS speedtests
(``src/GuideDepth/inference.py:150-155``). Equivalents here plus the TPU-native
additions: ``jax.profiler`` device traces viewable in TensorBoard/XProf and
a ``timed`` helper that brackets with ``block_until_ready`` (the TPU analogue
of ``torch.cuda.synchronize``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace for TensorBoard's profile plugin / XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up on the XProf timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def timed(fn: Callable, *args, sync: bool = True, **kw):
    """(result, seconds) with block_until_ready bracketing."""
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    if sync:
        jax.block_until_ready(out)
    return out, time.perf_counter() - t0


class StepTimer:
    """data_time / compute_time split per step (GuideDepth val-loop style)."""

    def __init__(self):
        self.data_time = 0.0
        self.compute_time = 0.0
        self.steps = 0
        self._t = time.perf_counter()

    def data_done(self):
        now = time.perf_counter()
        self.data_time += now - self._t
        self._t = now

    def step_done(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        now = time.perf_counter()
        self.compute_time += now - self._t
        self._t = now
        self.steps += 1

    def summary(self) -> Dict[str, float]:
        n = max(self.steps, 1)
        return {
            "data_time_per_step": self.data_time / n,
            "compute_time_per_step": self.compute_time / n,
            "steps": self.steps,
        }
