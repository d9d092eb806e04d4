"""Profiler hooks: jax.profiler traces (perfetto/tensorboard).

TPU replacement for the reference's cudaEvent instrumentation inside solver
stages (reference: CUDATimer usage in SolverBundling.cu:831,
CUDASolverBundling.h:39-48 evaluateTimings).  Wrap any region with
`trace(...)` and inspect the written trace with tensorboard or perfetto.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a trace (shows up on the timeline)."""
    return jax.profiler.TraceAnnotation(name)
