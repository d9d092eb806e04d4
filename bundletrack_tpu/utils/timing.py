"""Named-stage timing, the CUDATimer/TimingLog equivalent.

Reference: src/cuda/CUDATimer.h:28-120 (cudaEvent-based named events with
aggregate mean/sum evaluation), src/cuda/TimingLog.h:6-60 (per-frame stage
times).  Device work is async under JAX, so stage boundaries call
block_until_ready on a representative output (like cudaEventSynchronize);
for finer-grain kernel timing use jax.profiler traces
(utils/profiling.trace).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Any, Dict, List, Optional

import jax


class StageTimer:
    """Accumulates wall-times per named stage across frames."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.times: Dict[str, List[float]] = defaultdict(list)

    @contextmanager
    def stage(self, name: str, sync: Optional[Any] = None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.times[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self.times[name].append(seconds)

    def evaluate(self) -> str:
        """Aggregate report (reference CUDATimer::evaluate)."""
        lines = ["=== StageTimer ==="]
        for name, ts in sorted(self.times.items()):
            total = sum(ts)
            lines.append(
                f"{name:32s} n={len(ts):5d} mean={1000*total/len(ts):8.2f}ms "
                f"total={total:8.3f}s"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.times.clear()
