"""Named-stage timing, the CUDATimer/TimingLog equivalent.

Reference: src/cuda/CUDATimer.h:28-120 (cudaEvent-based named events with
aggregate mean/sum evaluation), src/cuda/TimingLog.h:6-60 (per-frame stage
times).  Device work is async under JAX, so stage boundaries call
`hard_sync` — a host readback fence that data-depends on the stage outputs
(block_until_ready is not a reliable completion fence on every PJRT
plugin); for finer-grain kernel timing use jax.profiler traces
(utils/profiling.trace).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp


def hard_sync(tree: Any) -> Any:
    """Force completion of all device work producing `tree`; returns `tree`.

    `jax.block_until_ready` is NOT reliable on every PJRT plugin (on the
    remote-tunnel TPU platform it returns before execution finishes, which
    makes naive timing report dispatch cost instead of device time).  The
    only portable completion fence is a host readback that data-depends on
    the result, so this fetches one scalar from every leaf in a single
    transfer.  Use this, never block_until_ready, around timed regions.

    Leaves committed to different devices are fine (no cross-device op is
    built); extended dtypes such as typed PRNG key arrays are fenced via
    their raw key data.
    """
    leaves = []
    for x in jax.tree_util.tree_leaves(tree):
        if not (isinstance(x, jax.Array) and x.size):
            continue
        if not isinstance(x.dtype, jnp.dtype):  # extended dtype (PRNG keys)
            try:
                x = jax.random.key_data(x)
            except Exception:
                continue
        leaves.append(x)
    if not leaves:
        # Nothing we can build a readback token from: fall back to a
        # best-effort block so the caller still gets *some* fence rather
        # than silently measuring dispatch time only.
        jax.block_until_ready(tree)
        return tree
    # One tiny slice per leaf, fetched in a single device_get transfer.
    jax.device_get([jnp.ravel(x)[0] for x in leaves])
    return tree


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
            hard_sync(sync)
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
