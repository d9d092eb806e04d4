"""Prefix sums as MXU matmuls.

jnp.cumsum lowers to reduce-window on TPU, which costs milliseconds even for
a few thousand elements.  An inclusive prefix sum is x @ U with U an
upper-triangular ones matrix, so it maps onto one or two tiny MXU matmuls.
Exact in f32 for sums below 2^24 — all users here sum booleans over at most
tens of thousands of elements.

Used by the dense-term compaction (solver/dense_p2p.py), RANSAC's
valid-first ordering (ransac/ransac.py), and the landmark table
(matching/mappoints.py) — each was a measured reduce-window hot spot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.lru_cache(maxsize=32)
def _tri(n: int):
    # numpy, NOT jnp: a jnp constant built inside a trace would cache a
    # tracer and leak it into later traces
    return np.triu(np.ones((n, n), np.float32))


def prefix_sum_last(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the LAST axis via one triangular matmul.

    Suitable when the last axis is at most a few hundred (the matmul is
    O(n^2) but tiny); batching dims ride along for free.
    """
    n = x.shape[-1]
    return _dot(x.astype(jnp.float32), _tri(n)).astype(jnp.int32)


def prefix_sum_1d(x: jnp.ndarray, lane: int = 128) -> jnp.ndarray:
    """Inclusive prefix sum of a long 1-D array: per-row prefix + row offsets
    (two matmuls)."""
    n = x.shape[0]
    rows = -(-n // lane)
    pad = rows * lane - n
    xf = jnp.pad(x.astype(jnp.float32), (0, pad)).reshape(rows, lane)
    s = _dot(xf, _tri(lane))
    tot = jnp.sum(xf, axis=1)
    off = _dot(tot[None], _tri(rows))[0] - tot
    return (s + off[:, None]).reshape(-1)[:n].astype(jnp.int32)
