"""Map-point (landmark) memory: long-range feature tracks across keyframes.

TPU-native rewrite of the reference's MapPoint machinery
(reference: src/FeatureManager.h:57-67 MapPoint = frame->(u,v) track;
src/FeatureManager.cpp:448-485 updateFramePairMapPoints, 489-520
findCorresByMapPoints, 142-170 forgetFrame).

The reference's pointer-linked std::map tracks become two fixed-capacity
index tables (a pytree, checkpointable with orbax):

  obs [L, K]: keypoint index of landmark l in keyframe slot k (-1 = none)
  rev [K, N]: landmark id owning keypoint n of slot k (-1 = none)

All updates are masked scatters with mode='drop' — no host round trips, no
dynamic allocation; new landmarks are placed into free rows via a prefix-sum
over the free list.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundletrack_tpu.matching.pairwise import MatchResult
from bundletrack_tpu.ops.prefix import prefix_sum_1d


class MapPointTable(NamedTuple):
    obs: jnp.ndarray  # [L, K] int32, -1 invalid
    rev: jnp.ndarray  # [K, N] int32, -1 invalid

    @property
    def num_landmarks(self) -> jnp.ndarray:
        return jnp.sum(jnp.any(self.obs >= 0, axis=-1))


def init_mappoints(capacity: int, num_slots: int, num_kpts: int) -> MapPointTable:
    return MapPointTable(
        obs=jnp.full((capacity, num_slots), -1, jnp.int32),
        rev=jnp.full((num_slots, num_kpts), -1, jnp.int32),
    )


def update_mappoints(
    table: MapPointTable,
    slot_i: jnp.ndarray,
    slot_j: jnp.ndarray,
    matches: MatchResult,
) -> MapPointTable:
    """Absorb verified matches between keyframe slots i and j into the tracks.

    Mirrors reference updateFramePairMapPoints: a match extends the landmark
    already owning either endpoint, else spawns a new landmark observing both.
    """
    obs, rev = table.obs, table.rev
    L = obs.shape[0]
    M = matches.idx_a.shape[0]
    ia, ib, mvalid = matches.idx_a, matches.idx_b, matches.valid

    N = rev.shape[1]  # drop sentinel for keypoint-axis scatters (-1 would wrap)
    lm_a = rev[slot_i, ia]  # [M]
    lm_b = rev[slot_j, ib]

    has_a = mvalid & (lm_a >= 0)
    has_b = mvalid & (lm_b >= 0) & ~has_a
    fresh = mvalid & (lm_a < 0) & (lm_b < 0)

    # --- extend existing landmarks -------------------------------------
    # a owns a landmark: record j's observation
    tgt = jnp.where(has_a, lm_a, L)  # L = dropped
    obs = obs.at[tgt, slot_j].set(ib, mode="drop")
    rev = rev.at[slot_j, jnp.where(has_a, ib, N)].set(lm_a, mode="drop")
    # b owns a landmark: record i's observation
    tgt = jnp.where(has_b, lm_b, L)
    obs = obs.at[tgt, slot_i].set(ia, mode="drop")
    rev = rev.at[slot_i, jnp.where(has_b, ia, N)].set(lm_b, mode="drop")

    # --- allocate new landmarks ----------------------------------------
    free = ~jnp.any(obs >= 0, axis=-1)  # [L]
    # rank of each free row among free rows (0-based); MXU prefix sums —
    # jnp.cumsum lowers to a slow reduce-window on TPU
    free_rank = prefix_sum_1d(free) - 1
    # rank of each fresh match among fresh matches
    fresh_rank = prefix_sum_1d(fresh) - 1  # [M]
    # landmark row assigned to fresh match m: the (fresh_rank[m])-th free row
    # Build mapping rank -> row index via scatter.
    rank_to_row = jnp.full((L + 1,), L, jnp.int32)
    rank_to_row = rank_to_row.at[jnp.where(free, free_rank, L + 1)].set(
        jnp.arange(L, dtype=jnp.int32), mode="drop"
    )
    new_rows = rank_to_row[jnp.clip(fresh_rank, 0, L)]  # [M]
    new_rows = jnp.where(fresh, new_rows, L)
    obs = obs.at[new_rows, slot_i].set(ia, mode="drop")
    obs = obs.at[new_rows, slot_j].set(ib, mode="drop")
    ok_new = fresh & (new_rows < L)
    rev = rev.at[slot_i, jnp.where(ok_new, ia, N)].set(new_rows, mode="drop")
    rev = rev.at[slot_j, jnp.where(ok_new, ib, N)].set(new_rows, mode="drop")
    return MapPointTable(obs=obs, rev=rev)


def propagate_matches(
    table: MapPointTable,
    slot_i: jnp.ndarray,
    slot_j: jnp.ndarray,
    max_matches: int,
) -> MatchResult:
    """Matches between slots i, j implied by shared landmarks.

    Reference findCorresByMapPoints (FeatureManager.cpp:489-520) seeds
    non-neighbor pair matching from the landmark memory; here it is one
    gather + top-k compaction over the track table.
    """
    oi = table.obs[:, slot_i]  # [L]
    oj = table.obs[:, slot_j]
    both = (oi >= 0) & (oj >= 0)
    score = both.astype(jnp.float32)
    topv, topl = jax.lax.top_k(score, max_matches)
    valid = topv > 0.5
    idx_a = jnp.where(valid, oi[topl], 0).astype(jnp.int32)
    idx_b = jnp.where(valid, oj[topl], 0).astype(jnp.int32)
    return MatchResult(idx_a=idx_a, idx_b=idx_b, valid=valid)


def forget_frame(table: MapPointTable, slot: jnp.ndarray) -> MapPointTable:
    """Remove all observations of a keyframe slot (reference forgetFrame).

    Landmarks left with fewer than 1 observation die implicitly (their rows
    become free for reallocation).
    """
    obs = table.obs.at[:, slot].set(-1)
    rev = table.rev.at[slot, :].set(-1)
    return MapPointTable(obs=obs, rev=rev)
