"""Keyframe admission, eviction, and BA subset selection — in-graph.

Reference logic (src/Bundler.cpp):
  * checkAndAddKeyframe:185-218 — frame 0 always; else status OK, enough
    keypoints, and rotation-geodesic >= min_rot from EVERY keyframe.
  * selectKeyFramesForBA:222-274 — BA set = {newframe} + all keyframes if
    they fit, else {newframe, keyframes[0]} + greedily add the keyframe with
    MINIMUM cumulative rotation distance to the selected set (prefers
    view-overlapping keyframes).

TPU-native: both are masked argmin/argmax loops over the fixed-capacity pool —
no dynamic containers, runs inside the jitted tracker step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bundletrack_tpu.geometry.se3 import rotation_geodesic_distance

# Plain numpy scalars, NOT jnp.float32(...): a module-level jnp scalar is a
# committed device array; capturing one in a jitted closure flips the axon TPU
# runtime into synchronous dispatch for the rest of the process (~32 ms tunnel
# round-trip added to EVERY executable call).
_BIG = np.float32(1e9)
_BIG_ID = np.int32(1 << 30)


def keyframe_admission(
    kf_frame_id: jnp.ndarray,  # [Kp]
    kf_pose: jnp.ndarray,  # [Kp, 4, 4]
    new_pose: jnp.ndarray,  # [4, 4]
    num_feat: jnp.ndarray,  # scalar int
    status_ok: jnp.ndarray,  # scalar bool
    min_feat_num: int,
    min_rot_deg: float,
) -> jnp.ndarray:
    """Whether the new frame should join the keyframe pool."""
    used = kf_frame_id >= 0
    rot = jnp.rad2deg(
        rotation_geodesic_distance(kf_pose[:, :3, :3], new_pose[None, :3, :3])
    )
    far_enough = jnp.all(jnp.where(used, rot >= min_rot_deg, True))
    return status_ok & (num_feat >= min_feat_num) & far_enough


def eviction_slot(kf_frame_id: jnp.ndarray, kf_pose: jnp.ndarray) -> jnp.ndarray:
    """Slot to overwrite when the pool is full: free slot if any, else the
    most *redundant* keyframe — the one with the smallest rotation distance
    to its nearest pool neighbor (keeps the pool's rotation spread, the
    quantity greedy_rot selection feeds on).  Never evicts the oldest
    keyframe (the reference's anchor _keyframes[0])."""
    Kp = kf_frame_id.shape[0]
    used = kf_frame_id >= 0
    any_free = jnp.any(~used)
    first_free = jnp.argmax(~used)

    R = kf_pose[:, :3, :3]
    d = rotation_geodesic_distance(R[:, None], R[None, :])  # [Kp, Kp]
    d = jnp.where(jnp.eye(Kp, dtype=bool), _BIG, d)
    pair_ok = used[:, None] & used[None, :]
    d = jnp.where(pair_ok, d, _BIG)
    nearest = jnp.min(d, axis=-1)  # [Kp]
    oldest = jnp.argmin(jnp.where(used, kf_frame_id, _BIG_ID))
    nearest = jnp.where(jnp.arange(Kp) == oldest, _BIG, nearest)
    nearest = jnp.where(used, nearest, _BIG)
    most_redundant = jnp.argmin(nearest)
    return jnp.where(any_free, first_free, most_redundant).astype(jnp.int32)


def select_ba_subset(
    kf_frame_id: jnp.ndarray,  # [Kp]
    kf_pose: jnp.ndarray,  # [Kp, 4, 4]
    new_pose: jnp.ndarray,  # [4, 4]
    max_pool_frames: int,  # = max_BA_frames - 1 (new frame takes one slot)
):
    """greedy_rot subset selection over the pool.

    Returns (slots [max_pool_frames] int32 pool indices sorted by frame id,
    valid [max_pool_frames] bool).  The caller appends the new frame.
    """
    Kp = kf_frame_id.shape[0]
    used = kf_frame_id >= 0
    R = kf_pose[:, :3, :3]
    rot_pool = rotation_geodesic_distance(R[:, None], R[None, :])  # [Kp, Kp]
    rot_new = rotation_geodesic_distance(R, new_pose[None, :3, :3])  # [Kp]

    oldest = jnp.argmin(jnp.where(used, kf_frame_id, _BIG_ID))
    selected = jnp.zeros((Kp,), bool)
    selected = jnp.where(jnp.any(used), selected.at[oldest].set(True), selected)
    # cumulative rotation distance of each candidate to the selected set
    # (seeded with the distance to the new frame, which is always in the set)
    cum = rot_new + jnp.where(jnp.any(used), rot_pool[:, oldest], 0.0)

    def body(_, carry):
        selected, cum = carry
        eligible = used & ~selected
        score = jnp.where(eligible, cum, _BIG)
        pick = jnp.argmin(score)
        ok = eligible[pick]
        selected = jnp.where(ok, selected.at[pick].set(True), selected)
        cum = jnp.where(ok, cum + rot_pool[:, pick], cum)
        return selected, cum

    selected, _ = jax.lax.fori_loop(
        0, max_pool_frames - 1, body, (selected, cum)
    )

    # order selected slots by frame id (reference sorts _local_frames by id,
    # Bundler.cpp:286); unselected sort to the end
    sort_key = jnp.where(selected, kf_frame_id, _BIG_ID)
    order = jnp.argsort(sort_key)
    slots = order[:max_pool_frames].astype(jnp.int32)
    valid = selected[slots]
    return slots, valid
