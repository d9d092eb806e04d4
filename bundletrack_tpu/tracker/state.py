"""Tracker state: an explicit pytree replacing the reference's heap objects.

The reference keeps per-frame state in shared_ptr<Frame> objects linked into
deques/maps (reference: src/Frame.h:45-96, src/Bundler.h:76-83 _frames /
_keyframes / _newframe; feature memory inside SiftManager::_matches and
MapPoints).  Here the entire tracker is one fixed-shape pytree — carried
through jit, trivially checkpointable with orbax, and shardable along a
leading stream axis for fleet tracking.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from bundletrack_tpu.config import TrackerConfig
from bundletrack_tpu.matching.mappoints import MapPointTable, init_mappoints

# Frame status codes (reference src/Frame.h:48-53)
STATUS_OK = 0  # Frame::OTHER
STATUS_FAIL = 1  # Frame::FAIL
STATUS_NO_BA = 2  # Frame::NO_BA


class FrameObservation(NamedTuple):
    """One RGB-D input frame (host-prepared, device-resident)."""

    gray: jnp.ndarray  # [H, W] in [0, 1]
    depth: jnp.ndarray  # [H, W] meters, 0 invalid (raw; preprocessing in-step)
    mask: jnp.ndarray  # [H, W] bool segmentation
    K: jnp.ndarray  # [3, 3]


class TrackerState(NamedTuple):
    """All persistent tracker state (single stream; vmap for fleets)."""

    # --- keyframe pool (capacity Kp) -----------------------------------
    kf_desc: jnp.ndarray  # [Kp, N, D]
    kf_pts: jnp.ndarray  # [Kp, N, 3] camera-frame keypoint positions
    kf_normals: jnp.ndarray  # [Kp, N, 3]
    kf_kp_valid: jnp.ndarray  # [Kp, N]
    kf_pose: jnp.ndarray  # [Kp, 4, 4] cam -> model
    # solve-ready dense-term tables, compacted ONCE at admission
    # (CUDACache::storeFrame pattern; see solver/dense_p2p.py FrameDense)
    kf_dsrc: jnp.ndarray  # [Kp, 6, C] compacted source planes
    kf_dvalid: jnp.ndarray  # [Kp, C]
    kf_dlin: jnp.ndarray  # [Kp, C] int32
    kf_tchan: jnp.ndarray  # [Kp, Hd, Wd, 8] bf16 gather table
    kf_frame_id: jnp.ndarray  # [Kp] int32, -1 = empty slot
    # --- previous frame (neighbor-matching target) ---------------------
    prev_desc: jnp.ndarray  # [N, D]
    prev_pts: jnp.ndarray  # [N, 3]
    prev_normals: jnp.ndarray  # [N, 3]
    prev_kp_valid: jnp.ndarray  # [N]
    prev_pose: jnp.ndarray  # [4, 4]
    prev_valid: jnp.ndarray  # scalar bool
    # --- landmark memory ----------------------------------------------
    mappoints: MapPointTable
    # --- bookkeeping ---------------------------------------------------
    frame_count: jnp.ndarray  # scalar int32
    last_status: jnp.ndarray  # scalar int32
    need_reinit: jnp.ndarray  # scalar bool (reference _need_reinit)
    fail_streak: jnp.ndarray  # scalar int32: consecutive FAIL frames
    # constant-velocity motion model: last inter-frame delta (model frame,
    # left-composed) and the prediction for the NEXT incoming frame
    prev_delta: jnp.ndarray  # [4, 4]
    pred_pose: jnp.ndarray  # [4, 4]
    rng_key: jnp.ndarray  # PRNG state for RANSAC


class TrackOutput(NamedTuple):
    ob_in_cam: jnp.ndarray  # [4, 4] object pose in camera (reference format)
    pose_in_model: jnp.ndarray  # [4, 4]
    status: jnp.ndarray  # int32
    num_matches: jnp.ndarray  # int32 neighbor inliers
    num_ba_edges: jnp.ndarray  # int32


def init_tracker_state(cfg: TrackerConfig, H: int, W: int, seed: int = 0) -> TrackerState:
    Kp = cfg.keyframe.pool_size
    N = cfg.frontend.top_k
    D = cfg.frontend.desc_dim
    ds = cfg.bundle.image_downscale
    Hd, Wd = H // ds, W // ds
    C = min(Hd * Wd, cfg.bundle.dense_src_capacity)
    f32 = jnp.float32
    eye = jnp.eye(4, dtype=f32)
    import jax

    return TrackerState(
        kf_desc=jnp.zeros((Kp, N, D), f32),
        kf_pts=jnp.zeros((Kp, N, 3), f32),
        kf_normals=jnp.zeros((Kp, N, 3), f32),
        kf_kp_valid=jnp.zeros((Kp, N), bool),
        kf_pose=jnp.broadcast_to(eye, (Kp, 4, 4)),
        kf_dsrc=jnp.zeros((Kp, 6, C), f32),
        kf_dvalid=jnp.zeros((Kp, C), bool),
        kf_dlin=jnp.zeros((Kp, C), jnp.int32),
        kf_tchan=jnp.zeros((Kp, Hd, Wd, 8), jnp.bfloat16),
        kf_frame_id=jnp.full((Kp,), -1, jnp.int32),
        prev_desc=jnp.zeros((N, D), f32),
        prev_pts=jnp.zeros((N, 3), f32),
        prev_normals=jnp.zeros((N, 3), f32),
        prev_kp_valid=jnp.zeros((N,), bool),
        prev_pose=eye,
        prev_valid=jnp.asarray(False),
        mappoints=init_mappoints(cfg.shapes.max_landmarks, Kp, N),
        frame_count=jnp.asarray(0, jnp.int32),
        last_status=jnp.asarray(STATUS_OK, jnp.int32),
        need_reinit=jnp.asarray(False),
        fail_streak=jnp.asarray(0, jnp.int32),
        prev_delta=jnp.eye(4, dtype=jnp.float32),
        pred_pose=jnp.eye(4, dtype=jnp.float32),
        rng_key=jax.random.PRNGKey(seed),
    )
