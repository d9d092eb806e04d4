"""Batched multi-pair 3-point RANSAC for rigid pose hypotheses.

TPU-native rewrite of the reference's GPU RANSAC
(reference: src/cuda/cuda_ransac.cu — ransacEstimateModelKernel:1145-1181
samples 3 matches per trial with curand, procrustesKernel:998-1102 runs a
branch-free device SVD per trial, ransacEvalModelKernel:1183-1200 counts
inliers, findBestTrial:1202-1217 argmaxes, one CUDA stream per pair:1267-1284;
host wrapper runRansacMultiPairGPU, src/FeatureManager.cpp:659-741).

Design (not a port):
  * CUDA streams -> an explicit pair axis [P]; trials -> axis [T]; the whole
    thing is one vmapped program with static shapes.
  * The per-trial SVD becomes a closed-form orthonormal-frame solve
    (geometry.procrustes.rigid_from_three_points) — branch-free VPU math.
  * curand -> threefry (jax.random), deterministic by construction (the
    reference seeds curand with 0 intending determinism, but its atomics
    race; here determinism is exact).
  * Trials are evaluated in chunks with lax.map to bound the [P, T, M]
    intermediate to [P, Tc, M] in VMEM/HBM.
  * The model gate (max translation / rotation vs the relative pose prior)
    mirrors runRansacBetween's max_trans/max_rot_deg gates
    (FeatureManager.cpp:592-615).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_mm = functools.partial(jnp.matmul, precision="highest")

from bundletrack_tpu.geometry.procrustes import rigid_from_three_points, kabsch
from bundletrack_tpu.geometry.se3 import (
    rotation_geodesic_distance,
    se3_inverse,
    transform_points,
    transform_normals,
)


class RansacResult(NamedTuple):
    best_pose: jnp.ndarray  # [..., 4, 4] A->B camera-frame transform
    inliers: jnp.ndarray  # [..., M] bool — matches surviving the best model
    num_inliers: jnp.ndarray  # [...] int32
    valid: jnp.ndarray  # [...] bool — a usable model was found


def _score_model(
    T_ab: jnp.ndarray,  # [T, 4, 4]
    pts_a: jnp.ndarray,  # [M, 3]
    pts_b: jnp.ndarray,
    normals_a: jnp.ndarray,
    normals_b: jnp.ndarray,
    match_valid: jnp.ndarray,  # [M]
    inlier_dist: float,
    cos_normal: float,
) -> jnp.ndarray:
    """[T, M] bool inlier matrix for a chunk of trials."""
    pa = transform_points(T_ab, pts_a[None])  # [T, M, 3]
    na = transform_normals(T_ab, normals_a[None])
    d2 = jnp.sum((pa - pts_b[None]) ** 2, axis=-1)
    cos = jnp.sum(na * normals_b[None], axis=-1)
    return (d2 < inlier_dist * inlier_dist) & (cos > cos_normal) & match_valid[None]


def ransac_pair(
    key: jax.Array,
    pts_a: jnp.ndarray,  # [M, 3] camera-frame points of matched kpts in A
    pts_b: jnp.ndarray,  # [M, 3] matched points in B
    normals_a: jnp.ndarray,
    normals_b: jnp.ndarray,
    match_valid: jnp.ndarray,  # [M] bool
    prior_ab: jnp.ndarray,  # [4, 4] expected A->B transform (pose gate)
    *,
    num_trials: int = 2048,
    inlier_dist: float = 0.01,
    inlier_normal_deg: float = 45.0,
    max_trans: float = 1e9,
    max_rot_deg: float = 1e9,
    min_matches: int = 5,
    trial_chunk: int = 256,
) -> RansacResult:
    """RANSAC over one match set; vmap over pairs for the multi-pair variant."""
    M = pts_a.shape[0]
    num_valid = jnp.sum(match_valid)
    cos_normal = jnp.cos(jnp.deg2rad(inlier_normal_deg))

    # --- sample [T, 3] match indices among valid slots -------------------
    # Sample uniformly over valid matches: draw from [0, num_valid) and map
    # through the sorted-valid index list.
    order = jnp.argsort(~match_valid)  # valid slots first
    raw = jax.random.randint(
        key, (num_trials, 3), 0, jnp.maximum(num_valid, 1), dtype=jnp.int32
    )
    samples = order[raw]  # [T, 3]
    distinct = (
        (samples[:, 0] != samples[:, 1])
        & (samples[:, 0] != samples[:, 2])
        & (samples[:, 1] != samples[:, 2])
    )

    tri_a = pts_a[samples]  # [T, 3, 3]
    tri_b = pts_b[samples]
    T_ab, tri_ok = rigid_from_three_points(tri_a, tri_b)

    # --- model gate vs prior relative pose (reference max_trans/max_rot) --
    rel = _mm(se3_inverse(prior_ab), T_ab)
    trans_ok = jnp.linalg.norm(rel[:, :3, 3], axis=-1) < max_trans
    rot_ok = rotation_geodesic_distance(
        prior_ab[None, :3, :3], T_ab[:, :3, :3]
    ) < jnp.deg2rad(max_rot_deg)
    model_ok = tri_ok & distinct & trans_ok & rot_ok

    # --- score trials in chunks ------------------------------------------
    num_chunks = -(-num_trials // trial_chunk)
    pad = num_chunks * trial_chunk - num_trials
    T_pad = jnp.concatenate(
        [T_ab, jnp.broadcast_to(jnp.eye(4, dtype=T_ab.dtype), (pad, 4, 4))]
    ) if pad else T_ab
    ok_pad = jnp.concatenate([model_ok, jnp.zeros((pad,), bool)]) if pad else model_ok
    T_chunks = T_pad.reshape(num_chunks, trial_chunk, 4, 4)
    ok_chunks = ok_pad.reshape(num_chunks, trial_chunk)

    def count_chunk(args):
        Tc, okc = args
        inl = _score_model(
            Tc, pts_a, pts_b, normals_a, normals_b, match_valid, inlier_dist, cos_normal
        )
        return jnp.sum(inl, axis=-1) * okc.astype(jnp.int32)

    counts = jax.lax.map(count_chunk, (T_chunks, ok_chunks)).reshape(-1)[:num_trials]

    best = jnp.argmax(counts)
    best_pose = T_ab[best]
    best_inl = _score_model(
        best_pose[None],
        pts_a,
        pts_b,
        normals_a,
        normals_b,
        match_valid,
        inlier_dist,
        cos_normal,
    )[0]
    n_inl = jnp.sum(best_inl)
    valid = (counts[best] >= min_matches) & (num_valid >= min_matches)
    best_inl = best_inl & valid
    return RansacResult(
        best_pose=best_pose,
        inliers=best_inl,
        num_inliers=jnp.where(valid, n_inl, 0),
        valid=valid,
    )


def ransac_multi_pair(
    key: jax.Array,
    pts_a: jnp.ndarray,  # [P, M, 3]
    pts_b: jnp.ndarray,
    normals_a: jnp.ndarray,
    normals_b: jnp.ndarray,
    match_valid: jnp.ndarray,  # [P, M]
    prior_ab: jnp.ndarray,  # [P, 4, 4]
    **kw,
) -> RansacResult:
    """Batched RANSAC across P frame pairs (reference runRansacMultiPairGPU).

    The reference launched one CUDA stream per pair; here the pair axis is
    just a vmap dimension of one fused XLA program.
    """
    P = pts_a.shape[0]
    keys = jax.random.split(key, P)
    return jax.vmap(
        lambda k, pa, pb, na, nb, mv, pr: ransac_pair(
            k, pa, pb, na, nb, mv, pr, **kw
        )
    )(keys, pts_a, pts_b, normals_a, normals_b, match_valid, prior_ab)


def refine_pose_on_inliers(
    pts_a: jnp.ndarray, pts_b: jnp.ndarray, inliers: jnp.ndarray
) -> jnp.ndarray:
    """Weighted Kabsch refit on the inlier set (reference
    procrustesByCorrespondence -> solveRigidTransformBetweenPoints,
    src/FeatureManager.cpp:523-557, Utils.cpp:180-218)."""
    return kabsch(pts_a, pts_b, inliers.astype(pts_a.dtype))
