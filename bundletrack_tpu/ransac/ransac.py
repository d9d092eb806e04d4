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
    """[T, M] bool inlier matrix for a chunk of trials (direct evaluation,
    used only for the winning trial's final inlier mask)."""
    pa = transform_points(T_ab, pts_a[None])  # [T, M, 3]
    na = transform_normals(T_ab, normals_a[None])
    d2 = jnp.sum((pa - pts_b[None]) ** 2, axis=-1)
    cos = jnp.sum(na * normals_b[None], axis=-1)
    return (d2 < inlier_dist * inlier_dist) & (cos > cos_normal) & match_valid[None]


def _match_features(pts_a, pts_b, normals_a, normals_b):
    """Per-match feature table G [M, 26] for bilinear trial scoring.

    With R orthonormal, ||R pa + t - pb||^2 expands to a dot product between
    a trial feature (built from R, t) and a match feature:
      d2 = (2 R^T t)·pa - 2 t·pb - 2 <R, pb pa^T> + (|pa|^2+|pb|^2) + |t|^2
    and the normal test (R na)·nb = <R, nb na^T>.  Scoring T trials against
    M matches then becomes ONE [T, 26] x [26, M] matmul on the MXU instead of
    materializing [T, M, 3] transformed points (the reference evaluates each
    (trial, point) on a CUDA thread, ransacEvalModelKernel:1183-1200).
    """
    M = pts_a.shape[0]
    outer_pb_pa = (pts_b[:, :, None] * pts_a[:, None, :]).reshape(M, 9)
    outer_nb_na = (normals_b[:, :, None] * normals_a[:, None, :]).reshape(M, 9)
    sq = jnp.sum(pts_a * pts_a, -1) + jnp.sum(pts_b * pts_b, -1)
    ones = jnp.ones((M,), pts_a.dtype)
    return jnp.concatenate(
        [pts_a, pts_b, outer_pb_pa, sq[:, None], ones[:, None], outer_nb_na],
        axis=-1,
    )  # [M, 26]


def _trial_features(T_ab):
    """Per-trial feature table F [T, 26] matching _match_features."""
    T = T_ab.shape[0]
    R = T_ab[:, :3, :3]
    t = T_ab[:, :3, 3]
    f_pa = 2.0 * jnp.einsum("tij,ti->tj", R, t)  # (2 R^T t)·pa
    f_pb = -2.0 * t
    f_outer = -2.0 * R.reshape(T, 9)
    f_sq = jnp.ones((T, 1), T_ab.dtype)
    f_one = jnp.sum(t * t, -1, keepdims=True)
    f_cos = R.reshape(T, 9)
    return jnp.concatenate([f_pa, f_pb, f_outer, f_sq, f_one, f_cos], axis=-1)


def _count_inliers_bilinear(
    T_ab, G, match_valid, inlier_dist, cos_normal
) -> jnp.ndarray:
    """[T] inlier counts via the bilinear MXU formulation.

    f32 ("highest") matmuls: the d2 expansion cancels |pa|^2+|pb|^2 (~1 m^2)
    against the cross terms down to the 1e-4 m^2 threshold scale — bf16
    accumulation would swamp it, f32 keeps ~2e-7 absolute error.
    """
    F = _trial_features(T_ab)  # [T, 26]
    dot = lambda a, b: jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    d2 = dot(F[:, :17], G[:, :17])  # [T, M]
    cos = dot(F[:, 17:], G[:, 17:])
    inl = (d2 < inlier_dist * inlier_dist) & (cos > cos_normal) & match_valid[None]
    return jnp.sum(inl, axis=-1)


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

    # --- score all trials: one bilinear MXU contraction --------------------
    G = _match_features(pts_a, pts_b, normals_a, normals_b)  # [M, 26]
    counts = _count_inliers_bilinear(
        T_ab, G, match_valid, inlier_dist, cos_normal
    ) * model_ok.astype(jnp.int32)

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
