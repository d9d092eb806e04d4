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
    race; here determinism is exact).  Trials come from a permute+roll
    combinatorial design with per-repeat random phases (see ransac_pair) so
    the [T, 3] sample gather — the measured hot spot — disappears entirely.
  * Trial scoring is ONE [T, 26] x [26, M] MXU matmul (no [T, M, 3]
    intermediate); num_trials is rounded up to T_eff = ceil(T / M) * M.
  * The model gate (max translation / rotation vs the relative pose prior)
    mirrors runRansacBetween's max_trans/max_rot_deg gates
    (FeatureManager.cpp:592-615).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_mm = functools.partial(jnp.matmul, precision="highest")

from bundletrack_tpu.geometry.procrustes import rigid_from_three_points, kabsch
from bundletrack_tpu.ops.prefix import prefix_sum_last
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


# ---------------------------------------------------------------------------
# Structure-of-arrays trial pipeline.
#
# Per-trial quantities live as separate [T]-shaped component arrays (lane
# dimension = trials) instead of [T, 3]/[T, 3, 3]/[T, 4, 4] tensors whose
# 3- and 4-wide trailing dims waste ~97% of the 128 VPU lanes.  The whole
# fit + gate + trial-feature chain is elementwise over [T], so under the
# pair vmap it runs as dense [P, T] vector ops.
# ---------------------------------------------------------------------------


def _soa_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _soa_sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _soa_cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _soa_normalize(a, eps=1e-12):
    inv = jax.lax.rsqrt(jnp.maximum(_soa_dot(a, a), eps))
    return (a[0] * inv, a[1] * inv, a[2] * inv), _soa_dot(a, a)


def _soa_frame(p0, p1, p2):
    """Orthonormal frame rows (n1, n2, n3) + squared triangle area x4."""
    e1 = _soa_sub(p1, p0)
    e2 = _soa_sub(p2, p0)
    n1, _ = _soa_normalize(e1)
    proj = _soa_dot(e2, n1)
    e2p = (e2[0] - proj * n1[0], e2[1] - proj * n1[1], e2[2] - proj * n1[2])
    n2, _ = _soa_normalize(e2p)
    n3 = _soa_cross(n1, n2)
    area_sq = _soa_dot(_soa_cross(e1, e2), _soa_cross(e1, e2))
    return (n1, n2, n3), area_sq


def _soa_fit_trials(tri_a, tri_b):
    """Closed-form rigid fit over 3-point samples, SoA form.

    tri_a/tri_b: [T, 3, 8] gathered rows (xyz in channels 0:3 / 3:6).
    Returns (R: tuple of 9 [T] arrays row-major, t: tuple of 3, ok [T]).
    Math identical to geometry.procrustes.rigid_from_three_points.
    """
    pa = [tuple(tri_a[:, k, c] for c in range(3)) for k in range(3)]
    pb = [tuple(tri_b[:, k, c] for c in range(3)) for k in range(3)]
    Fa, area_a = _soa_frame(*pa)
    Fb, area_b = _soa_frame(*pb)
    # R = Fb^T @ Fa: R[i][j] = sum_k Fb[k][i] * Fa[k][j]
    R = tuple(
        Fb[0][i] * Fa[0][j] + Fb[1][i] * Fa[1][j] + Fb[2][i] * Fa[2][j]
        for i in range(3)
        for j in range(3)
    )
    third = 1.0 / 3.0
    ca = tuple((pa[0][c] + pa[1][c] + pa[2][c]) * third for c in range(3))
    cb = tuple((pb[0][c] + pb[1][c] + pb[2][c]) * third for c in range(3))
    t = tuple(
        cb[i] - (R[3 * i + 0] * ca[0] + R[3 * i + 1] * ca[1] + R[3 * i + 2] * ca[2])
        for i in range(3)
    )
    ok = (area_a > 1e-20) & (area_b > 1e-20)
    return R, t, ok


def _soa_pose_gate(R, t, prior_ab, max_trans, max_rot_deg):
    """Translation/rotation gate vs the prior, on SoA components.

    |trans(prior^-1 T)| = |t - t_prior| (rotations preserve norms), and the
    geodesic angle of R_prior^T R comes from its trace.
    """
    Rp = prior_ab[:3, :3]
    tp = prior_ab[:3, 3]
    dt = (t[0] - tp[0], t[1] - tp[1], t[2] - tp[2])
    trans_ok = _soa_dot(dt, dt) < max_trans * max_trans
    trace = sum(Rp[i, j] * R[3 * i + j] for i in range(3) for j in range(3))
    cos_lim = jnp.cos(jnp.deg2rad(jnp.minimum(max_rot_deg, 179.9)))
    rot_ok = (trace - 1.0) * 0.5 > cos_lim
    return trans_ok & rot_ok


def _soa_trial_features(R, t):
    """F [26, T] matching _match_features' column order, from SoA R/t."""
    rt = tuple(  # R^T t, component j
        R[0 + j] * t[0] + R[3 + j] * t[1] + R[6 + j] * t[2] for j in range(3)
    )
    tt = t[0] * t[0] + t[1] * t[1] + t[2] * t[2]
    ones = jnp.ones_like(t[0])
    cols = (
        [2.0 * rt[j] for j in range(3)]  # · pa
        + [-2.0 * t[i] for i in range(3)]  # · pb
        + [-2.0 * R[k] for k in range(9)]  # · (pb pa^T)
        + [ones, tt]  # · (|pa|^2+|pb|^2), · 1
        + [R[k] for k in range(9)]  # · (nb na^T)
    )
    return jnp.stack(cols, axis=0)  # [26, T]


def _soa_count_inliers(F, G, match_valid, inlier_dist, cos_normal):
    """[T] inlier counts: G [M, 26] x F [26, T] on the MXU (f32)."""
    dot = lambda a, b: jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    d2 = dot(G[:, :17], F[:17])  # [M, T]
    cos = dot(G[:, 17:], F[17:])
    inl = (
        (d2 < inlier_dist * inlier_dist)
        & (cos > cos_normal)
        & match_valid[:, None]
    )
    return jnp.sum(inl, axis=0)


def _soa_best_pose(R, t, best):
    """Assemble the winning trial's [4, 4] matrix from SoA components."""
    rows = jnp.stack(
        [
            jnp.stack([R[0][best], R[1][best], R[2][best], t[0][best]]),
            jnp.stack([R[3][best], R[4][best], R[5][best], t[1][best]]),
            jnp.stack([R[6][best], R[7][best], R[8][best], t[2][best]]),
            jnp.stack(
                [
                    jnp.zeros_like(t[0][best]),
                    jnp.zeros_like(t[0][best]),
                    jnp.zeros_like(t[0][best]),
                    jnp.ones_like(t[0][best]),
                ]
            ),
        ]
    )
    return rows


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
) -> RansacResult:
    """RANSAC over one match set; vmap over pairs for the multi-pair variant."""
    M = pts_a.shape[0]
    num_valid = jnp.sum(match_valid)
    cos_normal = jnp.cos(jnp.deg2rad(inlier_normal_deg))

    # --- trial triangles without per-trial gathers -------------------------
    # The obvious scheme (randint [T, 3] -> gather 3T rows) costs ~6000
    # dynamic row-gathers per pair per call and was the measured hot spot of
    # the whole tracking step at P=120, T=2000.  Instead, trials come from a
    # combinatorial design that needs only THREE M-row gathers total:
    #
    #   vertex tables  tbl_k[j] = packed[fill[pi_k[j mod M]]]
    #   trial (r, j)   = (tbl_1[j + b_1r], tbl_2[j + b_2r], tbl_3[j + b_3r])
    #
    # where pi_k are fixed shuffles (baked numpy constants), b_kr are
    # per-repeat random phases ([3, n_rep] ints — the only PRNG draw), and
    # fill cycles the valid-first order list to all M slots — so the
    # [T, 3, 8] trial tensor materializes as cyclic rolls of three gathered
    # tables (no per-trial dynamic indexing).  Each repeat is an independent
    # random shift of the design, so repeated calls / many repeats explore
    # different triple families (a fixed-offset variant shared one family
    # across all calls and degraded at low inlier ratios — see
    # tests/test_ransac.py::test_low_inlier_ratio).  Marginals stay uniform
    # over valid matches; triples are distinct up to fill-duplication, which
    # the `distinct` flag (match id carried in channel 6) rejects exactly
    # like collision rejection in iid sampling.  The reference draws iid
    # triples with curand per CUDA thread (cuda_ransac.cu:1145-1181); RANSAC
    # only needs uniform coverage, not iid-ness, so the design trade is free.
    iota_m = jnp.arange(M, dtype=jnp.int32)
    cnt = prefix_sum_last(match_valid)  # MXU; cumsum is a TPU hot spot
    pos = jnp.where(match_valid, cnt - 1, num_valid + (iota_m - cnt))
    order = jnp.zeros((M,), jnp.int32).at[pos].set(iota_m, mode="drop")
    fill = jnp.take(order, jnp.remainder(iota_m, jnp.maximum(num_valid, 1)))

    n_rep = -(-num_trials // M)  # ceil; T_eff = n_rep * M >= num_trials
    pis = [
        np.random.RandomState(1000 + k).permutation(M).astype(np.int32)
        for k in range(3)
    ]
    b = jax.random.randint(key, (3, n_rep), 0, M, dtype=jnp.int32)

    packed = jnp.concatenate(
        [
            pts_a,
            pts_b,
            iota_m[:, None].astype(pts_a.dtype),  # match id for distinctness
            jnp.zeros((M, 1), pts_a.dtype),
        ],
        axis=-1,
    )  # [M, 8]
    tbl = [
        jnp.take(packed, jnp.take(fill, jnp.asarray(pis[k])), axis=0)
        for k in range(3)
    ]  # 3 x [M, 8]
    # rolling tbl_k by -b equals shifting pi_k's argument by b, so each
    # repeat is an independently phased pass over the design
    tri1, tri2, tri3 = (
        jnp.concatenate(
            [jnp.roll(tbl[k], -b[k, r], axis=0) for r in range(n_rep)], axis=0
        )
        for k in range(3)
    )
    g = jnp.stack([tri1, tri2, tri3], axis=1)  # [T_eff, 3, 8]
    ids = g[..., 6]
    distinct = (
        (ids[:, 0] != ids[:, 1]) & (ids[:, 0] != ids[:, 2]) & (ids[:, 1] != ids[:, 2])
    )

    # --- fit + gate + score, all in SoA [T]-component form -----------------
    R, t, tri_ok = _soa_fit_trials(g[..., 0:3], g[..., 3:6])
    gate_ok = _soa_pose_gate(R, t, prior_ab, max_trans, max_rot_deg)
    model_ok = tri_ok & distinct & gate_ok

    G = _match_features(pts_a, pts_b, normals_a, normals_b)  # [M, 26]
    F = _soa_trial_features(R, t)  # [26, T]
    counts = _soa_count_inliers(
        F, G, match_valid, inlier_dist, cos_normal
    ) * model_ok.astype(jnp.int32)

    best = jnp.argmax(counts)
    best_pose = _soa_best_pose(R, t, best)
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
