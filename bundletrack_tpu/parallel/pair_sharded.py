"""Within-stream multi-chip parallelism: the BA inner loop sharded by PAIR.

SURVEY §2.6 names three scale axes for the new framework; this module covers
the second — keyframe PAIRS inside matching / RANSAC / normal-equation build.
The reference's analog is one CUDA stream per pair (reference:
src/cuda/cuda_ransac.cu:1267-1284 per-pair streams;
src/FeatureManager.cpp:385-414 async multi-pair matching) — single-GPU
concurrency.  Here the pair axis is sharded over a device mesh with
`shard_map`: each chip matches + RANSACs + linearizes its P/n pairs, the
[K,K,6,6] JᵀJ and [K,6] Jᵀr blocks psum over ICI once per GN iteration
(solver/gauss_newton.build_normal_equations axis_name), and the tiny 96×96
solve runs replicated so the outer loop stays in lockstep.

This is the axis that improves single-stream LATENCY with chip count
(stream-parallelism only improves throughput): matching + RANSAC + the
dense-term association dominate the per-solve cost and divide by n, while
the all-reduced blocks are ~147 KB — negligible on ICI.

Inputs are a BA frame table (replicated) + the static pair enumeration
(sharded).  P must divide by the mesh axis size; the canonical K=16 graph
has P=120 pairs = 8 × 15.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bundletrack_tpu.matching.pairwise import match_pairs_batched
from bundletrack_tpu.ransac.ransac import ransac_pair
from bundletrack_tpu.geometry.se3 import se3_compose, se3_inverse
from bundletrack_tpu.solver.dense_p2p import CompactDense
from bundletrack_tpu.solver.gauss_newton import GraphInputs, optimize_pose_graph
from bundletrack_tpu.solver.residuals import SparseCorres


class BAFrameTable(NamedTuple):
    """Replicated per-frame state of the BA subset (K frames)."""

    desc: jnp.ndarray  # [K, N, D]
    pts: jnp.ndarray  # [K, N, 3]
    normals: jnp.ndarray  # [K, N, 3]
    kp_valid: jnp.ndarray  # [K, N]
    poses: jnp.ndarray  # [K, 4, 4]
    frame_valid: jnp.ndarray  # [K]
    free_mask: jnp.ndarray  # [K]


def _gather_match_points(pts, normals, pair_i, pair_j, mr):
    take = lambda arr, pair, idx: jnp.take_along_axis(
        jnp.take(arr, pair, axis=0), idx[..., None], axis=1
    )
    return (
        take(pts, pair_i, mr.idx_a),
        take(pts, pair_j, mr.idx_b),
        take(normals, pair_i, mr.idx_a),
        take(normals, pair_j, mr.idx_b),
    )


def _ba_local(
    table: BAFrameTable,
    dense_compact: Optional[CompactDense],
    K_lowres,
    pair_i,
    pair_j,
    pair_valid,
    ransac_keys,  # [P_local, 2] pre-split so shards reproduce the 1-dev streams
    cfg,
    axis_name: Optional[str],
):
    """Match -> RANSAC -> linearize the LOCAL pair shard, solve globally."""
    fc, rc = cfg.feature_corres, cfg.ransac
    M = cfg.shapes.max_matches
    bm = match_pairs_batched(
        table.desc, table.pts, table.normals, table.kp_valid, table.poses,
        pair_i, pair_j, pair_valid,
        max_dist=fc.max_dist_no_neighbor,
        max_normal_deg=fc.max_normal_no_neighbor,
        max_matches=M,
        backend=fc.backend,
    )
    mpa, mpb, mna, mnb = _gather_match_points(
        table.pts, table.normals, pair_i, pair_j, bm
    )
    prior = se3_compose(se3_inverse(table.poses[pair_j]), table.poses[pair_i])
    mr = jax.vmap(
        lambda k, pa, pb, na, nb, mv, pr: ransac_pair(
            k, pa, pb, na, nb, mv, pr,
            num_trials=rc.max_iter,
            inlier_dist=rc.inlier_dist,
            inlier_normal_deg=rc.inlier_normal_angle,
            max_trans=rc.max_trans_no_neighbor,
            max_rot_deg=rc.max_rot_no_neighbor,
            min_matches=rc.min_match_after_ransac,
        )
    )(ransac_keys, mpa, mpb, mna, mnb, bm.valid, prior)
    corres = SparseCorres(
        pair_i=pair_i, pair_j=pair_j,
        pts_i=mpa, pts_j=mpb, valid=bm.valid & mr.inliers,
    )
    inputs = GraphInputs(
        poses=table.poses,
        frame_valid=table.frame_valid,
        free_mask=table.free_mask,
        corres=corres,
        dense_compact=dense_compact,
        K_lowres=K_lowres,
    )
    poses, info = optimize_pose_graph(
        inputs, cfg.bundle, p2p=cfg.p2p, axis_name=axis_name
    )
    return poses, info["final_cost"], info["high_residual_frac"]


def make_pair_sharded_ba(cfg, mesh: Mesh, axis: str = "pairs"):
    """Build the pair-sharded BA step over `mesh[axis]`.

    Returns step(table, dense_compact, K_lowres, pair_i, pair_j, pair_valid,
    key) -> (poses [K,4,4], cost, high_frac), with pair arrays sharded over
    `axis` and everything else replicated.  The per-pair RANSAC PRNG streams
    are split from `key` BEFORE sharding, so the result matches the
    single-device ransac_multi_pair exactly.
    """
    n = mesh.shape[axis]

    pair_spec = P(axis)
    rep = P()
    fn = functools.partial(_ba_local, cfg=cfg, axis_name=axis)
    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, pair_spec, pair_spec, pair_spec, pair_spec),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )

    def step(table, dense_compact, K_lowres, pair_i, pair_j, pair_valid, key):
        Pn = pair_i.shape[0]
        if Pn % n:
            raise ValueError(f"P={Pn} pairs must divide mesh axis {axis}={n}")
        keys = jax.random.split(key, Pn)  # identical to ransac_multi_pair
        return sharded(
            table, dense_compact, K_lowres, pair_i, pair_j, pair_valid, keys
        )

    return step
