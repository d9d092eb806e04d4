"""Huber-robust Gauss-Newton over the keyframe pose graph.

TPU-native rewrite of the reference solver loop
(reference: src/cuda/Solver/SolverBundling.cu solveBundlingStub:931-1003 —
7 outer GN iterations x {Lie->matrix conversion, BuildDenseSystem, PCG init,
5 PCG iterations, Lie update}; orchestration CUDASolverBundling::solve,
src/cuda/Solver/CUDASolverBundling.cpp:190-280; facade OptimizerGpu::
optimizeFrames, src/cuda/LossGPU.cu:53-139).

Design: at the reference's scale (<=16 frames, 96 DoF) the normal equations
are a 96x96 system — tiny for the MXU.  The primary backend therefore forms
the *dense* blocked H and solves by Cholesky with Levenberg damping; a
matrix-free PCG backend (solver/pcg.py) covers larger graphs and mirrors the
reference's preconditioned-CG inner loop.  The whole outer loop is a
lax.fori_loop inside one jit program — no host round-trips between
iterations (the reference synchronizes the GPU each solve).

Gauge fixing: frames with free_mask=False keep their pose; their blocks are
replaced by identity rows (the reference fixes variable 0 the same way).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from bundletrack_tpu.geometry.se3 import se3_update_left
from bundletrack_tpu.solver.dense_p2p import (
    CompactDense,
    DenseFrames,
    compact_dense_frames,
    dense_p2p_from_compact,
)
from bundletrack_tpu.solver.residuals import SparseCorres, sparse_normal_equations
from bundletrack_tpu.solver.pcg import solve_normal_equations_pcg


class GraphInputs(NamedTuple):
    """Everything the optimizer needs for one BA solve."""

    poses: jnp.ndarray  # [K, 4, 4] cam->model initial estimates
    frame_valid: jnp.ndarray  # [K] bool
    free_mask: jnp.ndarray  # [K] bool — False = gauge-fixed
    corres: SparseCorres
    dense: Optional[DenseFrames] = None
    K_lowres: Optional[jnp.ndarray] = None
    # pre-compacted dense-term tables (built once per frame at keyframe
    # admission, CUDACache::storeFrame-style); when set, `dense` is ignored
    # and the per-solve compaction is skipped entirely
    dense_compact: Optional[CompactDense] = None


def _apply_gauge(H, g, free):
    """Zero rows/cols of fixed frames and put identity on their diagonal."""
    K = H.shape[0]
    f = free.astype(H.dtype)
    H = H * f[:, None, None, None] * f[None, :, None, None]
    eye6 = jnp.eye(6, dtype=H.dtype)
    diag_fix = (1.0 - f)[:, None, None] * eye6
    H = H.at[jnp.arange(K), jnp.arange(K)].add(diag_fix)
    g = g * f[:, None]
    return H, g


def solve_normal_equations_cholesky(H, g, lm_lambda: float):
    """Solve (H + lambda I) delta = -g for blocked H [K,K,6,6], g [K,6]."""
    K = H.shape[0]
    n = K * 6
    Hd = jnp.transpose(H, (0, 2, 1, 3)).reshape(n, n)
    # Jacobi equilibration for f32 stability (reference leans on doubles only
    # inside Huber; scaling keeps the 96x96 Cholesky well-conditioned), then
    # Levenberg damping on the *scaled* system — equivalent to
    # H + lambda*diag(H), which also regularizes rank-deficient graphs
    # (e.g. dense-only single-plane geometry) instead of producing NaNs.
    d = jnp.sqrt(jnp.clip(jnp.diagonal(Hd), 1e-10, None))
    Hs = Hd / d[:, None] / d[None, :]
    lam = jnp.maximum(lm_lambda, 1e-6)
    Hs = Hs + lam * jnp.eye(n, dtype=H.dtype)
    rhs = -g.reshape(n) / d
    L, low = jax.scipy.linalg.cho_factor(Hs, lower=True)
    delta = jax.scipy.linalg.cho_solve((L, low), rhs) / d
    # A failed factorization (non-SPD from masking pathologies) must not
    # poison the pose state: fall back to a zero step.
    delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
    return delta.reshape(K, 6)


def build_normal_equations(
    inputs: GraphInputs,
    cfg,
    dense_compact: Optional[CompactDense] = None,
    axis_name: Optional[str] = None,
    p2p=None,
):
    """Assemble H/g from sparse + dense terms (one GN linearization).

    `dense_compact` should be built once per solve with compact_dense_frames
    (the compaction + gather-table packing is pose-independent); when omitted
    it is built here.

    `p2p`: P2PConfig with the dense-association gates (max_dist,
    max_normal_angle, min_pair_pixels) the reference reads from YAML into the
    solver (src/cuda/Solver/CUDASolverBundling.cpp:93-99); None keeps the
    reference defaults.

    `axis_name`: when running inside shard_map with the correspondence PAIR
    axis sharded across devices (SURVEY §2.6's within-stream scale axis; the
    reference's analog is one CUDA stream per pair, cuda_ransac.cu:1267-1284),
    each device contributes its local pairs' blocks and the full H/g/cost are
    psum-reduced over `axis_name` here — one [K,K,6,6]+[K,6] all-reduce per
    GN iteration riding ICI.
    """
    H, g, cost, _ = sparse_normal_equations(
        inputs.poses,
        inputs.corres,
        robust_delta=cfg.robust_delta,
        weight=cfg.w_sparse,
    )
    if dense_compact is None:
        dense_compact = inputs.dense_compact
    use_dense = (
        dense_compact is not None or inputs.dense is not None
    ) and (cfg.w_dense_depth > 0.0 or cfg.w_dense_color > 0.0)
    if use_dense:
        if dense_compact is None:
            dense_compact = compact_dense_frames(
                inputs.dense,
                capacity=cfg.dense_src_capacity,
                with_color=cfg.w_dense_color > 0.0,
            )
        p2p_kw = {}
        if p2p is not None:
            p2p_kw = dict(
                max_dist=p2p.max_dist,
                max_normal_deg=p2p.max_normal_angle,
                min_pair_pixels=p2p.min_pair_pixels,
            )
        Hd, gd, cd, _ = dense_p2p_from_compact(
            inputs.poses,
            dense_compact,
            inputs.frame_valid,
            inputs.corres.pair_i,
            inputs.corres.pair_j,
            inputs.K_lowres,
            robust_delta=cfg.robust_delta,
            weight=cfg.w_dense_depth,
            weight_color=cfg.w_dense_color,
            **p2p_kw,
        )
        H = H + Hd
        g = g + gd
        cost = cost + cd
    if axis_name is not None:
        H = jax.lax.psum(H, axis_name)
        g = jax.lax.psum(g, axis_name)
        cost = jax.lax.psum(cost, axis_name)
    return H, g, cost


def optimize_pose_graph(
    inputs: GraphInputs, cfg, p2p=None, axis_name: Optional[str] = None
):
    """Run the full robust-GN outer loop; returns (poses [K,4,4], info dict).

    cfg: BundleConfig (num_iter_outer, num_iter_inner, robust_delta,
    lm_lambda, solver_backend, w_sparse/w_dense_depth).

    p2p: P2PConfig dense-association gates (reference p2p.* YAML keys,
    src/cuda/Solver/CUDASolverBundling.cpp:93-99); None = reference defaults.

    axis_name: pair-axis sharding inside shard_map — see
    build_normal_equations.  After the psum every device holds identical H/g
    and runs the same (tiny, 96x96) solve replicated, so the outer loop's
    control flow stays in lockstep across devices.
    """

    use_dense = (
        inputs.dense_compact is not None or inputs.dense is not None
    ) and (cfg.w_dense_depth > 0.0 or cfg.w_dense_color > 0.0)
    if not use_dense:
        dense_compact = None
    elif inputs.dense_compact is not None:
        dense_compact = inputs.dense_compact
    else:
        dense_compact = compact_dense_frames(
            inputs.dense,
            capacity=cfg.dense_src_capacity,
            with_color=cfg.w_dense_color > 0.0,
        )

    def gn_step(poses):
        cur = inputs._replace(poses=poses)
        H, g, cost = build_normal_equations(cur, cfg, dense_compact, axis_name, p2p)
        free = inputs.free_mask & inputs.frame_valid
        H, g = _apply_gauge(H, g, free)
        if cfg.solver_backend == "pcg":
            delta = solve_normal_equations_pcg(
                H, g, num_iters=cfg.num_iter_inner, lm_lambda=cfg.lm_lambda
            )
        else:
            delta = solve_normal_equations_cholesky(H, g, cfg.lm_lambda)
        delta = delta * free.astype(delta.dtype)[:, None]
        # trust-region style clamp: reject absurd steps (keeps f32 sane)
        step_norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
        max_step = 1.0
        delta = jnp.where(step_norm > max_step, delta * (max_step / step_norm), delta)
        new_poses = se3_update_left(delta, poses)
        new_poses = jnp.where(
            inputs.frame_valid[:, None, None], new_poses, poses
        )
        return new_poses, cost, jnp.max(jnp.abs(delta))

    zero = jnp.asarray(0.0, jnp.float32)
    if cfg.early_stop_delta > 0.0:
        # early-out once the max delta component over free frames converges
        # (reference ENABLE_EARLY_OUT + EvalGNConvergence < 0.005,
        # SolverBundling.cu:996-999, 518-572); a while_loop instead of the
        # reference's host-side break — no device->host sync per iteration

        def w_cond(carry):
            it, _, _, max_delta = carry
            return (it < cfg.num_iter_outer) & (max_delta >= cfg.early_stop_delta)

        def w_body(carry):
            it, poses, _, _ = carry
            new_poses, cost, max_delta = gn_step(poses)
            return it + 1, new_poses, cost, max_delta

        _, poses, cost, _ = jax.lax.while_loop(
            w_cond, w_body, (jnp.asarray(0, jnp.int32), inputs.poses, zero, jnp.inf)
        )
    else:
        def outer(it, carry):
            poses, _ = carry
            new_poses, cost, _ = gn_step(poses)
            return new_poses, cost

        poses, cost = jax.lax.fori_loop(
            0, cfg.num_iter_outer, outer, (inputs.poses, zero)
        )
    info = {"final_cost": cost}
    info.update(verify_solution(poses, inputs, cfg, axis_name))
    return poses, info


def optimize_pose_graph_verified(
    inputs: GraphInputs, cfg, p2p=None, axis_name: Optional[str] = None
):
    """optimize_pose_graph + the useVerification reject path.

    When cfg.use_verification and the post-solve fraction of high-residual
    correspondences reaches cfg.verify_percent_thresh, the solve is rejected:
    the input poses are returned unchanged and `rejected` is True (reference
    CUDASolverBundling::useVerification, CUDASolverBundling.cpp:396-417).
    Returns (poses, rejected, info).
    """
    poses, info = optimize_pose_graph(inputs, cfg, p2p=p2p, axis_name=axis_name)
    rejected = jnp.asarray(False)
    if cfg.use_verification:
        rejected = info["high_residual_frac"] >= cfg.verify_percent_thresh
        poses = jnp.where(rejected, inputs.poses, poses)
    return poses, rejected, info


def verify_solution(poses, inputs: GraphInputs, cfg, axis_name=None):
    """Post-solve residual analysis (reference CUDASolverBundling
    computeMaxResidual:303-375 and useVerification high-residual percentage
    check:396-417).  A correspondence is "high" when w_sparse * the max-abs
    residual component exceeds verify_dist_thresh (evalAbsMaxResidualDevice,
    SolverBundlingEquationsLie.h:26-39); the tracker rejects the solve when
    the high fraction reaches verify_percent_thresh (see bundler.py).

    axis_name: with pairs sharded, counts psum and the max pmax-es so every
    device reports the same global statistics."""
    from bundletrack_tpu.solver.residuals import sparse_residuals

    r, _, _ = sparse_residuals(poses, inputs.corres)
    e = jnp.linalg.norm(r, axis=-1)
    e_inf = jnp.max(jnp.abs(r), axis=-1) * cfg.w_sparse
    valid = inputs.corres.valid
    n = jnp.sum(valid)
    n_high = jnp.sum((e_inf > cfg.verify_dist_thresh) & valid)
    max_res = jnp.max(jnp.where(valid, e, 0.0))
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
        n_high = jax.lax.psum(n_high, axis_name)
        max_res = jax.lax.pmax(max_res, axis_name)
    high = n_high / jnp.maximum(n, 1)
    return {"max_residual": max_res, "high_residual_frac": high}
