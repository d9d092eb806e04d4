"""Dense point-to-plane term with projective association, batched over pairs.

TPU-native rewrite of the reference's dense depth term
(reference: src/cuda/Solver/SolverBundling.cu — FindDenseCorrespondences_Kernel
:60-113 projective association with depth/normal gates,
WeightDenseCorrespondences_Kernel:115-127 pair weights 1/min(log n, 9) with an
800-px floor, BuildDenseSystem_Kernel:129-229 point-to-plane residual
dot(camPosTgt - camPosSrcToTgt, normalTgt) with Huber; association helpers in
SolverBundlingDenseUtil.h findDenseCorr:14-215, block scatter
addToLocalSystem:217-285; low-res frame cache CUDACache.cpp:76-88).

Design: per pair (i, j) the source low-res point map is transformed into the
target camera, projected, and gathers target point/normal at the nearest
pixel — one vmapped gather program per pair instead of a SIMT kernel with
warp-reduced atomics; the [Npix, 6] Jacobian rows contract to 6x6 blocks on
the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundletrack_tpu.geometry.robust import huber
from bundletrack_tpu.geometry.se3 import se3_inverse, transform_points, transform_normals
from bundletrack_tpu.solver.residuals import scatter_blocks

_einsum = functools.partial(jnp.einsum, precision="highest")


class DenseFrames(NamedTuple):
    """Low-res per-frame geometry cache (reference CUDACachedFrame,
    src/cuda/CUDACacheUtil.h:10-53).

    points:  [K, H, W, 3] camera-space
    normals: [K, H, W, 3]
    valid:   [K, H, W] bool
    """

    points: jnp.ndarray
    normals: jnp.ndarray
    valid: jnp.ndarray


def _associate_pair(
    T_i, T_j, pts_i, val_i, pts_j, nrm_j, val_j, K_mat, max_dist, cos_max
):
    """Projective association for one (src=i, tgt=j) pair.

    Returns (r [N], n_model [N, 3], q_src [N, 3], q_tgt [N, 3], ok [N]) with
    N = H*W, where q are model-frame points and r = dot(q_tgt - q_src, n).
    """
    H, W = pts_i.shape[0], pts_i.shape[1]
    T_j_inv = se3_inverse(T_j)
    T_rel = T_j_inv @ T_i  # cam_i -> cam_j

    p_src = pts_i.reshape(-1, 3)  # [N, 3] cam_i
    p_in_j = transform_points(T_rel, p_src)  # [N, 3] cam_j
    fx, fy = K_mat[0, 0], K_mat[1, 1]
    cx, cy = K_mat[0, 2], K_mat[1, 2]
    z = p_in_j[:, 2]
    safe_z = jnp.where(z > 1e-6, z, 1.0)
    u = p_in_j[:, 0] / safe_z * fx + cx
    v = p_in_j[:, 1] / safe_z * fy + cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H) & (z > 1e-6)
    uc = jnp.clip(ui, 0, W - 1)
    vc = jnp.clip(vi, 0, H - 1)
    p_tgt = pts_j[vc, uc]  # [N, 3] cam_j
    n_tgt = nrm_j[vc, uc]
    tgt_ok = val_j[vc, uc]
    src_ok = val_i.reshape(-1)

    # gates in cam_j space (reference findDenseCorr depth/normal gates)
    d2 = jnp.sum((p_tgt - p_in_j) ** 2, axis=-1)
    # source normal in cam_j for the angle gate is approximated by comparing
    # target normal to the ray-consistency of the transformed source point;
    # the reference compares transformed src normal to tgt normal — we carry
    # src normals too for exactness below.
    ok = inb & tgt_ok & src_ok & (d2 < max_dist * max_dist)

    # model-frame quantities for residual/Jacobian
    q_src = transform_points(T_i, p_src)
    q_tgt = transform_points(T_j, p_tgt)
    n_model = transform_normals(T_j, n_tgt)
    r = jnp.sum((q_tgt - q_src) * n_model, axis=-1)
    return r, n_model, q_src, q_tgt, ok


def _pair_system(
    T_i, T_j, pts_i, nrm_i, val_i, pts_j, nrm_j, val_j, K_mat,
    max_dist, cos_max, robust_delta, min_pair_pixels,
):
    """Normal-equation blocks for one ordered pair: src i associates into tgt j."""
    r, n, q_src, q_tgt, ok = _associate_pair(
        T_i, T_j, pts_i, val_i, pts_j, nrm_j, val_j, K_mat, max_dist, cos_max
    )
    # normal-angle gate: transformed source normal vs target normal
    n_src_model = transform_normals(T_i, nrm_i.reshape(-1, 3))
    cos_sn = jnp.sum(n_src_model * n, axis=-1)
    ok = ok & (cos_sn > cos_max)

    _, rho1 = huber(r * r, robust_delta)
    # pair weight: dropped below min_pair_pixels, else 1/min(log n, 9)
    n_corr = jnp.sum(ok)
    pair_w = jnp.where(
        n_corr >= min_pair_pixels,
        1.0 / jnp.minimum(jnp.log(jnp.maximum(n_corr.astype(r.dtype), 2.0)), 9.0),
        0.0,
    )
    w = rho1 * ok.astype(r.dtype) * pair_w

    # J wrt delta_i: dr/ddelta_i = -n^T [I | -hat(q_src)]
    # J wrt delta_j:  n^T [I | -hat(q_tgt)] + ((q_tgt - q_src) x n)... the
    # normal derivative term: d(n)/domega_j = -hat(n) omega contributes
    # (q_tgt - q_src)^T (-hat(n)) to the omega block of J_j.
    def row(sign, q):
        lin = sign * n  # [N, 3]
        ang = sign * jnp.cross(q, n)  # -n^T(-hat(q)) = (q x n)^T
        return jnp.concatenate([lin, ang], axis=-1)  # [N, 6]

    Ji = row(-1.0, q_src)
    Jj = row(1.0, q_tgt)
    dq = q_tgt - q_src
    Jj = Jj.at[:, 3:].add(jnp.cross(n, dq))  # (dq)^T(-hat(n)) = (n x dq)^T

    Hii = _einsum("na,n,nb->ab", Ji, w, Ji)
    Hjj = _einsum("na,n,nb->ab", Jj, w, Jj)
    Hij = _einsum("na,n,nb->ab", Ji, w, Jj)
    gi = _einsum("na,n,n->a", Ji, w, r)
    gj = _einsum("na,n,n->a", Jj, w, r)
    rho0, _ = huber(r * r, robust_delta)
    cost = jnp.sum(rho0 * ok * pair_w)
    return Hii, Hjj, Hij, gi, gj, cost, n_corr


def dense_p2p_normal_equations(
    poses: jnp.ndarray,  # [K, 4, 4] cam->model
    frames: DenseFrames,
    frame_valid: jnp.ndarray,  # [K] bool
    pair_i: jnp.ndarray,  # [P]
    pair_j: jnp.ndarray,  # [P]
    K_lowres: jnp.ndarray,  # [3, 3]
    *,
    max_dist: float = 0.02,
    max_normal_deg: float = 45.0,
    robust_delta: float = 0.005,
    min_pair_pixels: int = 800,
    weight: float = 1.0,
):
    """Dense point-to-plane H/g over all pairs (both directions i->j and j->i
    mirror the reference enumerating ordered image pairs in
    FindImageImageCorr_Kernel, SolverBundling.cu:17-47).

    Returns (H [K,K,6,6], g [K,6], cost, per-pair corr counts [P]).
    """
    Kf = poses.shape[0]
    cos_max = jnp.cos(jnp.deg2rad(max_normal_deg))

    def one_direction(pi, pj):
        def body(p_idx):
            i = pi[p_idx]
            j = pj[p_idx]
            ok_pair = frame_valid[i] & frame_valid[j]
            out = _pair_system(
                poses[i], poses[j],
                frames.points[i], frames.normals[i], frames.valid[i] & ok_pair,
                frames.points[j], frames.normals[j], frames.valid[j] & ok_pair,
                K_lowres, max_dist, cos_max, robust_delta, min_pair_pixels,
            )
            return out

        return jax.lax.map(body, jnp.arange(pi.shape[0]))

    # forward direction: src=i, tgt=j
    Hii, Hjj, Hij, gi, gj, cost_f, n_f = one_direction(pair_i, pair_j)
    H1, g1 = scatter_blocks(Kf, pair_i, pair_j, Hii, Hjj, Hij, gi, gj)
    # reverse direction: src=j, tgt=i
    Hii2, Hjj2, Hij2, gi2, gj2, cost_b, n_b = one_direction(pair_j, pair_i)
    H2, g2 = scatter_blocks(Kf, pair_j, pair_i, Hii2, Hjj2, Hij2, gi2, gj2)

    H = (H1 + H2) * weight
    g = (g1 + g2) * weight
    cost = (jnp.sum(cost_f) + jnp.sum(cost_b)) * weight
    return H, g, cost, n_f + n_b
