"""Dense point-to-plane term with projective association, batched over pairs.

TPU-native rewrite of the reference's dense depth term
(reference: src/cuda/Solver/SolverBundling.cu — FindDenseCorrespondences_Kernel
:60-113 projective association with depth/normal gates,
WeightDenseCorrespondences_Kernel:115-127 pair weights 1/min(log n, 9) with an
800-px floor, BuildDenseSystem_Kernel:129-229 point-to-plane residual
dot(camPosTgt - camPosSrcToTgt, normalTgt) with Huber; association helpers in
SolverBundlingDenseUtil.h findDenseCorr:14-215, block scatter
addToLocalSystem:217-285; low-res frame cache CUDACache.cpp:76-88).

Performance design: the whole term is ONE batched program over 2P directed
pairs x N=Hd*Wd pixels.  The projective association uses *linearized* pixel
indices with take_along_axis on flattened [2P, N, C] tables — XLA lowers this
batched single-axis gather efficiently, whereas vmapped 2D advanced indexing
(and per-pair lax.map) compiled to pathological gathers on TPU (30x+ slower
or minutes-long compiles).  The [N, 6] Jacobian rows contract to 6x6 blocks
with batched matmuls on the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundletrack_tpu.geometry.robust import huber
from bundletrack_tpu.geometry.se3 import rotate_points, se3_inverse
from bundletrack_tpu.solver.residuals import scatter_blocks

_einsum = functools.partial(jnp.einsum, precision="highest")
_mm = functools.partial(jnp.matmul, precision="highest")


class DenseFrames(NamedTuple):
    """Low-res per-frame geometry cache (reference CUDACachedFrame,
    src/cuda/CUDACacheUtil.h:10-53 — positions, normals, depth, intensity and
    intensity derivatives per cached frame).

    points:  [K, H, W, 3] camera-space
    normals: [K, H, W, 3]
    valid:   [K, H, W] bool
    intensity / grad_x / grad_y: optional [K, H, W] for the photometric term
    """

    points: jnp.ndarray
    normals: jnp.ndarray
    valid: jnp.ndarray
    intensity: jnp.ndarray | None = None
    grad_x: jnp.ndarray | None = None
    grad_y: jnp.ndarray | None = None


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
    weight_color: float = 0.0,
    robust_delta_color: float = 0.1,
):
    """Dense point-to-plane H/g over all pairs, both directions (the
    reference enumerates ordered image pairs in FindImageImageCorr_Kernel,
    SolverBundling.cu:17-47).

    Returns (H [K,K,6,6], g [K,6], cost, per-pair corr counts [P]).
    """
    Kf, Hh, Ww = frames.valid.shape
    N = Hh * Ww
    cos_max = jnp.cos(jnp.deg2rad(max_normal_deg))

    # directed pairs: forward (src=i, tgt=j) + reverse
    src = jnp.concatenate([pair_i, pair_j])  # [D]
    tgt = jnp.concatenate([pair_j, pair_i])
    D = src.shape[0]
    pair_ok = frame_valid[src] & frame_valid[tgt]  # [D]

    # flattened per-frame tables
    pts_f = frames.points.reshape(Kf, N, 3)
    nrm_f = frames.normals.reshape(Kf, N, 3)
    val_f = frames.valid.reshape(Kf, N)

    T_src = poses[src]  # [D, 4, 4]
    T_tgt = poses[tgt]
    T_rel = _mm(se3_inverse(T_tgt), T_src)  # cam_src -> cam_tgt

    p_src = pts_f[src]  # [D, N, 3] cam_src
    n_src = nrm_f[src]
    ok_src = val_f[src] & pair_ok[:, None]

    # transform into target camera + project
    R_rel = T_rel[:, :3, :3]
    t_rel = T_rel[:, :3, 3]
    p_in_t = rotate_points(R_rel, p_src) + t_rel[:, None, :]
    fx, fy = K_lowres[0, 0], K_lowres[1, 1]
    cx, cy = K_lowres[0, 2], K_lowres[1, 2]
    z = p_in_t[..., 2]
    safe_z = jnp.where(z > 1e-6, z, 1.0)
    u = p_in_t[..., 0] / safe_z * fx + cx
    v = p_in_t[..., 1] / safe_z * fy + cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < Ww) & (vi >= 0) & (vi < Hh) & (z > 1e-6)
    lin = jnp.clip(vi, 0, Hh - 1) * Ww + jnp.clip(ui, 0, Ww - 1)  # [D, N]

    # batched single-axis gather from the target frame's tables
    tgt_pts = pts_f[tgt]  # [D, N, 3]
    tgt_nrm = nrm_f[tgt]
    tgt_val = val_f[tgt]
    p_tgt = jnp.take_along_axis(tgt_pts, lin[..., None], axis=1)  # [D, N, 3]
    n_tgt = jnp.take_along_axis(tgt_nrm, lin[..., None], axis=1)
    v_tgt = jnp.take_along_axis(tgt_val, lin, axis=1)

    # gates (reference findDenseCorr depth/normal gates)
    d2 = jnp.sum((p_tgt - p_in_t) ** 2, axis=-1)
    n_src_in_t = rotate_points(R_rel, n_src)
    cos_sn = jnp.sum(n_src_in_t * n_tgt, axis=-1)
    ok = (
        inb
        & v_tgt
        & ok_src
        & (d2 < max_dist * max_dist)
        & (cos_sn > cos_max)
    )

    # model-frame quantities for residual/Jacobian
    Rs, ts = T_src[:, :3, :3], T_src[:, :3, 3]
    Rt, tt = T_tgt[:, :3, :3], T_tgt[:, :3, 3]
    q_src = rotate_points(Rs, p_src) + ts[:, None, :]
    q_tgt = rotate_points(Rt, p_tgt) + tt[:, None, :]
    n_model = rotate_points(Rt, n_tgt)
    r = jnp.sum((q_tgt - q_src) * n_model, axis=-1)  # [D, N]

    _, rho1 = huber(r * r, robust_delta)
    n_corr = jnp.sum(ok, axis=-1)  # [D]
    pair_w = jnp.where(
        n_corr >= min_pair_pixels,
        1.0 / jnp.minimum(jnp.log(jnp.maximum(n_corr.astype(r.dtype), 2.0)), 9.0),
        0.0,
    )
    w = rho1 * ok.astype(r.dtype) * pair_w[:, None]  # [D, N]

    # Jacobian rows [D, N, 6]:
    #   dr/ddelta_src = [-n | -(q_src x n)]
    #   dr/ddelta_tgt = [ n |  (q_tgt x n) + (n x (q_tgt - q_src))]
    n = n_model
    Ji = jnp.concatenate([-n, -jnp.cross(q_src, n)], axis=-1)
    dq = q_tgt - q_src
    Jj = jnp.concatenate(
        [n, jnp.cross(q_tgt, n) + jnp.cross(n, dq)], axis=-1
    )

    Hss = _einsum("dna,dn,dnb->dab", Ji, w, Ji)
    Htt = _einsum("dna,dn,dnb->dab", Jj, w, Jj)
    Hst = _einsum("dna,dn,dnb->dab", Ji, w, Jj)
    gs = _einsum("dna,dn,dn->da", Ji, w, r)
    gt = _einsum("dna,dn,dn->da", Jj, w, r)

    H, g = scatter_blocks(Kf, src, tgt, Hss, Htt, Hst, gs, gt)
    rho0, _ = huber(r * r, robust_delta)
    cost = jnp.sum(rho0 * ok * pair_w[:, None]) * weight
    H = H * weight
    g = g * weight

    # ---- photometric (dense color) term --------------------------------
    # Reference compiles this path with weightsDenseColor = 0 by default
    # (SBA.cpp:28-32; BuildDenseSystem_Kernel photometric rows,
    # SolverBundling.cu:199-227).  Residual r_c = I_tgt(pi(p')) - I_src(p);
    # the Jacobian chains the image gradient through the projection
    # derivative (reference ICPUtil.h dCameraToScreen) and the Lie
    # derivative: J_src = [a | q_src x a] with a = R_tgt (J_pi^T grad),
    # J_tgt = -J_src (photometric constrains only the relative pose).
    if weight_color > 0.0 and frames.intensity is not None:
        int_f = frames.intensity.reshape(Kf, N)
        gx_f = frames.grad_x.reshape(Kf, N)
        gy_f = frames.grad_y.reshape(Kf, N)
        i_src = int_f[src]

        # bilinear sampling at the continuous (u, v) — nearest-pixel lookup
        # quantizes away sub-pixel photometric residuals (the reference
        # interpolates intensity bilinearly, ICPUtil.h:26-110)
        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, Ww - 2)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, Hh - 2)
        du = jnp.clip(u - u0, 0.0, 1.0)
        dv = jnp.clip(v - v0, 0.0, 1.0)

        def bil(f_tbl):
            t = f_tbl[tgt]
            g00 = jnp.take_along_axis(t, v0 * Ww + u0, axis=1)
            g01 = jnp.take_along_axis(t, v0 * Ww + u0 + 1, axis=1)
            g10 = jnp.take_along_axis(t, (v0 + 1) * Ww + u0, axis=1)
            g11 = jnp.take_along_axis(t, (v0 + 1) * Ww + u0 + 1, axis=1)
            return (
                g00 * (1 - du) * (1 - dv)
                + g01 * du * (1 - dv)
                + g10 * (1 - du) * dv
                + g11 * du * dv
            )

        i_tgt = bil(int_f)
        gx = bil(gx_f)
        gy = bil(gy_f)
        r_c = i_tgt - i_src  # [D, N]
        x, y = p_in_t[..., 0], p_in_t[..., 1]
        a_cam = jnp.stack(
            [
                fx / safe_z * gx,
                fy / safe_z * gy,
                -(fx * x * gx + fy * y * gy) / (safe_z * safe_z),
            ],
            axis=-1,
        )  # [D, N, 3] in cam_tgt
        a_model = rotate_points(Rt, a_cam)
        Jc = jnp.concatenate([a_model, jnp.cross(q_src, a_model)], axis=-1)
        _, rho1c = huber(r_c * r_c, robust_delta_color)
        wc = rho1c * ok.astype(r.dtype) * pair_w[:, None] * weight_color
        Hcc = _einsum("dna,dn,dnb->dab", Jc, wc, Jc)
        gc = _einsum("dna,dn,dn->da", Jc, wc, r_c)
        # J_tgt = -J_src: Hss += Hcc, Htt += Hcc, Hst += -Hcc, gs += gc, gt -= gc
        Hc, gcv = scatter_blocks(Kf, src, tgt, Hcc, Hcc, -Hcc, gc, -gc)
        H = H + Hc
        g = g + gcv
        rho0c, _ = huber(r_c * r_c, robust_delta_color)
        cost = cost + jnp.sum(rho0c * ok * pair_w[:, None]) * weight_color

    P = pair_i.shape[0]
    return H, g, cost, n_corr[:P] + n_corr[P:]
