"""Dense point-to-plane (+ photometric) term with projective association.

TPU-native rewrite of the reference's dense depth term
(reference: src/cuda/Solver/SolverBundling.cu — FindDenseCorrespondences_Kernel
:60-113 projective association with depth/normal gates,
WeightDenseCorrespondences_Kernel:115-127 pair weights 1/min(log n, 9) with an
800-px floor, BuildDenseSystem_Kernel:129-229 point-to-plane residual
dot(camPosTgt - camPosSrcToTgt, normalTgt) with Huber and the photometric
residual path :199-227; association helpers SolverBundlingDenseUtil.h
findDenseCorr:14-215, block scatter addToLocalSystem:217-285; low-res frame
cache CUDACache.cpp:76-88).

Performance design — structure-of-arrays scalar-component math:
every hot array is a plain [D, N] f32/pred plane (D = 2P directed pairs,
N = H*W pixels), tiled (8, 128) with zero padding waste.  Profiling showed
that arrays with a trailing 3-vector dimension ([D, N, 3]) push XLA into
transposed {0,1} layouts for the batched gathers, costing ~220 ms/iteration
in layout-conversion copies alone; per-channel take_along_axis on [D, N]
planes plus broadcast multiply-adds runs the same math at HBM speed.  The
6x6 normal-equation blocks are built as 90 masked reductions over shared
inputs (XLA multi-output fusion), then scatter-added into [K, K, 6, 6].
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundletrack_tpu.geometry.robust import huber
from bundletrack_tpu.geometry.se3 import se3_inverse
from bundletrack_tpu.solver.residuals import scatter_blocks

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


def _rot_apply(R, x, y, z, col):
    """Row `col` of batched rotation applied to component planes.

    R: [D, 3, 3]; x/y/z: [D, N].  Returns [D, N].
    """
    return (
        R[:, col, 0][:, None] * x
        + R[:, col, 1][:, None] * y
        + R[:, col, 2][:, None] * z
    )


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
    pair_ok = frame_valid[src] & frame_valid[tgt]  # [D]

    # component planes [K, N]
    pf = frames.points.reshape(Kf, N, 3)
    nf = frames.normals.reshape(Kf, N, 3)
    px_t, py_t, pz_t = pf[..., 0], pf[..., 1], pf[..., 2]
    nx_t, ny_t, nz_t = nf[..., 0], nf[..., 1], nf[..., 2]
    val_t = frames.valid.reshape(Kf, N)

    T_src = poses[src]  # [D, 4, 4]
    T_tgt = poses[tgt]
    T_rel = _mm(se3_inverse(T_tgt), T_src)  # cam_src -> cam_tgt
    Rr = T_rel[:, :3, :3]
    tr = T_rel[:, :3, 3]

    sx, sy, sz = px_t[src], py_t[src], pz_t[src]  # [D, N] src cam points
    snx, sny, snz = nx_t[src], ny_t[src], nz_t[src]
    ok_src = val_t[src] & pair_ok[:, None]

    # transform into target camera + project
    ax = _rot_apply(Rr, sx, sy, sz, 0) + tr[:, 0][:, None]
    ay = _rot_apply(Rr, sx, sy, sz, 1) + tr[:, 1][:, None]
    az = _rot_apply(Rr, sx, sy, sz, 2) + tr[:, 2][:, None]
    fx, fy = K_lowres[0, 0], K_lowres[1, 1]
    cx, cy = K_lowres[0, 2], K_lowres[1, 2]
    safe_z = jnp.where(az > 1e-6, az, 1.0)
    u = ax / safe_z * fx + cx
    v = ay / safe_z * fy + cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < Ww) & (vi >= 0) & (vi < Hh) & (az > 1e-6)
    lin = jnp.clip(vi, 0, Hh - 1) * Ww + jnp.clip(ui, 0, Ww - 1)  # [D, N]

    # ONE stacked-channel gather [D, N, 8] from the target frame's tables.
    # Channel count 8 (lane-aligned) keeps XLA on the fast sublane-gather
    # path; per-channel [D, N] gathers along the minor axis serialize
    # (~140 ms each), and 3-channel AoS gathers trigger transposed-layout
    # copies — both measured on v5e.
    chan = jnp.concatenate(
        [
            pf,  # px, py, pz
            nf,  # nx, ny, nz
            val_t[..., None].astype(pf.dtype),
            jnp.zeros((Kf, N, 1), pf.dtype),
        ],
        axis=-1,
    )  # [K, N, 8]
    gat = jnp.take_along_axis(chan[tgt], lin[..., None], axis=1)  # [D, N, 8]
    tx, ty, tz = gat[..., 0], gat[..., 1], gat[..., 2]
    tnx, tny, tnz = gat[..., 3], gat[..., 4], gat[..., 5]
    v_tgt = gat[..., 6] > 0.5

    # gates (reference findDenseCorr depth/normal gates)
    d2 = (tx - ax) ** 2 + (ty - ay) ** 2 + (tz - az) ** 2
    rnx = _rot_apply(Rr, snx, sny, snz, 0)
    rny = _rot_apply(Rr, snx, sny, snz, 1)
    rnz = _rot_apply(Rr, snx, sny, snz, 2)
    cos_sn = rnx * tnx + rny * tny + rnz * tnz
    ok = inb & v_tgt & ok_src & (d2 < max_dist * max_dist) & (cos_sn > cos_max)

    # model-frame quantities
    Rs, ts = T_src[:, :3, :3], T_src[:, :3, 3]
    Rt, tt = T_tgt[:, :3, :3], T_tgt[:, :3, 3]
    qsx = _rot_apply(Rs, sx, sy, sz, 0) + ts[:, 0][:, None]
    qsy = _rot_apply(Rs, sx, sy, sz, 1) + ts[:, 1][:, None]
    qsz = _rot_apply(Rs, sx, sy, sz, 2) + ts[:, 2][:, None]
    qtx = _rot_apply(Rt, tx, ty, tz, 0) + tt[:, 0][:, None]
    qty = _rot_apply(Rt, tx, ty, tz, 1) + tt[:, 1][:, None]
    qtz = _rot_apply(Rt, tx, ty, tz, 2) + tt[:, 2][:, None]
    nmx = _rot_apply(Rt, tnx, tny, tnz, 0)
    nmy = _rot_apply(Rt, tnx, tny, tnz, 1)
    nmz = _rot_apply(Rt, tnx, tny, tnz, 2)
    dqx, dqy, dqz = qtx - qsx, qty - qsy, qtz - qsz
    r = dqx * nmx + dqy * nmy + dqz * nmz  # [D, N]

    _, rho1 = huber(r * r, robust_delta)
    n_corr = jnp.sum(ok, axis=-1)  # [D]
    pair_w = jnp.where(
        n_corr >= min_pair_pixels,
        1.0 / jnp.minimum(jnp.log(jnp.maximum(n_corr.astype(r.dtype), 2.0)), 9.0),
        0.0,
    )
    w = rho1 * ok.astype(r.dtype) * pair_w[:, None]  # [D, N]

    # Jacobian component planes (6 each):
    #   J_src = [-n | -(q_src x n)],  J_tgt = [n | (q_tgt x n) + (n x dq)]
    cross = lambda axx, ayy, azz, bx, by, bz: (
        ayy * bz - azz * by,
        azz * bx - axx * bz,
        axx * by - ayy * bx,
    )
    c1x, c1y, c1z = cross(qsx, qsy, qsz, nmx, nmy, nmz)
    Ji = (-nmx, -nmy, -nmz, -c1x, -c1y, -c1z)
    c2x, c2y, c2z = cross(qtx, qty, qtz, nmx, nmy, nmz)
    c3x, c3y, c3z = cross(nmx, nmy, nmz, dqx, dqy, dqz)
    Jj = (nmx, nmy, nmz, c2x + c3x, c2y + c3y, c2z + c3z)

    def blocks(Ja, Jb, w):
        """[D, 6, 6] H-block and via closure the shared-w reductions."""
        rows = []
        for a in range(6):
            cols = [jnp.sum(w * Ja[a] * Jb[b], axis=-1) for b in range(6)]
            rows.append(jnp.stack(cols, axis=-1))
        return jnp.stack(rows, axis=-2)  # [D, 6, 6]

    def grad(Ja, w, r):
        return jnp.stack(
            [jnp.sum(w * Ja[a] * r, axis=-1) for a in range(6)], axis=-1
        )  # [D, 6]

    Hss = blocks(Ji, Ji, w)
    Htt = blocks(Jj, Jj, w)
    Hst = blocks(Ji, Jj, w)
    gs = grad(Ji, w, r)
    gt = grad(Jj, w, r)

    H, g = scatter_blocks(Kf, src, tgt, Hss, Htt, Hst, gs, gt)
    rho0, _ = huber(r * r, robust_delta)
    cost = jnp.sum(rho0 * ok * pair_w[:, None]) * weight
    H = H * weight
    g = g * weight

    # ---- photometric (dense color) term --------------------------------
    # Reference compiles this path with weightsDenseColor = 0 by default
    # (SBA.cpp:28-32; photometric rows SolverBundling.cu:199-227).
    # Residual r_c = I_tgt(pi(p')) - I_src(p), bilinearly sampled; the
    # Jacobian chains the image gradient through the projection derivative
    # (reference ICPUtil.h dCameraToScreen): J_src = [a | q_src x a] with
    # a = R_tgt (J_pi^T grad),  J_tgt = -J_src.
    if weight_color > 0.0 and frames.intensity is not None:
        int_t = frames.intensity.reshape(Kf, N)
        gx_t = frames.grad_x.reshape(Kf, N)
        gy_t = frames.grad_y.reshape(Kf, N)
        i_src = int_t[src]

        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, Ww - 2)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, Hh - 2)
        du = jnp.clip(u - u0, 0.0, 1.0)
        dv = jnp.clip(v - v0, 0.0, 1.0)
        l00 = v0 * Ww + u0

        cchan = jnp.stack([int_t, gx_t, gy_t, jnp.zeros_like(int_t)], axis=-1)
        cchan = cchan[tgt]  # [D, N, 4]

        def tap(off):
            return jnp.take_along_axis(cchan, (l00 + off)[..., None], axis=1)

        w00 = ((1 - du) * (1 - dv))[..., None]
        w01 = (du * (1 - dv))[..., None]
        w10 = ((1 - du) * dv)[..., None]
        w11 = (du * dv)[..., None]
        cbil = tap(0) * w00 + tap(1) * w01 + tap(Ww) * w10 + tap(Ww + 1) * w11
        i_tgt, gx, gy = cbil[..., 0], cbil[..., 1], cbil[..., 2]
        r_c = i_tgt - i_src
        acx = fx / safe_z * gx
        acy = fy / safe_z * gy
        acz = -(fx * ax * gx + fy * ay * gy) / (safe_z * safe_z)
        amx = _rot_apply(Rt, acx, acy, acz, 0)
        amy = _rot_apply(Rt, acx, acy, acz, 1)
        amz = _rot_apply(Rt, acx, acy, acz, 2)
        ccx, ccy, ccz = cross(qsx, qsy, qsz, amx, amy, amz)
        Jc = (amx, amy, amz, ccx, ccy, ccz)
        _, rho1c = huber(r_c * r_c, robust_delta_color)
        wc = rho1c * ok.astype(r.dtype) * pair_w[:, None] * weight_color
        Hcc = blocks(Jc, Jc, wc)
        gc = grad(Jc, wc, r_c)
        # J_tgt = -J_src: Hss += Hcc, Htt += Hcc, Hst -= Hcc, gs += gc, gt -= gc
        Hc, gcv = scatter_blocks(Kf, src, tgt, Hcc, Hcc, -Hcc, gc, -gc)
        H = H + Hc
        g = g + gcv
        rho0c, _ = huber(r_c * r_c, robust_delta_color)
        cost = cost + jnp.sum(rho0c * ok * pair_w[:, None]) * weight_color

    P = pair_i.shape[0]
    return H, g, cost, n_corr[:P] + n_corr[P:]
