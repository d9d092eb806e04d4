"""Dense point-to-plane (+ photometric) term with projective association.

TPU-native rewrite of the reference's dense depth term
(reference: src/cuda/Solver/SolverBundling.cu — FindDenseCorrespondences_Kernel
:60-113 projective association with depth/normal gates (one direction per
overlapping pair: src = j transformed by inv(T_i)·T_j into tgt = i),
WeightDenseCorrespondences_Kernel:115-127 pair weights 1/min(log n, 9) with an
800-px floor, BuildDenseSystem_Kernel:129-229 point-to-plane residual
dot(camPosTgt - camPosSrcToTgt, normalTgt) with Huber and the photometric
residual path :199-227; association helpers SolverBundlingDenseUtil.h
findDenseCorr:14-215, block scatter addToLocalSystem:217-285; low-res frame
cache CUDACache.cpp:76-88).

Performance design (measured on TPU; see benchmarks/profile_dense_micro.py):

* The projective-association gather dominates — TPU gathers cost ~3-7 ns per
  index regardless of payload, so the fix is *fewer, narrower* indices:
  - **Source-pixel compaction** (once per FRAME at keyframe admission —
    compact_frame / FrameDense — mirroring CUDACache::storeFrame's
    preprocess-on-insert, src/cuda/CUDACache.cpp:76-88; the batched
    compact_dense_frames covers standalone solves): only masked/valid
    low-res pixels enter the term.  Valid pixels are decimated evenly to a
    fixed capacity C, replacing [P, H*W] planes with [P, C].  The reference
    similarly bounds dense residuals per pair (residual buffer sized H·W/4,
    src/cuda/LossGPU.cu:102).
  - **Single direction per pair** like the reference (halves the gathers).
  - **One bf16 8-channel table** per target frame: depth split hi/lo into
    two bf16 (recombined exactly to ~2^-16 relative), normals, validity.
    The target 3D point is *reconstructed* from (u, v, z) with the pinhole
    model instead of gathered — 16 bytes/index instead of 32+.
* All per-pixel math is structure-of-arrays [P, C] f32 planes (lane-aligned,
  no 3-vector minor dimension → no layout-conversion copies).
* The 6x6 normal-equation blocks are 90 masked reductions over shared inputs
  (XLA multi-output fusion), scatter-added into [K, K, 6, 6].
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundletrack_tpu.geometry.robust import huber
from bundletrack_tpu.geometry.se3 import se3_inverse
from bundletrack_tpu.ops.prefix import prefix_sum_1d as _prefix_sum_mxu
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


class CompactDense(NamedTuple):
    """Solve-ready dense-term inputs, built ONCE per BA solve.

    src:       [6, K, C] f32 planes: sx, sy, sz, snx, sny, snz — evenly
               decimated valid source pixels (capacity C).
    src_valid: [K, C] bool
    src_lin:   [K, C] int32 — the original linear pixel index of each
               compacted source pixel (photometric term reads I_src here).
    tchan:     [K, H, W, 8] bf16 gather table: z_hi, z_lo, nx, ny, nz,
               valid, 0, 0 (z = z_hi + z_lo recombines to f32 precision).
    cchan:     [K, H, W, 4] f32 (intensity, grad_x, grad_y, 0) or None —
               only materialized when the photometric term is enabled.
    """

    src: jnp.ndarray
    src_valid: jnp.ndarray
    src_lin: jnp.ndarray
    tchan: jnp.ndarray
    cchan: jnp.ndarray | None = None


class FrameDense(NamedTuple):
    """Solve-ready dense-term data for ONE frame, built at admission time.

    The reference preprocesses each frame once when it enters the BA cache
    (CUDACache::storeFrame, src/cuda/CUDACache.cpp:76-88), not per solve;
    storing these in the keyframe pool moves the compaction scatter/cumsum
    out of the per-frame hot path entirely.

    src:   [6, C] f32 planes (sx, sy, sz, snx, sny, snz), evenly decimated
           valid low-res pixels.
    valid: [C] bool
    lin:   [C] int32 original linear pixel index (photometric term)
    tchan: [H, W, 8] bf16 gather table (z_hi, z_lo, nx, ny, nz, valid, 0, 0)
    """

    src: jnp.ndarray
    valid: jnp.ndarray
    lin: jnp.ndarray
    tchan: jnp.ndarray


def compact_frame(
    points: jnp.ndarray,  # [H, W, 3]
    normals: jnp.ndarray,  # [H, W, 3]
    valid: jnp.ndarray,  # [H, W] bool
    capacity: int,
) -> FrameDense:
    """Single-frame compaction + gather-table packing (see FrameDense)."""
    Hh, Ww = valid.shape
    N = Hh * Ww
    C = min(N, capacity)

    val = valid.reshape(N)
    cnt = _prefix_sum_mxu(val)
    count = cnt[-1]
    rank = cnt - 1
    slot = jnp.where(val, rank, N)
    idx_by_rank = (
        jnp.zeros((N + 1,), jnp.int32)
        .at[slot]
        .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    )
    c = jnp.arange(C, dtype=jnp.int32)
    sel_rank = jnp.where(count > C, (c * count) // C, c)
    sel_idx = idx_by_rank[jnp.minimum(sel_rank, N - 1)]
    sel_valid = c < jnp.minimum(count, C)

    pf = points.reshape(N, 3)
    nf = normals.reshape(N, 3)
    zero = jnp.where(sel_valid, 1.0, 0.0)
    src = jnp.stack(
        [
            jnp.take(pf[:, 0], sel_idx), jnp.take(pf[:, 1], sel_idx),
            jnp.take(pf[:, 2], sel_idx),
            jnp.take(nf[:, 0], sel_idx), jnp.take(nf[:, 1], sel_idx),
            jnp.take(nf[:, 2], sel_idx),
        ]
    ) * zero[None]  # [6, C]

    z = jnp.where(valid, points[..., 2], 0.0)
    z_hi = z.astype(jnp.bfloat16)
    z_lo = (z - z_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    tchan = jnp.stack(
        [
            z_hi, z_lo,
            normals[..., 0].astype(jnp.bfloat16),
            normals[..., 1].astype(jnp.bfloat16),
            normals[..., 2].astype(jnp.bfloat16),
            valid.astype(jnp.bfloat16),
            jnp.zeros_like(z_hi), jnp.zeros_like(z_hi),
        ],
        axis=-1,
    )  # [H, W, 8]
    return FrameDense(src=src, valid=sel_valid, lin=sel_idx, tchan=tchan)


def stack_frame_dense(
    src: jnp.ndarray,  # [K, 6, C]
    valid: jnp.ndarray,  # [K, C]
    lin: jnp.ndarray,  # [K, C]
    tchan: jnp.ndarray,  # [K, H, W, 8]
) -> CompactDense:
    """Assemble per-frame FrameDense stacks into solver CompactDense."""
    return CompactDense(
        src=jnp.transpose(src, (1, 0, 2)),  # [6, K, C]
        src_valid=valid,
        src_lin=lin,
        tchan=tchan,
        cchan=None,
    )


def compact_dense_frames(
    frames: DenseFrames, capacity: int | None = None, with_color: bool = False
) -> CompactDense:
    """Select up to `capacity` valid pixels per frame (evenly spaced over the
    valid set) and pack the gather tables.  Runs once per solve."""
    Kf, Hh, Ww = frames.valid.shape
    N = Hh * Ww
    C = min(N, capacity) if capacity else min(N, 4096)

    val = frames.valid.reshape(Kf, N)
    pf = frames.points.reshape(Kf, N, 3)
    nf = frames.normals.reshape(Kf, N, 3)

    def select(valid_k):  # [N] bool -> (sel_idx [C], sel_valid [C])
        cnt = _prefix_sum_mxu(valid_k)
        count = cnt[-1]
        rank = cnt - 1  # [N]
        # pixel index for each rank (invalid pixels dropped via clamp slot N)
        slot = jnp.where(valid_k, rank, N)
        idx_by_rank = (
            jnp.zeros((N + 1,), jnp.int32)
            .at[slot]
            .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
        )
        c = jnp.arange(C, dtype=jnp.int32)
        sel_rank = jnp.where(count > C, (c * count) // C, c)
        sel_idx = idx_by_rank[jnp.minimum(sel_rank, N - 1)]
        sel_valid = c < jnp.minimum(count, C)
        return sel_idx, sel_valid

    sel_idx, sel_valid = jax.vmap(select)(val)  # [K, C]

    g = lambda a: jnp.take_along_axis(a, sel_idx, axis=1)  # [K, C]
    src = jnp.stack(
        [
            g(pf[..., 0]), g(pf[..., 1]), g(pf[..., 2]),
            g(nf[..., 0]), g(nf[..., 1]), g(nf[..., 2]),
        ]
    )  # [6, K, C]
    zero = jnp.where(sel_valid, 1.0, 0.0)
    src = src * zero[None]

    z = jnp.where(frames.valid, frames.points[..., 2], 0.0)
    z_hi = z.astype(jnp.bfloat16)
    z_lo = (z - z_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    tchan = jnp.stack(
        [
            z_hi,
            z_lo,
            frames.normals[..., 0].astype(jnp.bfloat16),
            frames.normals[..., 1].astype(jnp.bfloat16),
            frames.normals[..., 2].astype(jnp.bfloat16),
            frames.valid.astype(jnp.bfloat16),
            jnp.zeros_like(z_hi),
            jnp.zeros_like(z_hi),
        ],
        axis=-1,
    )  # [K, H, W, 8]

    cchan = None
    if with_color and frames.intensity is not None:
        cchan = jnp.stack(
            [
                frames.intensity,
                frames.grad_x,
                frames.grad_y,
                jnp.zeros_like(frames.intensity),
            ],
            axis=-1,
        ).astype(jnp.float32)
    return CompactDense(
        src=src, src_valid=sel_valid, src_lin=sel_idx, tchan=tchan, cchan=cchan
    )


def _rot_apply(R, x, y, z, col):
    """Row `col` of batched rotation applied to component planes.

    R: [P, 3, 3]; x/y/z: [P, C].  Returns [P, C].
    """
    return (
        R[:, col, 0][:, None] * x
        + R[:, col, 1][:, None] * y
        + R[:, col, 2][:, None] * z
    )


def dense_p2p_from_compact(
    poses: jnp.ndarray,  # [K, 4, 4] cam->model
    cd: CompactDense,
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
    """Dense point-to-plane H/g over pairs, reference direction: src = j
    projected into tgt = i via inv(T_i)·T_j (SolverBundling.cu:73).

    Returns (H [K,K,6,6], g [K,6], cost, per-pair corr counts [P]).
    """
    Kf, Hh, Ww, _ = cd.tchan.shape
    N = Hh * Ww
    cos_max = jnp.cos(jnp.deg2rad(max_normal_deg))

    src = pair_j  # [P] reference: source points come from the later frame j
    tgt = pair_i
    pair_ok = frame_valid[src] & frame_valid[tgt]

    T_src = poses[src]  # [P, 4, 4]
    T_tgt = poses[tgt]
    T_rel = _mm(se3_inverse(T_tgt), T_src)  # cam_src -> cam_tgt
    Rr = T_rel[:, :3, :3]
    tr = T_rel[:, :3, 3]

    sx, sy, sz = cd.src[0][src], cd.src[1][src], cd.src[2][src]  # [P, C]
    snx, sny, snz = cd.src[3][src], cd.src[4][src], cd.src[5][src]
    ok_src = cd.src_valid[src] & pair_ok[:, None]

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
    uic = jnp.clip(ui, 0, Ww - 1)
    vic = jnp.clip(vi, 0, Hh - 1)
    lin = vic * Ww + uic  # [P, C]

    # ONE narrow bf16 gather per associated pixel (16 B/index); the target
    # 3D point is reconstructed from (u, v, z) instead of gathered.
    flat = cd.tchan.reshape(Kf * N, 8)
    gat = jnp.take(flat, tgt[:, None] * N + lin, axis=0).astype(jnp.float32)
    tz = gat[..., 0] + gat[..., 1]  # exact-to-f32 depth
    tnx, tny, tnz = gat[..., 2], gat[..., 3], gat[..., 4]
    v_tgt = gat[..., 5] > 0.5
    tx = (uic.astype(jnp.float32) - cx) / fx * tz
    ty = (vic.astype(jnp.float32) - cy) / fy * tz

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
    r = dqx * nmx + dqy * nmy + dqz * nmz  # [P, C]

    _, rho1 = huber(r * r, robust_delta)
    n_corr = jnp.sum(ok, axis=-1)  # [P]
    pair_w = jnp.where(
        n_corr >= min_pair_pixels,
        1.0 / jnp.minimum(jnp.log(jnp.maximum(n_corr.astype(r.dtype), 2.0)), 9.0),
        0.0,
    )
    w = rho1 * ok.astype(r.dtype) * pair_w[:, None]  # [P, C]

    # Jacobian component planes (6 each):
    #   J_src = [-n | -(q_src x n)],  J_tgt = [n | (q_tgt x n) + (n x dq)]
    cross = lambda axx, ayy, azz, bx, by, bz: (
        ayy * bz - azz * by,
        azz * bx - axx * bz,
        axx * by - ayy * bx,
    )
    c1x, c1y, c1z = cross(qsx, qsy, qsz, nmx, nmy, nmz)
    Jsrc = (-nmx, -nmy, -nmz, -c1x, -c1y, -c1z)
    c2x, c2y, c2z = cross(qtx, qty, qtz, nmx, nmy, nmz)
    c3x, c3y, c3z = cross(nmx, nmy, nmz, dqx, dqy, dqz)
    Jtgt = (nmx, nmy, nmz, c2x + c3x, c2y + c3y, c2z + c3z)

    def blocks(Ja, Jb, w):
        rows = []
        for a in range(6):
            cols = [jnp.sum(w * Ja[a] * Jb[b], axis=-1) for b in range(6)]
            rows.append(jnp.stack(cols, axis=-1))
        return jnp.stack(rows, axis=-2)  # [P, 6, 6]

    def grad(Ja, w, r):
        return jnp.stack(
            [jnp.sum(w * Ja[a] * r, axis=-1) for a in range(6)], axis=-1
        )  # [P, 6]

    # scatter_blocks(Kf, a, b, Haa, Hbb, Hab, ga, gb): here a=src, b=tgt
    Hss = blocks(Jsrc, Jsrc, w)
    Htt = blocks(Jtgt, Jtgt, w)
    Hst = blocks(Jsrc, Jtgt, w)
    gs = grad(Jsrc, w, r)
    gt = grad(Jtgt, w, r)

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
    if weight_color > 0.0 and cd.cchan is not None:
        cflat = cd.cchan.reshape(Kf * N, 4)
        i_src = jnp.take(cflat[..., 0], src[:, None] * N + cd.src_lin[src], axis=0)

        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, Ww - 2)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, Hh - 2)
        du = jnp.clip(u - u0, 0.0, 1.0)
        dv = jnp.clip(v - v0, 0.0, 1.0)
        l00 = v0 * Ww + u0

        def tap(off):
            return jnp.take(cflat, tgt[:, None] * N + l00 + off, axis=0)

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

    return H, g, cost, n_corr


def dense_p2p_normal_equations(
    poses: jnp.ndarray,
    frames: DenseFrames,
    frame_valid: jnp.ndarray,
    pair_i: jnp.ndarray,
    pair_j: jnp.ndarray,
    K_lowres: jnp.ndarray,
    *,
    max_dist: float = 0.02,
    max_normal_deg: float = 45.0,
    robust_delta: float = 0.005,
    min_pair_pixels: int = 800,
    weight: float = 1.0,
    weight_color: float = 0.0,
    robust_delta_color: float = 0.1,
    src_capacity: int | None = None,
):
    """One-shot convenience wrapper: compact + evaluate.  Inside a GN loop,
    call compact_dense_frames once and dense_p2p_from_compact per iteration
    (see solver/gauss_newton.py)."""
    cd = compact_dense_frames(
        frames, capacity=src_capacity, with_color=weight_color > 0.0
    )
    return dense_p2p_from_compact(
        poses, cd, frame_valid, pair_i, pair_j, K_lowres,
        max_dist=max_dist,
        max_normal_deg=max_normal_deg,
        robust_delta=robust_delta,
        min_pair_pixels=min_pair_pixels,
        weight=weight,
        weight_color=weight_color,
        robust_delta_color=robust_delta_color,
    )
