"""Multi-frame weighted depth fusion.

TPU equivalent of the reference's CUDACache::fuseDepthFrames
(reference: src/cuda/CUDACache.cpp:90-120 + CUDACache.cu:14-114 — fuses a
set of cached depth frames into the first frame's view with per-pixel
weights; present in the reference but off BundleTrack's main path).
Useful for denoising keyframe geometry before the dense term.
"""

from __future__ import annotations

import jax.numpy as jnp

from bundletrack_tpu.geometry.se3 import rotate_points, se3_inverse
from bundletrack_tpu.geometry.camera import unproject


def fuse_depth_frames(
    depths: jnp.ndarray,  # [K, H, W] meters (0 invalid)
    poses: jnp.ndarray,  # [K, 4, 4] cam->model
    K_mat: jnp.ndarray,  # [3, 3]
    target_idx: int = 0,
    max_dist: float = 0.03,
) -> jnp.ndarray:
    """Fuse all frames' depths into frame `target_idx`'s view (average of
    reprojected depths within max_dist of the target's own depth)."""
    Kf, H, W = depths.shape
    T_t_inv = se3_inverse(poses[target_idx])
    fx, fy = K_mat[0, 0], K_mat[1, 1]
    cx, cy = K_mat[0, 2], K_mat[1, 2]

    acc = jnp.zeros((H * W,), depths.dtype)
    wacc = jnp.zeros((H * W,), depths.dtype)
    for k in range(Kf):
        pts_k = unproject(depths[k], K_mat).reshape(-1, 3)
        valid_k = (depths[k] > 0).reshape(-1)
        T_rel = T_t_inv @ poses[k]
        p_t = rotate_points(T_rel[:3, :3], pts_k) + T_rel[:3, 3]
        z = p_t[:, 2]
        safe_z = jnp.where(z > 1e-6, z, 1.0)
        u = jnp.round(p_t[:, 0] / safe_z * fx + cx).astype(jnp.int32)
        v = jnp.round(p_t[:, 1] / safe_z * fy + cy).astype(jnp.int32)
        inb = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (z > 1e-6) & valid_k
        lin = jnp.where(inb, v * W + u, H * W)
        acc = acc.at[lin].add(jnp.where(inb, z, 0.0), mode="drop")
        wacc = wacc.at[lin].add(inb.astype(depths.dtype), mode="drop")

    fused = (acc / jnp.maximum(wacc, 1.0)).reshape(H, W)
    base = depths[target_idx]
    ok = (wacc.reshape(H, W) > 0) & (jnp.abs(fused - base) < max_dist) & (base > 0)
    return jnp.where(ok, fused, base)
