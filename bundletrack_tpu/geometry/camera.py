"""Pinhole camera ops (project/unproject/bilinear sampling), batched.

Reference: src/cuda/CUDACameraUtil.h (depthToCamera/cameraToDepth),
src/cuda/Solver/ICPUtil.h bilinear interpolation with invalid handling.
"""

from __future__ import annotations

import jax.numpy as jnp


def scale_intrinsics(K: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Rescale a 3x3 intrinsic matrix for a `scale`-downsampled image.

    Reference CUDACache.cpp:20-25 shifts the principal point by the standard
    (x+0.5)*s - 0.5 rule; we follow the same convention.
    """
    K = jnp.asarray(K)
    fx, fy = K[..., 0, 0] * scale, K[..., 1, 1] * scale
    cx = (K[..., 0, 2] + 0.5) * scale - 0.5
    cy = (K[..., 1, 2] + 0.5) * scale - 0.5
    out = jnp.zeros_like(K)
    out = out.at[..., 0, 0].set(fx)
    out = out.at[..., 1, 1].set(fy)
    out = out.at[..., 0, 2].set(cx)
    out = out.at[..., 1, 2].set(cy)
    out = out.at[..., 2, 2].set(1.0)
    return out


def unproject(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Depth map [..., H, W] -> camera-space points [..., H, W, 3].

    Invalid (<=0) depths produce zero points; callers carry a validity mask.
    """
    H, W = depth.shape[-2], depth.shape[-1]
    v = jnp.arange(H, dtype=depth.dtype)[:, None]
    u = jnp.arange(W, dtype=depth.dtype)[None, :]
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]

    def expand(s):
        return s[..., None, None] if s.ndim else s

    x = (u - expand(cx)) / expand(fx) * depth
    y = (v - expand(cy)) / expand(fy) * depth
    return jnp.stack([x, y, depth], axis=-1)


def project(pts: jnp.ndarray, K: jnp.ndarray):
    """Camera-space points [..., 3] -> pixel coords (u, v) and depth z."""
    z = pts[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = pts[..., 0] / safe_z * K[..., 0, 0] + K[..., 0, 2]
    v = pts[..., 1] / safe_z * K[..., 1, 1] + K[..., 1, 2]
    return u, v, z


def bilinear_sample(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, valid=None):
    """Bilinearly sample img [H, W, C] (or [H, W]) at float pixel coords.

    Returns (values, weight_valid) where weight_valid in [0,1] accounts for
    out-of-bounds taps and, when `valid` [H, W] is given, invalid pixels —
    matching the MINF-aware interpolation in reference ICPUtil.h:26-110.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    dx = (u - x0)[..., None]
    dy = (v - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        vals = img[yc, xc]
        ok = inb
        if valid is not None:
            ok = ok & (valid[yc, xc] > 0)
        return vals, ok.astype(img.dtype)

    v00, m00 = gather(y0i, x0i)
    v01, m01 = gather(y0i, x0i + 1)
    v10, m10 = gather(y0i + 1, x0i)
    v11, m11 = gather(y0i + 1, x0i + 1)

    w00 = (1 - dx) * (1 - dy) * m00[..., None]
    w01 = dx * (1 - dy) * m01[..., None]
    w10 = (1 - dx) * dy * m10[..., None]
    w11 = dx * dy * m11[..., None]
    wsum = w00 + w01 + w10 + w11
    out = (v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11) / jnp.maximum(wsum, 1e-8)
    if squeeze:
        out = out[..., 0]
        wsum = wsum[..., 0]
    return out, wsum
