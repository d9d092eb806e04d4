"""Rigid alignment (Procrustes / Kabsch) — batched, branch-free.

TPU-native replacements for the reference's two rigid solvers:
  * host Kabsch with SVD reflection fix (reference src/Utils.cpp:180-218
    solveRigidTransformBetweenPoints),
  * the giant branch-free device SVD used per RANSAC trial (reference
    src/cuda/cuda_ransac.cu:54-1102 svd + procrustesKernel).

Here the RANSAC hypothesis path uses a closed-form orthonormal-frame
construction over 3-point samples (`rigid_from_three_points`) — exact for
congruent triangles, no eigensolver, pure VPU math that vmaps over
[pairs, trials] — while the refit path uses weighted Kabsch via batched 3x3
SVD on the MXU-friendly cross-covariance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_einsum = functools.partial(jnp.einsum, precision="highest")
_mm = functools.partial(jnp.matmul, precision="highest")

_EPS = 1e-12


def _weighted_centroid(pts: jnp.ndarray, w: jnp.ndarray):
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    c = jnp.sum(pts * w[..., None], axis=-2) / jnp.maximum(wsum, _EPS)
    return c, wsum[..., 0]


def kabsch(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
):
    """Weighted rigid alignment: find T with dst ~= R @ src + t.

    Args:
      src, dst: [..., N, 3].
      weights: [..., N] nonnegative; None = uniform.

    Returns:
      [..., 4, 4] transform with proper rotation (det=+1 reflection fix as in
      reference Utils.cpp:205-211).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    c_src, _ = _weighted_centroid(src, weights)
    c_dst, _ = _weighted_centroid(dst, weights)
    src_c = src - c_src[..., None, :]
    dst_c = dst - c_dst[..., None, :]
    H = _einsum("...ni,...n,...nj->...ij", src_c, weights, dst_c)
    U, _, Vt = jnp.linalg.svd(H)
    # R maps src -> dst: R = V diag(1,1,det) U^T
    det = jnp.linalg.det(_mm(jnp.swapaxes(Vt, -1, -2), jnp.swapaxes(U, -1, -2)))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = _einsum("...ji,...j,...kj->...ik", Vt, D, U)
    t = c_dst - _einsum("...ij,...j->...i", R, c_src)
    T = jnp.zeros(src.shape[:-2] + (4, 4), dtype=src.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def _triangle_frame(p: jnp.ndarray):
    """Orthonormal frame [..., 3, 3] (rows = basis) from 3 points [..., 3, 3]."""
    e1 = p[..., 1, :] - p[..., 0, :]
    e2 = p[..., 2, :] - p[..., 0, :]
    n1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), _EPS)
    e2p = e2 - jnp.sum(e2 * n1, axis=-1, keepdims=True) * n1
    n2 = e2p / jnp.maximum(jnp.linalg.norm(e2p, axis=-1, keepdims=True), _EPS)
    n3 = jnp.cross(n1, n2)
    return jnp.stack([n1, n2, n3], axis=-2)


def rigid_from_three_points(src: jnp.ndarray, dst: jnp.ndarray):
    """Closed-form rigid transform from 3-point samples (dst ~= R src + t).

    Branch-free, no SVD/eigensolver — ideal per-trial math for batched RANSAC
    on the VPU.  Exact when the two triangles are congruent; degenerate
    (collinear) samples produce some valid rotation and are rejected later by
    inlier scoring, mirroring how the reference rejects invalid models
    (cuda_ransac.cu procrustesKernel R-validity check).

    Returns ([..., 4, 4] transform, [...,] validity flag).
    """
    Fs = _triangle_frame(src)
    Fd = _triangle_frame(dst)
    # R maps src-frame to dst-frame: R = Fd^T @ Fs
    R = _mm(jnp.swapaxes(Fd, -1, -2), Fs)
    c_src = jnp.mean(src, axis=-2)
    c_dst = jnp.mean(dst, axis=-2)
    t = c_dst - _einsum("...ij,...j->...i", R, c_src)
    T = jnp.zeros(src.shape[:-2] + (4, 4), dtype=src.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    # Validity: triangles non-degenerate (area above epsilon)
    def area(p):
        return jnp.linalg.norm(
            jnp.cross(p[..., 1, :] - p[..., 0, :], p[..., 2, :] - p[..., 0, :]),
            axis=-1,
        )

    valid = (area(src) > 1e-10) & (area(dst) > 1e-10)
    return T, valid


def umeyama_rigid(src: jnp.ndarray, dst: jnp.ndarray, weights=None):
    """Alias for weighted Kabsch without scale (reference uses no scale)."""
    return kabsch(src, dst, weights)
