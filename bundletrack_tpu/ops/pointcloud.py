"""Depth -> camera-space cloud + normals.

Reference: src/cuda/CUDAImageUtil.cu:310-341
convertDepthFloatToCameraSpaceFloat4 and 342-427 computeNormals (cross-product
of central differences), called from Frame::depthToCloudAndNormals
(src/Frame.cpp:182-233).  Normals here point toward the camera (-z half-space),
matching the reference's orientation convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from bundletrack_tpu.geometry.camera import unproject


def compute_normals(points: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Cross-product normals from a structured point map.

    Args:
      points: [H, W, 3] camera-space points.
      valid: [H, W] bool.

    Returns:
      [H, W, 3] unit normals (zero where undefined).
    """
    # central differences via shifts
    right = jnp.roll(points, -1, axis=1)
    left = jnp.roll(points, 1, axis=1)
    down = jnp.roll(points, -1, axis=0)
    up = jnp.roll(points, 1, axis=0)
    v_r = jnp.roll(valid, -1, axis=1)
    v_l = jnp.roll(valid, 1, axis=1)
    v_d = jnp.roll(valid, -1, axis=0)
    v_u = jnp.roll(valid, 1, axis=0)
    H, W = valid.shape[-2:]
    border = jnp.zeros((H, W), bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)

    dx = right - left
    dy = down - up
    n = jnp.cross(dy, dx)  # orientation so n faces the camera after flip below
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    ok = (v_r & v_l & v_d & v_u & valid & (~border) & (norm[..., 0] > 1e-10))
    n = n / jnp.maximum(norm, 1e-10)
    # Make normals face the camera: n . p < 0 (camera at origin looking +z)
    flip = jnp.sum(n * points, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    return jnp.where(ok[..., None], n, 0.0)


def depth_to_cloud_and_normals(depth: jnp.ndarray, K: jnp.ndarray):
    """Returns (points [H,W,3], normals [H,W,3], valid [H,W])."""
    valid = depth > 0.1
    pts = unproject(depth, K)
    pts = jnp.where(valid[..., None], pts, 0.0)
    normals = compute_normals(pts, valid)
    valid = valid & (jnp.linalg.norm(normals, axis=-1) > 0.5)
    return pts, normals, valid


def downsample_nearest(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Stride-subsample [..., H, W, ...] by `factor` along H and W.

    Reference CUDACache::storeFrame resamples frames to low res before the
    dense solver term (src/cuda/CUDACache.cpp:76-88); nearest keeps depth
    edges crisp (no mixing across discontinuities).
    """
    if img.ndim >= 3 and img.shape[-1] in (1, 2, 3, 4):  # channel-last
        return img[..., ::factor, ::factor, :]
    return img[..., ::factor, ::factor]


# ---------------------------------------------------------------------------
# Host-side (numpy) cloud utilities — model clouds at load time, not hot path
# ---------------------------------------------------------------------------


def voxel_downsample(points, voxel_size: float):
    """Voxel-grid downsample an [N, 3] cloud to per-voxel centroids.

    Equivalent of the reference's PCL VoxelGrid wrapper
    Utils::downsamplePointCloud (src/Utils.cpp:133-141), used on object-model
    clouds at dataset load (src/DataLoader.cpp:92,316 with vox_size=0.015).
    Host numpy: runs once per sequence, off the accelerator.
    """
    import numpy as np

    pts = np.asarray(points, np.float64)
    if len(pts) == 0:
        return pts.astype(np.float32)
    keys = np.floor(pts / voxel_size).astype(np.int64)
    # lexicographic voxel id -> group by sorting
    order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    keys_s = keys[order]
    pts_s = pts[order]
    new_group = np.any(np.diff(keys_s, axis=0) != 0, axis=1)
    starts = np.concatenate([[0], np.nonzero(new_group)[0] + 1])
    sums = np.add.reduceat(pts_s, starts, axis=0)
    counts = np.diff(np.concatenate([starts, [len(pts_s)]]))
    return (sums / counts[:, None]).astype(np.float32)


def statistical_outlier_removal(points, num_neighbors: int = 30, std_mul: float = 3.0):
    """Drop points whose mean k-NN distance exceeds mean + std_mul * std.

    Equivalent of PCL StatisticalOutlierRemoval (reference includes the
    filter, src/Utils.h:106; configured by depth_processing.outlier_removal
    {num, std_mul}, config_ycbineoat.yml:18-20).  Host numpy, brute-force —
    intended for model clouds / offline cleanup, not the per-frame path.

    Returns (filtered_points, keep_mask).
    """
    import numpy as np

    pts = np.asarray(points, np.float32)
    n = len(pts)
    if n <= num_neighbors:
        return pts, np.ones(n, bool)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    k = min(num_neighbors, n - 1)
    knn = np.sqrt(np.partition(d2, k - 1, axis=1)[:, :k])
    mean_d = knn.mean(axis=1)
    mu, sd = mean_d.mean(), mean_d.std()
    keep = mean_d <= mu + std_mul * sd
    return pts[keep], keep
