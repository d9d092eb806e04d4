"""Per-frame feature extraction: detector -> 3D lifting.

Mirrors the reference flow Lfnet::detectFeature + FeatureManager keypoint 3D
lookup (reference: src/FeatureManager.cpp:811-908 crops the mask ROI, resizes
to 400x400, queries the net, maps keypoints back, then reads each keypoint's
camera-space point/normal from the frame's cloud; kpts with invalid depth are
discarded when matching).

Two backends:
  * "classical" — Shi-Tomasi + patch descriptors on the full-resolution
    masked image (no crop needed; resolution is native).
  * "lfnet"     — the learned frontend on the ROI crop at cfg.input_size
    (frontend/lfnet.py), keypoints mapped back through the affine.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from bundletrack_tpu.config import FrontendConfig
from bundletrack_tpu.frontend.classical import harris_keypoints_and_descriptors
from bundletrack_tpu.frontend.interface import FrontendOutput
from bundletrack_tpu.ops.masks import mask_roi
from bundletrack_tpu.ops.resize import crop_resize_square, keypoints_to_original


class FrameFeatures(NamedTuple):
    """Keypoints lifted to 3D for one frame."""

    uv: jnp.ndarray  # [N, 2] pixel coords
    desc: jnp.ndarray  # [N, D]
    pts: jnp.ndarray  # [N, 3] camera-space
    normals: jnp.ndarray  # [N, 3]
    valid: jnp.ndarray  # [N]


def _lift_to_3d(out: FrontendOutput, points_map, normals_map, valid_map):
    H, W = valid_map.shape
    ui = jnp.clip(jnp.round(out.kpts_uv[:, 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(out.kpts_uv[:, 1]).astype(jnp.int32), 0, H - 1)
    pts = points_map[vi, ui]
    normals = normals_map[vi, ui]
    ok = out.valid & valid_map[vi, ui]
    return FrameFeatures(
        uv=out.kpts_uv,
        desc=out.desc,
        pts=jnp.where(ok[:, None], pts, 0.0),
        normals=jnp.where(ok[:, None], normals, 0.0),
        valid=ok,
    )


def extract_frame_features(
    gray: jnp.ndarray,  # [H, W] in [0, 1]
    mask: jnp.ndarray,  # [H, W] bool
    points_map: jnp.ndarray,  # [H, W, 3]
    normals_map: jnp.ndarray,  # [H, W, 3]
    valid_map: jnp.ndarray,  # [H, W] bool
    cfg: FrontendConfig,
    lfnet_apply=None,  # callable(crop [S,S,1]) -> FrontendOutput in crop coords
) -> FrameFeatures:
    if cfg.kind == "classical" or lfnet_apply is None:
        out = harris_keypoints_and_descriptors(
            gray,
            mask,
            top_k=cfg.top_k,
            sigma=cfg.harris_sigma,
            z_map=points_map[..., 2],
            patch_z0=cfg.harris_patch_z0,
        )
        return _lift_to_3d(out, points_map, normals_map, valid_map)

    # learned path: ROI crop -> net -> map back.  The crop is MASKED first:
    # the reference invalidates every pixel outside the segmentation before
    # the ROI reaches LF-Net (Frame::invalidatePixelsByMask zeroes gray/
    # color/depth, src/Frame.cpp:317,342-358), so background texture never
    # competes for top-K detections.
    umin, umax, vmin, vmax, nonempty = mask_roi(mask)
    crop, scale, ou, ov = crop_resize_square(
        jnp.where(mask, gray, 0.0), (umin, umax, vmin, vmax), cfg.input_size
    )
    out = lfnet_apply(crop[..., None])
    kpts_orig = keypoints_to_original(out.kpts_uv, scale, ou, ov)
    # keep only keypoints inside the mask
    H, W = mask.shape
    ui = jnp.clip(jnp.round(kpts_orig[:, 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(kpts_orig[:, 1]).astype(jnp.int32), 0, H - 1)
    ok = out.valid & mask[vi, ui] & nonempty
    out = FrontendOutput(
        kpts_uv=kpts_orig, scores=out.scores, desc=out.desc, valid=ok
    )
    return _lift_to_3d(out, points_map, normals_map, valid_map)
