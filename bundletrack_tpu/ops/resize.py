"""Resize / ROI-crop ops for the keypoint frontend.

The reference crops the frame to the mask ROI, pads to square, resizes to
400x400, runs the keypoint net, then maps keypoints back through the inverse
affine chain (reference: Lfnet::detectFeature, src/FeatureManager.cpp:811-908).
Here the crop+resize is a single affine resample expressed with
`jax.image.scale_and_translate`, which accepts *traced* scales — so a
dynamic ROI still compiles to one static-shape XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Plain bilinear resize of [H, W] or [H, W, C]."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    out = jax.image.resize(
        img, (out_hw[0], out_hw[1], img.shape[-1]), method="bilinear"
    )
    return out[..., 0] if squeeze else out


def crop_resize_square(img: jnp.ndarray, roi, out_size: int):
    """Crop ROI (umin, umax, vmin, vmax), pad to square, resize to out_size.

    Returns (resized [out, out, C], scale, offset_u, offset_v) where original
    pixel = keypoint_px / scale + offset.  All of roi may be traced values.
    """
    umin, umax, vmin, vmax = roi
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    w = (umax - umin + 1).astype(jnp.float32)
    h = (vmax - vmin + 1).astype(jnp.float32)
    side = jnp.maximum(w, h)
    scale = out_size / side  # output px per input px
    translate_u = -umin.astype(jnp.float32) * scale
    translate_v = -vmin.astype(jnp.float32) * scale
    out = jax.image.scale_and_translate(
        img,
        (out_size, out_size, img.shape[-1]),
        spatial_dims=(0, 1),
        scale=jnp.stack([scale, scale]),
        translation=jnp.stack([translate_v, translate_u]),
        method="linear",
    )
    if squeeze:
        out = out[..., 0]
    return out, scale, umin.astype(jnp.float32), vmin.astype(jnp.float32)


def keypoints_to_original(kpts_uv: jnp.ndarray, scale, offset_u, offset_v):
    """Map keypoints detected in the crop back to original image coords.

    Inverse of crop_resize_square (reference maps LF-Net keypoints back
    through the affine chain at FeatureManager.cpp:884-898).
    """
    u = kpts_uv[..., 0] / scale + offset_u
    v = kpts_uv[..., 1] / scale + offset_v
    return jnp.stack([u, v], axis=-1)
