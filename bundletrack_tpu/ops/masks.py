"""Segmentation-mask utilities: dilation, ROI, component filling.

Reference: Frame::segmentationByMaskFile (src/Frame.cpp:236-319) — reads the
VOS mask, optionally keeps the largest connected component + convex-hull fill
(NOCS path), dilates 5x5, invalidates out-of-mask pixels and computes the ROI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dilate_mask(mask: jnp.ndarray, iterations: int = 1, ksize: int = 5) -> jnp.ndarray:
    """Binary dilation with a ksize x ksize structuring element."""
    m = mask.astype(jnp.float32)
    r = ksize // 2
    for _ in range(iterations):
        acc = jnp.zeros_like(m)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                acc = acc + jnp.roll(m, (dy, dx), axis=(-2, -1))
        m = (acc > 0).astype(jnp.float32)
    return m > 0


def mask_roi(mask: jnp.ndarray):
    """Bounding box (umin, umax, vmin, vmax) of a binary mask; full image if empty.

    Returns int32 scalars plus a bool `nonempty` (reference computes ROI in
    Frame::updateRoi, src/Frame.cpp:324-374; empty ROI flags FAIL).
    """
    H, W = mask.shape[-2], mask.shape[-1]
    any_col = jnp.any(mask, axis=-2)
    any_row = jnp.any(mask, axis=-1)
    u_idx = jnp.arange(W)
    v_idx = jnp.arange(H)
    big = jnp.int32(1 << 30)
    umin = jnp.min(jnp.where(any_col, u_idx, big))
    umax = jnp.max(jnp.where(any_col, u_idx, -1))
    vmin = jnp.min(jnp.where(any_row, v_idx, big))
    vmax = jnp.max(jnp.where(any_row, v_idx, -1))
    nonempty = jnp.any(mask)
    umin = jnp.where(nonempty, umin, 0)
    vmin = jnp.where(nonempty, vmin, 0)
    umax = jnp.where(nonempty, umax, W - 1)
    vmax = jnp.where(nonempty, vmax, H - 1)
    return umin, umax, vmin, vmax, nonempty


def largest_component_fill(mask: jnp.ndarray, num_iters: int = 64) -> jnp.ndarray:
    """Approximate largest-connected-component extraction via label diffusion.

    The reference's NOCS path keeps the largest CC then convex-hull fills
    (src/Frame.cpp:262-300, OpenCV connectedComponents).  Classic CC labeling
    is sequential; on TPU we run iterative min-label diffusion (4-neighborhood)
    for `num_iters` rounds — exact when every component's diameter is below
    num_iters — then keep the component with the largest pixel count.
    """
    H, W = mask.shape[-2], mask.shape[-1]
    idx = (jnp.arange(H)[:, None] * W + jnp.arange(W)[None, :]).astype(jnp.int32)
    big = jnp.int32(H * W + 1)
    labels = jnp.where(mask, idx, big)

    def body(_, lab):
        nb = jnp.minimum(
            jnp.minimum(
                jnp.roll(lab, 1, axis=-2).at[..., 0, :].set(big),
                jnp.roll(lab, -1, axis=-2).at[..., -1, :].set(big),
            ),
            jnp.minimum(
                jnp.roll(lab, 1, axis=-1).at[..., :, 0].set(big),
                jnp.roll(lab, -1, axis=-1).at[..., :, -1].set(big),
            ),
        )
        return jnp.where(mask, jnp.minimum(lab, nb), big)

    labels = jax.lax.fori_loop(0, num_iters, body, labels)
    # Count pixels per root label via one-hot over flattened bincount-free path:
    flat = labels.reshape(-1)
    counts = jnp.zeros((H * W + 2,), jnp.int32).at[jnp.clip(flat, 0, H * W + 1)].add(1)
    counts = counts.at[big].set(0)
    best = jnp.argmax(counts)
    return labels == best
