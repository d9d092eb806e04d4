"""Differentiable detector post-processing ops (pure jnp).

Re-derivations of the reference's TF1 det_tools ops
(reference: lf-net-release/det_tools.py — soft_nms_3d:772-787,
instance_normalization:789-804, non_max_suppression:806-837,
make_top_k_sparse_tensor:848-875, soft_max_and_argmax_1d:1707-1725,
soft_argmax_2d:1727-1750; spatial_transformer.py transformer_crop:23-160).
All static-shape, batched, TPU-friendly (window reductions instead of
tf.nn.max_pool3d/sparse tensors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm(x: jnp.ndarray, axes=(1, 2), eps: float = 1e-3) -> jnp.ndarray:
    """Non-parametric per-sample normalization (reference det_tools:789-804)."""
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


def _window_reduce(x: jnp.ndarray, ksize: int, op) -> jnp.ndarray:
    """Reduce over a ksize x ksize spatial window, same-padded: [B, H, W, C].

    One XLA reduce_window op (differentiable: max grads via
    select-and-scatter, sum via the transposed window) instead of a ksize^2
    unrolled shift chain — at the reference's sm_ksize=15 the unrolled form
    is a 225-op graph per call and dominates jit time once the training
    step differentiates through it.
    """
    ones = (1, 1, 1, 1)
    # rect windows are separable for both max and sum: two 1-D passes move
    # O(k^2) work to O(2k) — at sm_ksize=15 that is ~7x fewer reads
    dims_h = (1, ksize, 1, 1)
    dims_w = (1, 1, ksize, 1)
    if op is jnp.maximum:
        r = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims_h, ones, "SAME")
        return jax.lax.reduce_window(r, -jnp.inf, jax.lax.max, dims_w, ones, "SAME")
    r = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims_h, ones, "SAME")
    return jax.lax.reduce_window(r, 0.0, jax.lax.add, dims_w, ones, "SAME")


def soft_nms_3d(scale_logits: jnp.ndarray, ksize: int, com_strength: float = 1.0):
    """Softmax-style NMS over (scale, y, x) windows.

    scale_logits: [B, H, W, S].  The window spans ALL scales x ksize x ksize
    spatially (reference soft_nms_3d pools with kernel [S, k, k]).
    """
    # max over full scale axis + spatial window
    max_all_scales = jnp.max(scale_logits, axis=-1, keepdims=True)  # [B,H,W,1]
    max_maps = _window_reduce(max_all_scales, ksize, jnp.maximum)  # [B,H,W,1]
    exp_maps = jnp.exp(com_strength * (scale_logits - max_maps))
    sum_exp_scales = jnp.sum(exp_maps, axis=-1, keepdims=True)
    sum_ex = _window_reduce(sum_exp_scales, ksize, jnp.add)
    return exp_maps / (sum_ex + 1e-6)


def soft_max_and_argmax_1d(
    x: jnp.ndarray,
    index_values: jnp.ndarray,
    axis: int = -1,
    com1: float = 250.0,
    com2: float = 250.0,
):
    """Differentiable max and argmax along `axis` (reference det_tools:1707)."""
    mx = jnp.max(x, axis=axis, keepdims=True)
    e1 = jnp.exp(com1 * (x - mx))
    p1 = e1 / (jnp.sum(e1, axis=axis, keepdims=True) + 1e-8)
    e2 = jnp.exp(com2 * (x - mx))
    p2 = e2 / (jnp.sum(e2, axis=axis, keepdims=True) + 1e-8)
    soft_max = jnp.sum(x * p1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = -1
    soft_arg = jnp.sum(index_values.reshape(shape) * p2, axis=axis)
    return soft_max, soft_arg


def non_max_suppression_mask(x: jnp.ndarray, thresh: float, ksize: int):
    """Strict local-max mask over ksize window, [B, H, W, 1] -> bool."""
    work = jnp.where(x < thresh, 0.0, x)
    neigh = _window_reduce(work, ksize, jnp.maximum)
    # strict: center > every neighbor; emulate by comparing against window max
    # of the array with the center excluded is costly — use >= with a tiny
    # epsilon tiebreak identical to reference's strict > on distinct values.
    return work >= neigh


def end_of_frame_mask(H: int, W: int, radius: int, dtype=jnp.float32):
    v = jnp.arange(H)[:, None]
    u = jnp.arange(W)[None, :]
    ok = (v >= radius) & (v < H - radius) & (u >= radius) & (u < W - radius)
    return ok.astype(dtype)[None, :, :, None]


def top_k_keypoints(score_map: jnp.ndarray, k: int):
    """[B, H, W, 1] -> (kpts [B, k, 2] (x, y) float, scores [B, k], valid).

    Bucketed: lax.top_k over all H*W pixels is a near-sort (the measured
    hot spot of the LF-Net post-processing at 400^2); NMS peaks are >=3 px
    apart (nms_ksize=5 strict local maxima), so each 4x4 cell is first
    reduced to its best pixel and top_k runs over the 16x-smaller cell-winner
    map.  A cell can very rarely hold two surviving peaks (3 px apart on the
    diagonal) — the weaker one is dropped, which is the same spatial-
    bucketing prior the classical frontend applies on purpose."""
    B, H, W = score_map.shape[0], score_map.shape[1], score_map.shape[2]
    CELL = 4
    if H % CELL or W % CELL or (H // CELL) * (W // CELL) < k:
        flat = score_map.reshape(B, H * W)
        vals, idx = jax.lax.top_k(flat, k)
        x = (idx % W).astype(jnp.float32)
        y = (idx // W).astype(jnp.float32)
        return jnp.stack([x, y], axis=-1), vals, vals > 0.0
    hc, wc = H // CELL, W // CELL
    cells = score_map[..., 0].reshape(B, hc, CELL, wc, CELL)
    cells = cells.transpose(0, 1, 3, 2, 4).reshape(B, hc, wc, CELL * CELL)
    cell_best = jnp.max(cells, axis=-1)  # [B, hc, wc]
    cell_arg = jnp.argmax(cells, axis=-1).astype(jnp.int32)
    vals, cidx = jax.lax.top_k(cell_best.reshape(B, hc * wc), k)
    cidx = cidx.astype(jnp.int32)
    sub = jnp.take_along_axis(cell_arg.reshape(B, hc * wc), cidx, axis=1)
    x = ((cidx % wc) * CELL + sub % CELL).astype(jnp.float32)
    y = ((cidx // wc) * CELL + sub // CELL).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1), vals, vals > 0.0


def soft_argmax_2d(patches: jnp.ndarray, do_softmax: bool = True, com: float = 10.0):
    """[N, P, P, 1] -> [N, 2] soft-argmax offsets in [-1, 1] patch coords."""
    N, P = patches.shape[0], patches.shape[1]
    xs = jnp.linspace(-1.0, 1.0, P)
    gx = jnp.broadcast_to(xs[None, :], (P, P))
    gy = jnp.broadcast_to(xs[:, None], (P, P))
    m = patches[..., 0]
    if do_softmax:
        mx = jnp.max(m, axis=(1, 2), keepdims=True)
        e = jnp.exp(com * (m - mx))
        m = e / (jnp.sum(e, axis=(1, 2), keepdims=True) + 1e-8)
    dx = jnp.sum(gx[None] * m, axis=(1, 2))
    dy = jnp.sum(gy[None] * m, axis=(1, 2))
    return jnp.stack([dx, dy], axis=-1)


def transformer_crop(
    images: jnp.ndarray,  # [B, H, W, C]
    out_size: int,
    batch_inds: jnp.ndarray,  # [N] int32
    kpts_xy: jnp.ndarray,  # [N, 2] (x, y) pixel coords
    kpts_scale: jnp.ndarray | None = None,  # [N]
    kpts_ori: jnp.ndarray | None = None,  # [N, 2] (cos, sin)
):
    """Oriented, scaled bilinear patch extraction (reference
    spatial_transformer.transformer_crop)."""
    N = kpts_xy.shape[0]
    H, W = images.shape[1], images.shape[2]
    lin = jnp.linspace(-1.0, 1.0, out_size)
    gx = jnp.broadcast_to(lin[None, :], (out_size, out_size))
    gy = jnp.broadcast_to(lin[:, None], (out_size, out_size))
    grid = jnp.stack([gx.ravel(), gy.ravel()], axis=0)  # [2, P*P]

    theta = jnp.broadcast_to(jnp.eye(2), (N, 2, 2))
    if kpts_scale is not None:
        theta = theta * kpts_scale[:, None, None]
    if kpts_ori is not None:
        cos, sin = kpts_ori[:, 0], kpts_ori[:, 1]
        R = jnp.stack(
            [jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], axis=-2
        )
        theta = theta @ R
    tg = theta @ grid[None]  # [N, 2, P*P]
    x = tg[:, 0] * (out_size / 2.0) + kpts_xy[:, 0:1]
    y = tg[:, 1] * (out_size / 2.0) + kpts_xy[:, 1:2]

    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    dx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    dy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    # ONE gather instead of four: TPU gathers price per INDEX, not per byte,
    # so pre-shifting the image into a [B, H, W, 4C] quad view (p00, p01,
    # p10, p11 stacked on the channel axis) fetches all four bilinear taps
    # with a single N*P*P-index gather — 4x fewer indices on the 512x32x32
    # descriptor-patch crop (same trick as the dense term's bf16 gather
    # tables, solver/dense_p2p.py).
    C = images.shape[-1]
    B = images.shape[0]
    sx = jnp.concatenate([images[:, :, 1:], images[:, :, -1:]], axis=2)
    sy = jnp.concatenate([images[:, 1:], images[:, -1:]], axis=1)
    sxy = jnp.concatenate([sx[:, 1:], sx[:, -1:]], axis=1)
    quad = jnp.concatenate([images, sx, sy, sxy], axis=-1)  # [B, H, W, 4C]
    lin = (batch_inds[:, None] * H + y0) * W + x0  # [N, P*P]
    g = jnp.take(quad.reshape(B * H * W, 4 * C), lin, axis=0)  # [N, P*P, 4C]
    p00, p01 = g[..., :C], g[..., C : 2 * C]
    p10, p11 = g[..., 2 * C : 3 * C], g[..., 3 * C :]
    out = (
        p00 * (1 - dx) * (1 - dy)
        + p01 * dx * (1 - dy)
        + p10 * (1 - dx) * dy
        + p11 * dx * dy
    )
    return out.reshape(N, out_size, out_size, C)
