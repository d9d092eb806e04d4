"""Weight-free classical frontend: Shi-Tomasi corners + normalized patches.

A deterministic, training-free stand-in for the learned LF-Net frontend with
the same output contract (500-ish keypoints, 256-d L2-normalized
descriptors — reference serves exactly that shape,
lf-net-release/run_server.py:77,171).  Used for synthetic end-to-end tests
and as a fallback when no LF-Net weights are available; the learned frontend
lives in frontend/lfnet.py.

Not rotation-invariant by design: BundleTrack matches temporally adjacent or
rotation-gated keyframe pairs (keyframe admission requires >=10 deg rotation
spread but matching pairs still share viewpoint), and the geometric gates do
the heavy pruning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bundletrack_tpu.frontend.interface import FrontendOutput


def _gauss_kernel(sigma: float, radius: int):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _sep_conv(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D convolution of [H, W] with 1D kernel k (same padding)."""
    r = (k.shape[0] - 1) // 2
    pad = jnp.pad(img, ((r, r), (r, r)), mode="edge")
    out = jnp.zeros_like(img)
    for i in range(k.shape[0]):
        out = out + k[i] * pad[i : i + img.shape[0], r : r + img.shape[1]]
    out2 = jnp.zeros_like(img)
    pad = jnp.pad(out, ((r, r), (r, r)), mode="edge")
    for i in range(k.shape[0]):
        out2 = out2 + k[i] * pad[r : r + img.shape[0], i : i + img.shape[1]]
    return out2


def _gradients(img: jnp.ndarray):
    gx = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = jnp.zeros_like(img)
    gy = gy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy


def shi_tomasi_response(img: jnp.ndarray, sigma: float = 1.5) -> jnp.ndarray:
    """Min-eigenvalue corner response of the smoothed structure tensor."""
    gx, gy = _gradients(img)
    k = _gauss_kernel(sigma, max(1, int(2 * sigma)))
    Ixx = _sep_conv(gx * gx, k)
    Iyy = _sep_conv(gy * gy, k)
    Ixy = _sep_conv(gx * gy, k)
    tr = Ixx + Iyy
    det = Ixx * Iyy - Ixy * Ixy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    return tr / 2.0 - disc  # lambda_min


def _nms(resp: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """Strict local-maximum mask (reference det_tools.non_max_suppression)."""
    r = ksize // 2
    neg_inf = jnp.asarray(-jnp.inf, resp.dtype)
    best = resp
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            shifted = jnp.roll(resp, (dy, dx), axis=(0, 1))
            best = jnp.maximum(best, shifted)
    return resp >= best


def _extract_patches(img: jnp.ndarray, kpts_uv: jnp.ndarray, patch: int = 16):
    """Bilinear patch extraction [N, patch, patch] around keypoints."""
    N = kpts_uv.shape[0]
    H, W = img.shape
    offs = jnp.arange(patch, dtype=jnp.float32) - (patch - 1) / 2.0
    gu = kpts_uv[:, None, None, 0] + offs[None, None, :]
    gv = kpts_uv[:, None, None, 1] + offs[None, :, None]
    u0 = jnp.clip(jnp.floor(gu).astype(jnp.int32), 0, W - 2)
    v0 = jnp.clip(jnp.floor(gv).astype(jnp.int32), 0, H - 2)
    du = jnp.clip(gu - u0, 0.0, 1.0)
    dv = jnp.clip(gv - v0, 0.0, 1.0)
    p00 = img[v0, u0]
    p01 = img[v0, u0 + 1]
    p10 = img[v0 + 1, u0]
    p11 = img[v0 + 1, u0 + 1]
    return (
        p00 * (1 - du) * (1 - dv)
        + p01 * du * (1 - dv)
        + p10 * (1 - du) * dv
        + p11 * du * dv
    )


def _extract_patches_int(img: jnp.ndarray, kpts_uv: jnp.ndarray, patch: int = 16):
    """Patch extraction [N, patch, patch] at integer keypoint centers.

    Classical keypoints sit on pixel centers (they come from a flat argmax),
    so one integer tap per pixel suffices — 4x fewer gather indices than
    bilinear, and TPU gathers price per index, not per byte."""
    H, W = img.shape
    offs = jnp.arange(patch, dtype=jnp.int32) - (patch - 1) // 2
    u0 = jnp.round(kpts_uv[:, 0]).astype(jnp.int32)
    v0 = jnp.round(kpts_uv[:, 1]).astype(jnp.int32)
    gu = jnp.clip(u0[:, None, None] + offs[None, None, :], 0, W - 1)
    gv = jnp.clip(v0[:, None, None] + offs[None, :, None], 0, H - 1)
    return jnp.take(img.reshape(-1), gv * W + gu)


def _extract_patches_depth_scaled(
    img: jnp.ndarray,
    kpts_uv: jnp.ndarray,
    z: jnp.ndarray,  # [N] keypoint depth (<=0 invalid -> unit spacing)
    patch: int,
    z0: float,
):
    """Scale-NORMALIZED patches: bilinear sampling with per-keypoint pixel
    spacing z0/z, so every patch covers a constant PHYSICAL surface extent
    regardless of camera range.  This is what makes the weight-free
    descriptor survive scale change — the RGB-D analog of LF-Net's learned
    scale pyramid (reference run_server.py:70-77 serves a pyramid for the
    same reason; an RGB frontend must estimate scale, an RGB-D one can read
    it from depth)."""
    H, W = img.shape
    step = jnp.where(z > 1e-6, z0 / jnp.maximum(z, 1e-6), 1.0)
    step = jnp.clip(step, 0.2, 5.0)  # keep degenerate depths sane
    offs = jnp.arange(patch, dtype=jnp.float32) - (patch - 1) / 2.0
    gu = kpts_uv[:, None, None, 0] + step[:, None, None] * offs[None, None, :]
    gv = kpts_uv[:, None, None, 1] + step[:, None, None] * offs[None, :, None]
    u0 = jnp.clip(jnp.floor(gu).astype(jnp.int32), 0, W - 2)
    v0 = jnp.clip(jnp.floor(gv).astype(jnp.int32), 0, H - 2)
    du = jnp.clip(gu - u0, 0.0, 1.0)
    dv = jnp.clip(gv - v0, 0.0, 1.0)
    flat = img.reshape(-1)
    l00 = v0 * W + u0
    p00 = jnp.take(flat, l00)
    p01 = jnp.take(flat, l00 + 1)
    p10 = jnp.take(flat, l00 + W)
    p11 = jnp.take(flat, l00 + W + 1)
    return (
        p00 * (1 - du) * (1 - dv)
        + p01 * du * (1 - dv)
        + p10 * (1 - du) * dv
        + p11 * du * dv
    )


def harris_keypoints_and_descriptors(
    img: jnp.ndarray,  # [H, W] grayscale in [0, 1]
    mask: jnp.ndarray,  # [H, W] bool detection region
    top_k: int = 512,
    patch: int = 16,
    border: int = 10,
    sigma: float = 1.5,
    min_response: float = 1e-9,
    z_map: jnp.ndarray | None = None,  # [H, W] depth for scale normalization
    patch_z0: float = 0.0,  # >0: depth-scaled patches, unit spacing at z0
) -> FrontendOutput:
    """Detect top-K corners and build 256-d normalized-patch descriptors.

    The response floor is permissive (1e-9): smooth low-contrast surfaces
    (e.g. fBm texture seen from afar) legitimately produce corner responses
    around 1e-7 — the old 1e-7 floor starved the matcher of keypoints
    (measured: 51 valid kpts on the r4 scale-change pass, every frame
    FAILing with <5 gated inliers, while the LF-Net path survived on
    keypoint count alone).  Weak corners that are noise get pruned by the
    mutual-NN + geometric gates + RANSAC downstream, not here."""
    H, W = img.shape
    resp = shi_tomasi_response(img, sigma)
    peak = _nms(resp)
    u = jnp.arange(W)[None, :]
    v = jnp.arange(H)[:, None]
    inb = (u >= border) & (u < W - border) & (v >= border) & (v < H - border)
    score_map = jnp.where(
        peak & mask & inb & (resp > min_response), resp, -jnp.inf
    )

    # Bucketed top-K: lax.top_k over all H*W pixels is a near-sort and was a
    # measured hot spot at 480x640.  NMS peaks are sparse, so reduce each
    # CELL x CELL cell to its best peak first (vectorized max + argmax), then
    # top_k over the ~H*W/CELL^2 cell winners.  Side effect: at most one
    # keypoint per cell — a spatial-bucketing prior that tracking frontends
    # use on purpose (more uniform coverage than raw score ranking).
    # CELL=4 (not 8): when the object recedes, the mask covers few cells and
    # the per-cell cap starves the matcher exactly when keypoints are
    # scarcest (measured on the 2x scale pass: 65->71 AUC going 8->4); the
    # top_k input is still 16x smaller than the full-image near-sort.
    CELL = 4
    while CELL > 1 and ((H + CELL - 1) // CELL) * ((W + CELL - 1) // CELL) < top_k:
        CELL //= 2  # small images: finer cells so candidates >= top_k
    Hp = (H + CELL - 1) // CELL * CELL
    Wp = (W + CELL - 1) // CELL * CELL
    sm = jnp.full((Hp, Wp), -jnp.inf, score_map.dtype).at[:H, :W].set(score_map)
    cells = sm.reshape(Hp // CELL, CELL, Wp // CELL, CELL).transpose(0, 2, 1, 3)
    cells = cells.reshape(Hp // CELL, Wp // CELL, CELL * CELL)
    cell_best = jnp.max(cells, axis=-1)  # [hc, wc]
    cell_arg = jnp.argmax(cells, axis=-1).astype(jnp.int32)
    scores, cidx = jax.lax.top_k(cell_best.reshape(-1), top_k)
    cidx = cidx.astype(jnp.int32)
    wc = Wp // CELL
    sub = jnp.take(cell_arg.reshape(-1), cidx)
    ku = ((cidx % wc) * CELL + sub % CELL).astype(jnp.float32)
    kv = ((cidx // wc) * CELL + sub // CELL).astype(jnp.float32)
    valid = jnp.isfinite(scores)
    kpts = jnp.stack([ku, kv], axis=-1)

    if patch_z0 > 0.0 and z_map is not None:
        ui = jnp.clip(jnp.round(ku).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(kv).astype(jnp.int32), 0, H - 1)
        z_kp = jnp.take(z_map.reshape(-1), vi * W + ui)
        patches = _extract_patches_depth_scaled(img, kpts, z_kp, patch, patch_z0)
    else:
        patches = _extract_patches_int(img, kpts, patch)  # [N, p, p]
    flatp = patches.reshape(top_k, -1)
    mu = jnp.mean(flatp, axis=-1, keepdims=True)
    sd = jnp.std(flatp, axis=-1, keepdims=True)
    desc = (flatp - mu) / jnp.maximum(sd, 1e-6)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-6)
    desc = jnp.where(valid[:, None], desc, 0.0)
    return FrontendOutput(
        kpts_uv=jnp.where(valid[:, None], kpts, 0.0),
        scores=jnp.where(valid, scores, -jnp.inf),
        desc=desc,
        valid=valid,
    )
