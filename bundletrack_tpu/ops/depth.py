"""Depth-map preprocessing: erosion and depth-aware bilateral filtering.

TPU-native rewrite of the reference CUDA kernels
(reference: src/cuda/CUDAImageUtil.cu:676-733 erodeDepthMap,
735-809 gaussFilterDepthMap; called from src/Frame.cpp:152-180 processDepth).

Design: both filters are small-stencil ops. Rather than a scalar loop per
pixel (SIMT style), each is expressed as a stack of shifted images reduced on
the VPU — XLA fuses the shifts+reduction into one pass over HBM. Batched over
leading dims via vmap-compatible broadcasting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bundletrack_tpu.config import DepthProcessingConfig


def _shifted(img: jnp.ndarray, dy: int, dx: int, fill: float = 0.0) -> jnp.ndarray:
    """Shift [..., H, W] by (dy, dx) with constant fill (no wraparound)."""
    out = jnp.roll(img, shift=(dy, dx), axis=(-2, -1))
    H, W = img.shape[-2], img.shape[-1]
    v = jnp.arange(H)[:, None]
    u = jnp.arange(W)[None, :]
    ok_y = (v - dy >= 0) & (v - dy < H) if dy != 0 else jnp.ones((H, 1), bool)
    ok_x = (u - dx >= 0) & (u - dx < W) if dx != 0 else jnp.ones((1, W), bool)
    return jnp.where(ok_y & ok_x, out, fill)


def erode_depth(
    depth: jnp.ndarray,
    radius: int = 1,
    diff: float = 0.001,
    ratio: float = 0.8,
) -> jnp.ndarray:
    """Zero out depth pixels whose neighborhood disagrees.

    A pixel survives only if the fraction of valid neighbors within `diff`
    meters stays above (1 - ratio) — i.e. if more than `ratio` of the window
    differs (or is invalid), depth is set to 0
    (reference erodeDepthMap, CUDAImageUtil.cu:676-733).
    """
    valid = depth > 0.1
    agree = jnp.zeros_like(depth)
    total = 0
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nb = _shifted(depth, dy, dx)
            nb_valid = nb > 0.1
            close = jnp.abs(nb - depth) < diff
            agree = agree + (nb_valid & close).astype(depth.dtype)
            total += 1
    frac_bad = 1.0 - agree / float(total)
    keep = valid & (frac_bad <= ratio)
    return jnp.where(keep, depth, 0.0)


def bilateral_filter_depth(
    depth: jnp.ndarray,
    radius: int = 2,
    sigma_d: float = 2.0,
    sigma_r: float = 100000.0,
) -> jnp.ndarray:
    """Depth-aware bilateral (Gaussian) filter.

    Spatial Gaussian x range Gaussian over valid neighbors; invalid centers
    stay invalid (reference gaussFilterDepthMap, CUDAImageUtil.cu:735-809).
    """
    valid = depth > 0.1
    acc = jnp.zeros_like(depth)
    wacc = jnp.zeros_like(depth)
    inv_2sd = 0.5 / (sigma_d * sigma_d)
    inv_2sr = 0.5 / (sigma_r * sigma_r)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nb = _shifted(depth, dy, dx)
            nb_valid = nb > 0.1
            w_spatial = jnp.exp(-(dy * dy + dx * dx) * inv_2sd)
            d = nb - depth
            w = w_spatial * jnp.exp(-(d * d) * inv_2sr) * nb_valid.astype(depth.dtype)
            acc = acc + w * nb
            wacc = wacc + w
    out = acc / jnp.maximum(wacc, 1e-8)
    return jnp.where(valid & (wacc > 1e-8), out, 0.0)


def process_depth(depth: jnp.ndarray, cfg: DepthProcessingConfig) -> jnp.ndarray:
    """Full preprocessing chain: clamp -> erode -> 2x bilateral.

    Reference Frame::processDepth runs erode then two bilateral passes
    (src/Frame.cpp:166-168); depths outside [znear, zfar] are zeroed
    (Utils.cpp:49-68 zeroes < 0.1 m).
    """
    depth = jnp.where((depth < cfg.znear) | (depth > cfg.zfar), 0.0, depth)
    e = cfg.erode
    depth = erode_depth(depth, e.radius, e.diff, e.ratio)
    b = cfg.bilateral_filter
    depth = bilateral_filter_depth(depth, b.radius, b.sigma_d, b.sigma_r)
    depth = bilateral_filter_depth(depth, b.radius, b.sigma_d, b.sigma_r)
    return depth
