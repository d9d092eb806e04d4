"""Intensity map + spatial derivatives for the photometric dense term.

Reference: src/cuda/CUDAImageUtil.cu:153-309 (color->intensity conversion,
resampling, and intensity derivative kernels feeding the dense color
residual of BuildDenseSystem_Kernel, SolverBundling.cu:199-227).
"""

from __future__ import annotations

import jax.numpy as jnp


def intensity_gradients(intensity: jnp.ndarray, valid: jnp.ndarray):
    """Central-difference gradients (d/du, d/dv) of [H, W] intensity.

    Pixels adjacent to invalid depth get zero gradient (the reference's
    derivative kernels skip MINF neighbors).
    """
    gx = jnp.zeros_like(intensity)
    gx = gx.at[:, 1:-1].set(0.5 * (intensity[:, 2:] - intensity[:, :-2]))
    gy = jnp.zeros_like(intensity)
    gy = gy.at[1:-1, :].set(0.5 * (intensity[2:, :] - intensity[:-2, :]))
    v = valid.astype(intensity.dtype)
    ok = jnp.ones_like(v)
    ok = ok * jnp.roll(v, 1, axis=1) * jnp.roll(v, -1, axis=1)
    ok = ok * jnp.roll(v, 1, axis=0) * jnp.roll(v, -1, axis=0)
    return gx * ok, gy * ok
