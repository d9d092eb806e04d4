"""Sparse feature-correspondence residuals and normal-equation blocks.

TPU-native rewrite of the reference's Lie-space sparse term
(reference: src/cuda/Solver/SolverBundlingEquationsLie.h — evalFDevice:41-56
residual r = T_i p_i - T_j p_j; evalMinusJTFDevice:60-137 builds -J^T F with
Huber weights; applyJDevice/applyJTDevice:140-211 matrix-free products), and
of the EntryJ wire format (src/cuda/SIFTImageManager.h:44-59).

Instead of warp-reduced atomics scattering into per-variable slots
(reference SolverBundling.cu Kernel1a:704-726), residual Jacobian blocks are
contracted into per-pair 6x6 normal-equation blocks with einsums (MXU) and
scatter-added into the [K, K, 6, 6] block matrix with static pair indices.

Left-multiplicative convention: T_i <- exp(delta_i) T_i, delta = [t, w];
d(T_i p)/d delta_i = [ I | -hat(T_i p) ].
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundletrack_tpu.geometry.robust import huber
from bundletrack_tpu.geometry.se3 import hat, transform_points

_einsum = functools.partial(jnp.einsum, precision="highest")


class SparseCorres(NamedTuple):
    """Padded global correspondence set over a K-frame graph (EntryJ analog).

    pair_i/pair_j: [P] frame indices (static enumeration of the pair axis).
    pts_i/pts_j:   [P, M, 3] camera-frame points of matched keypoints.
    valid:         [P, M] bool.
    """

    pair_i: jnp.ndarray
    pair_j: jnp.ndarray
    pts_i: jnp.ndarray
    pts_j: jnp.ndarray
    valid: jnp.ndarray


def sparse_residuals(poses: jnp.ndarray, corres: SparseCorres):
    """Residuals r = T_i p_i - T_j p_j and transformed points.

    Returns (r [P, M, 3], qi [P, M, 3], qj [P, M, 3]).
    """
    Ti = poses[corres.pair_i]  # [P, 4, 4]
    Tj = poses[corres.pair_j]
    qi = transform_points(Ti, corres.pts_i)
    qj = transform_points(Tj, corres.pts_j)
    r = qi - qj
    return r, qi, qj


def _pair_blocks(r, qi, qj, w):
    """Per-pair normal-equation blocks from residuals.

    J_i = [I | -hat(qi)]  (3x6),  J_j = -[I | -hat(qj)].
    Contractions run over the match axis on the MXU.

    Returns (Hii, Hjj, Hij [P,6,6], gi, gj [P,6], cost [P]).
    """
    P, M = r.shape[0], r.shape[1]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (P, M, 3, 3))
    Ji = jnp.concatenate([eye, -hat(qi)], axis=-1)  # [P, M, 3, 6]
    Jj = -jnp.concatenate([eye, -hat(qj)], axis=-1)
    Hii = _einsum("pmai,pm,pmaj->pij", Ji, w, Ji)
    Hjj = _einsum("pmai,pm,pmaj->pij", Jj, w, Jj)
    Hij = _einsum("pmai,pm,pmaj->pij", Ji, w, Jj)
    gi = _einsum("pmai,pm,pma->pi", Ji, w, r)
    gj = _einsum("pmai,pm,pma->pi", Jj, w, r)
    cost = jnp.sum(w * jnp.sum(r * r, axis=-1), axis=-1)
    return Hii, Hjj, Hij, gi, gj, cost


def scatter_blocks(K, pair_i, pair_j, Hii, Hjj, Hij, gi, gj):
    """Accumulate per-pair blocks into H [K, K, 6, 6] and g [K, 6]."""
    H = jnp.zeros((K, K, 6, 6), Hii.dtype)
    g = jnp.zeros((K, 6), gi.dtype)
    H = H.at[pair_i, pair_i].add(Hii)
    H = H.at[pair_j, pair_j].add(Hjj)
    H = H.at[pair_i, pair_j].add(Hij)
    H = H.at[pair_j, pair_i].add(jnp.swapaxes(Hij, -1, -2))
    g = g.at[pair_i].add(gi)
    g = g.at[pair_j].add(gj)
    return H, g


def sparse_normal_equations(
    poses: jnp.ndarray,
    corres: SparseCorres,
    robust_delta: float,
    weight: float = 1.0,
):
    """Huber-weighted J^T J / J^T r for the sparse term.

    Returns (H [K,K,6,6], g [K,6], cost scalar, per-residual weights [P,M]).
    """
    K = poses.shape[0]
    r, qi, qj = sparse_residuals(poses, corres)
    e_sq = jnp.sum(r * r, axis=-1)
    _, rho1 = huber(e_sq, robust_delta)
    w = rho1 * corres.valid.astype(r.dtype) * weight
    Hii, Hjj, Hij, gi, gj, cost = _pair_blocks(r, qi, qj, w)
    H, g = scatter_blocks(K, corres.pair_i, corres.pair_j, Hii, Hjj, Hij, gi, gj)
    rho0, _ = huber(e_sq, robust_delta)
    total_cost = jnp.sum(rho0 * corres.valid * weight)
    return H, g, total_cost, w
