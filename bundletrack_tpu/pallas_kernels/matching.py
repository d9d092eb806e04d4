"""Pallas TPU kernel: fused descriptor matching with geometric gating.

Fuses, per frame pair, the whole correspondence pipeline of
matching/pairwise.py — descriptor distance matrix (MXU), model-frame
distance + normal-angle gates, and mutual-nearest-neighbor extraction —
into one kernel whose [N, N] intermediates live entirely in VMEM.  The XLA
path materializes the distance/gate matrices in HBM
([P, 512, 512] f32 = ~126 MB per array at reference scale); this kernel
writes only the [P, N] winners, turning an HBM-bandwidth problem into an
on-chip one.

Replaces (with matching/pairwise.py as the reference-comparison fallback)
the reference's OpenCV-CUDA BFMatcher + prune + mutual-collect pipeline
(reference: src/FeatureManager.cpp:247-368).

Grid: one program per pair.  VMEM budget per program at N=512, D=256:
2 x desc (512 KB each, f32) + dist/gate tiles (1 MB) + small vectors ~ 2.5 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _match_kernel(
    desc_a_ref, desc_b_ref,  # [N, D]
    wa_ref, wb_ref,  # [N, 3] model-frame points
    na_ref, nb_ref,  # [N, 3] model-frame normals
    valid_a_ref, valid_b_ref,  # [N, 1] float (1.0 valid)
    best_b_ref,  # out [N, 1] int32
    best_dist_ref,  # out [N, 1] f32
    mutual_ref,  # out [N, 1] int32 (1 = mutual match)
    *,
    max_dist_sq: float,  # compile-time constants (config values)
    cos_thresh: float,
):
    N = desc_a_ref.shape[0]

    da = desc_a_ref[:]
    db = desc_b_ref[:]
    # descriptor squared-L2 via the matmul identity (descriptors ~unit norm)
    sim = jax.lax.dot_general(
        da, db, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [N, N]
    na2 = jnp.sum(da * da, axis=1, keepdims=True)
    nb2 = jnp.sum(db * db, axis=1, keepdims=True)
    dist = na2 + nb2.T - 2.0 * sim

    wa = wa_ref[:]
    wb = wb_ref[:]
    wdot = jax.lax.dot_general(
        wa, wb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    wa2 = jnp.sum(wa * wa, axis=1, keepdims=True)
    wb2 = jnp.sum(wb * wb, axis=1, keepdims=True)
    d2 = wa2 + wb2.T - 2.0 * wdot

    ncos = jax.lax.dot_general(
        na_ref[:], nb_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    gate = (
        (d2 < max_dist_sq)
        & (ncos > cos_thresh)
        & (valid_a_ref[:] > 0.5)
        & (valid_b_ref[:].reshape(1, N) > 0.5)
    )
    big = jnp.float32(1e30)
    gated = jnp.where(gate, dist, big)

    # mutual nearest neighbors
    best_b = jnp.argmin(gated, axis=1)  # [N]
    row_min = jnp.min(gated, axis=1)  # [N]
    col_min = jnp.min(gated, axis=0)  # [N]
    # mutual: row i's winner j also has i as winner, i.e.
    # gated[i, best_b[i]] <= col_min[best_b[i]].  Mosaic has no 1-D dynamic
    # gather, so select j == best_b[i] with a broadcast iota and reduce —
    # pure [N, N] vector ops in VMEM.  Ties resolve to "mutual", matching
    # argmin semantics closely enough for RANSAC downstream.
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    sel = iota_j == best_b[:, None]
    mutual = jnp.any(sel & (gated <= col_min[None, :]) & (gated < big), axis=1)
    has = row_min < big
    mutual = mutual & has

    best_b_ref[:] = best_b.astype(jnp.int32).reshape(N, 1)
    best_dist_ref[:] = jnp.where(has, row_min, big).reshape(N, 1)
    mutual_ref[:] = mutual.astype(jnp.int32).reshape(N, 1)


def fused_mutual_match(
    desc_a, desc_b,  # [P, N, D]
    wa, wb,  # [P, N, 3] model-frame keypoint positions
    na, nb,  # [P, N, 3] model-frame normals
    valid_a, valid_b,  # [P, N] bool
    max_dist: float,
    max_normal_deg: float,
    interpret: bool = False,
):
    """Batched fused matching: returns (best_b [P,N] i32, dist [P,N], mutual [P,N] bool)."""
    import math

    P, N, D = desc_a.shape
    v_a = valid_a.astype(jnp.float32)[..., None]
    v_b = valid_b.astype(jnp.float32)[..., None]

    grid = (P,)
    spec_nd = lambda d: pl.BlockSpec((1, N, d), lambda p: (p, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, N, 1), lambda p: (p, 0, 0), memory_space=pltpu.VMEM)

    body = functools.partial(
        _match_kernel,
        max_dist_sq=float(max_dist) ** 2,
        cos_thresh=math.cos(math.radians(float(max_normal_deg))),
    )

    def kernel(da, db, wa_, wb_, na_, nb_, va, vb, bb, bd, mu):
        body(
            da.at[0], db.at[0], wa_.at[0], wb_.at[0], na_.at[0], nb_.at[0],
            va.at[0], vb.at[0], bb.at[0], bd.at[0], mu.at[0],
        )

    best_b, best_dist, mutual = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec_nd(D), spec_nd(D),
            spec_nd(3), spec_nd(3), spec_nd(3), spec_nd(3),
            spec_nd(1), spec_nd(1),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((P, N, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((P, N, 1), jnp.int32),
        ],
        interpret=interpret,
    )(desc_a, desc_b, wa, wb, na, nb, v_a, v_b)

    return (
        best_b[..., 0],
        best_dist[..., 0],
        mutual[..., 0] > 0,
    )
