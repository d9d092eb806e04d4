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

TPU layout notes (learned from real-chip Mosaic failures, not interpret
mode): every block's minor dimension must be 128-lane aligned, so the
[N, 3] point/normal arrays are zero-padded to [N, 128] lanes before the
call (the padded lanes contribute nothing to the dot products), and
keypoint validity is folded into the positions — invalid keypoints are
teleported to ±1e4 so the distance gate rejects them, which removes the
unalignable [N, 1] validity inputs entirely.

Grid: one program per pair.  VMEM budget per program at N=512, D=256:
2 x desc (512 KB f32) + 4 x padded geo (256 KB) + ~5 [N, N] f32
intermediates (1 MB each) ~= 7 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GEO_LANES = 128  # minor-dim padding for point/normal blocks


def _match_kernel(
    desc_a_ref, desc_b_ref,  # [N, D]
    wa_ref, wb_ref,  # [N, 128] model-frame points (lanes 0-2, rest zero)
    na_ref, nb_ref,  # [N, 128] model-frame normals (lanes 0-2, rest zero)
    best_b_ref,  # out [1, N] int32
    best_dist_ref,  # out [1, N] f32
    mutual_ref,  # out [1, N] int32 (1 = mutual match)
    *,
    max_dist_sq: float,  # compile-time constants (config values)
    cos_thresh: float,
):
    N = desc_a_ref.shape[0]

    da = desc_a_ref[:]
    db = desc_b_ref[:]
    # descriptor squared-L2 via the matmul identity (descriptors ~unit norm).
    # bf16 operands + f32 norms mirror matching/pairwise.py's
    # descriptor_distances EXACTLY so both backends pick identical winners.
    sim = jax.lax.dot_general(
        da.astype(jnp.bfloat16), db.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [N, N]
    na2 = jnp.sum(da * da, axis=1, keepdims=True)
    nb2 = jnp.sum(db * db, axis=1, keepdims=True)
    dist = na2 + nb2.T - 2.0 * sim

    wa = wa_ref[:]
    wb = wb_ref[:]
    # zero-padded lanes drop out of both the dot product and the norms.
    # Mosaic's DEFAULT f32 dot is multi-pass bf16 (~f32-accurate), the same
    # accuracy class as the XLA path's Precision.HIGH einsum — the gate
    # threshold (0.02 m)^2 = 4e-4 needs better than raw bf16 resolution of
    # the ~1 m^2 norm terms, and both paths clear it.  (Mosaic rejects an
    # explicit HIGH, and HIGHEST costs ~0.9 ms/call extra, measured.)
    wdot = jax.lax.dot_general(
        wa, wb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    wa2 = jnp.sum(wa * wa, axis=1, keepdims=True)
    wb2 = jnp.sum(wb * wb, axis=1, keepdims=True)
    d2 = wa2 + wb2.T - 2.0 * wdot

    ncos = jax.lax.dot_general(
        na_ref[:], nb_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # validity is already encoded in the positions (invalid -> +-1e4 -> d2
    # astronomically over max_dist_sq), so the gate needs no mask inputs
    gate = (d2 < max_dist_sq) & (ncos > cos_thresh)
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

    best_b_ref[:] = best_b.astype(jnp.int32).reshape(1, N)
    best_dist_ref[:] = jnp.where(has, row_min, big).reshape(1, N)
    mutual_ref[:] = mutual.astype(jnp.int32).reshape(1, N)


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

    def pack_geo(x, valid, offset):
        # teleport invalid keypoints out of gate range, pad lanes to 128.
        # A-side and B-side get opposite signs so invalid-vs-invalid pairs
        # are also 2e4 apart.
        x = jnp.where(valid[..., None], x, jnp.float32(offset))
        return jnp.pad(
            x.astype(jnp.float32), ((0, 0), (0, 0), (0, _GEO_LANES - x.shape[-1]))
        )

    wa_p = pack_geo(wa, valid_a, 1e4)
    wb_p = pack_geo(wb, valid_b, -1e4)
    pad_n = lambda x: jnp.pad(
        x.astype(jnp.float32), ((0, 0), (0, 0), (0, _GEO_LANES - x.shape[-1]))
    )
    na_p, nb_p = pad_n(na), pad_n(nb)

    grid = (P,)
    spec_nd = lambda d: pl.BlockSpec(
        (1, N, d), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
    )
    # outputs are [P, 1, N] so the trailing block dims (1, N) exactly match
    # the array dims — Mosaic requires (8, 128)-divisible or full-dim blocks
    out_spec = pl.BlockSpec((1, 1, N), lambda p: (p, 0, 0), memory_space=pltpu.VMEM)

    body = functools.partial(
        _match_kernel,
        max_dist_sq=float(max_dist) ** 2,
        cos_thresh=math.cos(math.radians(float(max_normal_deg))),
    )

    def kernel(da, db, wa_, wb_, na_, nb_, bb, bd, mu):
        body(
            da.at[0], db.at[0], wa_.at[0], wb_.at[0], na_.at[0], nb_.at[0],
            bb.at[0], bd.at[0], mu.at[0],
        )

    best_b, best_dist, mutual = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec_nd(D), spec_nd(D),
            spec_nd(_GEO_LANES), spec_nd(_GEO_LANES),
            spec_nd(_GEO_LANES), spec_nd(_GEO_LANES),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((P, 1, N), jnp.int32),
            jax.ShapeDtypeStruct((P, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((P, 1, N), jnp.int32),
        ],
        interpret=interpret,
    )(desc_a, desc_b, wa_p, wb_p, na_p, nb_p)

    return (best_b[:, 0], best_dist[:, 0], mutual[:, 0] > 0)
