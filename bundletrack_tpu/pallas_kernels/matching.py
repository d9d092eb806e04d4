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
mode): every block's minor dimension must be 128-lane aligned.  The
3-component geometry (points + normals) is deliberately NOT fed to the MXU:
an f32 dot over 128 zero-padded lanes is multi-pass bf16 matmul work where
125/128 lanes carry nothing, and two such matmuls dominated the r4 kernel
(~26 us of its ~38 us per pair, measured).  Instead the A-side packs
[points | normals] into the first 6 lanes of one [N, 128] array and the
B-side arrives PRE-TRANSPOSED as [8, N] (rows 0-2 = xyz, 3-5 = normals), so
the pairwise squared distance and normal cosine are pure VPU broadcasts
([N, 1] op [1, N] per coordinate) — no MXU, no padded-lane waste, and the
B-side geometry block shrinks from [N, 128] to [8, N].  Keypoint validity
is folded into the positions — invalid keypoints are teleported to ±1e4 so
the distance gate rejects them, which removes the unalignable [N, 1]
validity inputs entirely.

Numerics: the direct (a-b)^2 distance here is MORE accurate than the XLA
path's norm+matmul identity, so gate-threshold ties can flip between
backends (the bench's agreement metric tracks this; ground-truth precision
is 1.0 for both).  Descriptor distances still use the bf16 matmul identity
EXACTLY like the XLA path so both backends pick identical winners.

Grid: one program per pair.  VMEM budget per program at N=512, D=256:
2 x desc (512 KB f32) + geo (256 KB + 16 KB) + ~5 [N, N] f32
intermediates (1 MB each) ~= 6 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GEO_LANES = 128  # minor-dim padding for the A-side [points|normals] block
_GEO_ROWS = 8  # sublane padding for the B-side transposed geometry block


def _match_kernel(
    desc_a_ref, desc_b_ref,  # [N, D]
    geo_a_ref,  # [N, 128]: lanes 0-2 points, 3-5 normals, rest zero
    geo_bt_ref,  # [8, N]: rows 0-2 points, 3-5 normals, rest zero
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

    ga = geo_a_ref[:]  # [N, 128]
    gbt = geo_bt_ref[:]  # [8, N]
    # pairwise squared distance + normal cosine, one coordinate at a time:
    # [N, 1] broadcast against [1, N] on the VPU.  f32 exact — no matmul
    # identity, no bf16 passes (see module docstring for why not MXU).
    d2 = (ga[:, 0:1] - gbt[0:1, :]) ** 2
    d2 += (ga[:, 1:2] - gbt[1:2, :]) ** 2
    d2 += (ga[:, 2:3] - gbt[2:3, :]) ** 2
    ncos = ga[:, 3:4] * gbt[3:4, :]
    ncos += ga[:, 4:5] * gbt[4:5, :]
    ncos += ga[:, 5:6] * gbt[5:6, :]

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

    # teleport invalid keypoints out of gate range (A-side and B-side get
    # opposite signs so invalid-vs-invalid pairs are also 2e4 apart), then
    # pack [points | normals] into 6 lanes
    wa_v = jnp.where(valid_a[..., None], wa.astype(jnp.float32), jnp.float32(1e4))
    wb_v = jnp.where(valid_b[..., None], wb.astype(jnp.float32), jnp.float32(-1e4))
    geo_a = jnp.concatenate([wa_v, na.astype(jnp.float32)], axis=-1)  # [P, N, 6]
    geo_a = jnp.pad(geo_a, ((0, 0), (0, 0), (0, _GEO_LANES - geo_a.shape[-1])))
    geo_b = jnp.concatenate([wb_v, nb.astype(jnp.float32)], axis=-1)  # [P, N, 6]
    geo_bt = jnp.pad(
        jnp.swapaxes(geo_b, 1, 2), ((0, 0), (0, _GEO_ROWS - geo_b.shape[-1]), (0, 0))
    )  # [P, 8, N]

    grid = (P,)
    spec_nd = lambda d: pl.BlockSpec(
        (1, N, d), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
    )
    spec_t = pl.BlockSpec(
        (1, _GEO_ROWS, N), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
    )
    # outputs are [P, 1, N] so the trailing block dims (1, N) exactly match
    # the array dims — Mosaic requires (8, 128)-divisible or full-dim blocks
    out_spec = pl.BlockSpec((1, 1, N), lambda p: (p, 0, 0), memory_space=pltpu.VMEM)

    body = functools.partial(
        _match_kernel,
        max_dist_sq=float(max_dist) ** 2,
        cos_thresh=math.cos(math.radians(float(max_normal_deg))),
    )

    def kernel(da, db, ga, gbt, bb, bd, mu):
        body(da.at[0], db.at[0], ga.at[0], gbt.at[0], bb.at[0], bd.at[0], mu.at[0])

    best_b, best_dist, mutual = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_nd(D), spec_nd(D), spec_nd(_GEO_LANES), spec_t],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((P, 1, N), jnp.int32),
            jax.ShapeDtypeStruct((P, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((P, 1, N), jnp.int32),
        ],
        interpret=interpret,
    )(desc_a, desc_b, geo_a, geo_bt)

    return (best_b[:, 0], best_dist[:, 0], mutual[:, 0] > 0)
