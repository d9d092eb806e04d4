"""Micro-profile of ransac_multi_pair internals on the attached device.

Breaks the 120-pair x 2000-trial RANSAC into its CURRENT component stages
(permute+roll trial construction, SoA 3-point fit + gate, bilinear MXU
scoring, winner re-score) so the stage total in profile_stages.py can be
attributed.  Each component is jitted in isolation, so numbers are upper
bounds — the fused op overlaps them.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bundletrack_tpu.utils.timing import hard_sync
import time

import numpy as np

import jax
import jax.numpy as jnp

from bundletrack_tpu.ransac.ransac import (
    _match_features,
    _soa_count_inliers,
    _soa_fit_trials,
    _soa_pose_gate,
    _soa_trial_features,
    ransac_multi_pair,
)

P, T, M = 120, 2000, 256
N_REP = -(-T // M)
rng = np.random.RandomState(0)
pts_a = jnp.asarray(rng.rand(P, M, 3).astype(np.float32))
pts_b = pts_a + 0.001
nrm = np.zeros((P, M, 3), np.float32)
nrm[..., 2] = -1.0
normals_a = jnp.asarray(nrm)
normals_b = jnp.asarray(nrm)
match_valid = jnp.ones((P, M), bool)
prior = jnp.broadcast_to(jnp.eye(4), (P, 4, 4)).copy()
key = jax.random.PRNGKey(0)


def timed(name, fn, *args, reps=10):
    f = jax.jit(fn)
    out = hard_sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    hard_sync(out)
    print(f"{name:36s} {(time.perf_counter() - t0) / reps * 1000:8.2f} ms")
    return out


print(f"device: {jax.devices()[0].platform}; P={P} T={T} (T_eff={N_REP*M}) M={M}")

timed(
    "ransac_multi_pair (full)",
    lambda k, pa, pb, na, nb, mv, pr: ransac_multi_pair(
        k, pa, pb, na, nb, mv, pr, num_trials=T, inlier_dist=0.01,
        inlier_normal_deg=45.0, min_matches=5,
    ),
    key, pts_a, pts_b, normals_a, normals_b, match_valid, prior,
)


def build_trials(key, mv, pa, pb):
    """The permute+roll trial construction from ransac_pair."""
    def one(k, mvp, a, b_pts):
        iota_m = jnp.arange(M, dtype=jnp.int32)
        num_valid = jnp.sum(mvp)
        cnt = jnp.cumsum(mvp.astype(jnp.int32))
        pos = jnp.where(mvp, cnt - 1, num_valid + (iota_m - cnt))
        order = jnp.zeros((M,), jnp.int32).at[pos].set(iota_m, mode="drop")
        fill = jnp.take(order, jnp.remainder(iota_m, jnp.maximum(num_valid, 1)))
        pis = [
            np.random.RandomState(1000 + k_).permutation(M).astype(np.int32)
            for k_ in range(3)
        ]
        offs = np.random.RandomState(77).randint(1, max(M, 2), size=(2, N_REP))
        bph = jax.random.randint(k, (3,), 0, M, dtype=jnp.int32)
        packed = jnp.concatenate(
            [a, b_pts, iota_m[:, None].astype(a.dtype), jnp.zeros((M, 1), a.dtype)],
            axis=-1,
        )
        tbl = [
            jnp.take(
                packed,
                jnp.take(fill, jnp.take(jnp.asarray(pis[kk]), (iota_m + bph[kk]) % M)),
                axis=0,
            )
            for kk in range(3)
        ]
        tri1 = jnp.broadcast_to(tbl[0][None], (N_REP, M, 8)).reshape(N_REP * M, 8)
        tri2 = jnp.concatenate(
            [jnp.roll(tbl[1], -int(offs[0, r]), axis=0) for r in range(N_REP)], axis=0
        )
        tri3 = jnp.concatenate(
            [jnp.roll(tbl[2], -int(offs[1, r]), axis=0) for r in range(N_REP)], axis=0
        )
        return jnp.stack([tri1, tri2, tri3], axis=1)

    keys = jax.random.split(key, P)
    return jax.vmap(one)(keys, mv, pa, pb)


g = timed("trial construction (permute+roll)", build_trials, key, match_valid, pts_a, pts_b)


def fit(g):
    return jax.vmap(lambda gg: _soa_fit_trials(gg[..., 0:3], gg[..., 3:6]))(g)


R_t, t_t, ok = timed("SoA 3-point fit", fit, g)


def gate(R, t, pr):
    return jax.vmap(lambda r_, t_, p_: _soa_pose_gate(r_, t_, p_, 1e9, 1e9))(R, t, pr)


timed("pose gate (SoA)", gate, R_t, t_t, prior)


def score(R, t, pa, pb, na, nb, mv):
    def one(r_, t_, a, b, x, y, m):
        G = _match_features(a, b, x, y)
        F = _soa_trial_features(r_, t_)
        return _soa_count_inliers(F, G, m, 0.01, 0.7)

    return jax.vmap(one)(R, t, pa, pb, na, nb, mv)


timed(
    "bilinear MXU scoring",
    score, R_t, t_t, pts_a, pts_b, normals_a, normals_b, match_valid,
)
