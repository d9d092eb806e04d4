"""Micro-profile of ransac_multi_pair internals on the attached device.

Breaks the 120-pair x 2000-trial RANSAC into its component ops (sampling,
3-point model fit, pose gating, bilinear scoring, winner re-score) so the
stage total in profile_stages.py can be attributed and optimized.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bundletrack_tpu.utils.timing import hard_sync
import time

import numpy as np



import jax
import jax.numpy as jnp

from bundletrack_tpu.geometry.procrustes import rigid_from_three_points
from bundletrack_tpu.geometry.se3 import rotation_geodesic_distance, se3_inverse
from bundletrack_tpu.ransac.ransac import (
    _count_inliers_bilinear,
    _match_features,
    ransac_multi_pair,
)

P, T, M = 120, 2000, 256
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
    out = hard_sync(jax.jit(fn)(*args))
    f = jax.jit(fn)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    hard_sync(out)
    print(f"{name:36s} {(time.perf_counter() - t0) / reps * 1000:8.2f} ms")
    return out


print(f"device: {jax.devices()[0].platform}; P={P} T={T} M={M}")

# full op
timed(
    "ransac_multi_pair (full)",
    lambda k, pa, pb, na, nb, mv, pr: ransac_multi_pair(
        k, pa, pb, na, nb, mv, pr, num_trials=T, inlier_dist=0.01,
        inlier_normal_deg=45.0, min_matches=5,
    ),
    key, pts_a, pts_b, normals_a, normals_b, match_valid, prior,
)

# 1. sampling: argsort + randint + gather
def sample(key, mv):
    keys = jax.random.split(key, P)
    def one(k, mvp):
        order = jnp.argsort(~mvp)
        raw = jax.random.randint(k, (T, 3), 0, jnp.maximum(jnp.sum(mvp), 1), dtype=jnp.int32)
        return order[raw]
    return jax.vmap(one)(keys, mv)

samples = timed("sampling (argsort+randint+gather)", sample, key, match_valid)

# 2. triangle gather
def tri_gather(pa, pb, s):
    return jnp.take_along_axis(pa[:, :, None, :], s[..., None, None], axis=1), \
           jnp.take_along_axis(pb[:, :, None, :], s[..., None, None], axis=1)

def tri_gather2(pa, pb, s):
    g = jax.vmap(lambda x, i: x[i])
    return g(pa, s), g(pb, s)

tri_a, tri_b = timed("triangle gather [P,T,3,3]", tri_gather2, pts_a, pts_b, samples)

# 3. model fit
def fit(ta, tb):
    return jax.vmap(rigid_from_three_points)(ta, tb)

T_ab, tri_ok = timed("rigid_from_three_points", fit, tri_a, tri_b)

# 4. pose gate
def gate(pr, Tab):
    rel = jnp.einsum("pij,ptjk->ptik", jax.vmap(se3_inverse)(pr), Tab)
    trans_ok = jnp.linalg.norm(rel[:, :, :3, 3], axis=-1) < 1e9
    rot_ok = rotation_geodesic_distance(pr[:, None, :3, :3], Tab[:, :, :3, :3]) < 100.0
    return trans_ok & rot_ok

timed("pose gate", gate, prior, T_ab)

# 5. bilinear scoring
def score(Tab, pa, pb, na, nb, mv):
    def one(t, a, b, x, y, m):
        G = _match_features(a, b, x, y)
        return _count_inliers_bilinear(t, G, m, 0.01, 0.7)
    return jax.vmap(one)(Tab, pa, pb, na, nb, mv)

timed("bilinear scoring", score, T_ab, pts_a, pts_b, normals_a, normals_b, match_valid)
