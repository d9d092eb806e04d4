"""Fine-grained solver breakdown: sparse term, dense term, gauge+Cholesky.

Attributes the pose-graph solve time (the dominant stage per
profile_stages.py) to its pieces at bench scale: K=16 frames, 120 pairs
(240 directed), dense term at 120x160, 256 sparse matches/pair.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bundletrack_tpu.utils.timing import hard_sync
import time

import numpy as np




def timed(name, fn, *args, reps=10):
    import jax

    out = hard_sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    hard_sync(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bundletrack_tpu.config import BundleConfig
    from bundletrack_tpu.geometry.camera import scale_intrinsics
    from bundletrack_tpu.solver import (
        DenseFrames,
        GraphInputs,
        SparseCorres,
        optimize_pose_graph,
    )
    from bundletrack_tpu.solver.dense_p2p import dense_p2p_normal_equations
    from bundletrack_tpu.solver.gauss_newton import (
        _apply_gauge,
        solve_normal_equations_cholesky,
    )
    from bundletrack_tpu.solver.residuals import sparse_normal_equations

    cfg = BundleConfig()
    KBA = cfg.max_ba_frames
    M = 256
    rngn = np.random.RandomState(0)
    pi_np, pj_np = np.triu_indices(KBA, k=1)
    PI = jnp.asarray(pi_np, jnp.int32)
    PJ = jnp.asarray(pj_np, jnp.int32)
    P = PI.shape[0]
    Hd, Wd = 120, 160

    spa = jnp.asarray(rngn.rand(P, M, 3).astype(np.float32))
    spb = spa + 0.001
    sval = jnp.ones((P, M), bool)
    corres = SparseCorres(pair_i=PI, pair_j=PJ, pts_i=spa, pts_j=spb, valid=sval)

    pts = jnp.asarray(rngn.rand(KBA, Hd, Wd, 3).astype(np.float32))
    nrm = jnp.zeros((KBA, Hd, Wd, 3)).at[..., 2].set(-1.0)
    dval = jnp.ones((KBA, Hd, Wd), bool)
    dense = DenseFrames(points=pts, normals=nrm, valid=dval)
    K = jnp.asarray(
        np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]], np.float32)
    )
    Klow = scale_intrinsics(K, 0.25)
    poses = jnp.broadcast_to(jnp.eye(4), (KBA, 4, 4)).copy()
    fv = jnp.ones((KBA,), bool)
    fm = jnp.arange(KBA) > 0

    reps = args.reps
    print(f"device: {jax.devices()[0].platform}, reps={reps}")

    sp = jax.jit(
        lambda poses, c: sparse_normal_equations(
            poses, c, robust_delta=cfg.robust_delta, weight=1.0
        )[:2]
    )
    timed("sparse term (120 pairs x 256)", sp, poses, corres, reps=reps)

    dn = jax.jit(
        lambda poses, d: dense_p2p_normal_equations(
            poses, d, fv, PI, PJ, Klow, robust_delta=cfg.robust_delta
        )[:2]
    )
    timed("dense term (240 dir-pairs x 19200)", dn, poses, dense, reps=reps)
    Hm, gm = hard_sync(dn(poses, dense))

    ch = jax.jit(
        lambda Hm, gm: solve_normal_equations_cholesky(
            *_apply_gauge(Hm, gm, fm & fv), cfg.lm_lambda
        )
    )
    timed("gauge + 96x96 Cholesky", ch, Hm, gm, reps=reps)

    def full(poses, corres, dense):
        inp = GraphInputs(poses=poses, frame_valid=fv, free_mask=fm,
                          corres=corres, dense=dense, K_lowres=Klow)
        return optimize_pose_graph(inp, cfg)[0]

    fj = jax.jit(full)
    timed("optimize_pose_graph (7 GN iters)", fj, poses, corres, dense,
          reps=reps)


if __name__ == "__main__":
    main()
