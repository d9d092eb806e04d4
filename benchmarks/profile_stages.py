"""Per-stage latency breakdown of the tracking step on the attached device.

Each stage of the per-frame pipeline (preprocess, frontend, neighbor match,
neighbor RANSAC, BA all-pairs matching, multi-pair RANSAC, pose-graph solve)
is jitted and timed separately at bench scale (480x640, 512 kpts x 256-d,
16-frame graph / 120 pairs, 2000 trials, dense term at 120x160), so the end
-to-end number in bench.py can be attributed to stages.

Usage: python benchmarks/profile_stages.py [--reps 10]
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
    print(f"{name:32s} {dt:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bundletrack_tpu.config import TrackerConfig, ShapeConfig
    from bundletrack_tpu.data import render_synthetic_sequence
    from bundletrack_tpu.frontend.pipeline import extract_frame_features
    from bundletrack_tpu.geometry.camera import scale_intrinsics
    from bundletrack_tpu.matching.pairwise import match_pair, match_pairs_batched
    from bundletrack_tpu.ops.depth import process_depth
    from bundletrack_tpu.ops.pointcloud import depth_to_cloud_and_normals
    from bundletrack_tpu.ransac.ransac import ransac_multi_pair, ransac_pair
    from bundletrack_tpu.solver import (
        DenseFrames,
        GraphInputs,
        SparseCorres,
        optimize_pose_graph,
    )
    from bundletrack_tpu.tracker.bundler import make_track_frame, _preprocess
    from bundletrack_tpu.tracker.state import FrameObservation, init_tracker_state

    H, W = 480, 640
    cfg = TrackerConfig(shapes=ShapeConfig(image_h=H, image_w=W))
    seq = render_synthetic_sequence(num_frames=2, H=H, W=W)
    gray = jnp.asarray(seq.gray[1])
    depth = jnp.asarray(seq.depth[1])
    mask = jnp.asarray(seq.mask[1])
    K = jnp.asarray(seq.K)
    obs = FrameObservation(gray=gray, depth=depth, mask=mask, K=K)

    reps = args.reps
    print(f"device: {jax.devices()[0].platform}, reps={reps}")

    # --- stage 1: depth preprocess + cloud/normals ---
    pre = jax.jit(lambda o: _preprocess(o, cfg))
    timed("preprocess(depth+cloud)", pre, obs, reps=reps)
    (depth_p, mask_p, pts_map, nrm_map, val_map, pts_low, nrm_low, val_low,
     K_low) = hard_sync(pre(obs))

    # --- stage 2: frontend ---
    fe = jax.jit(
        lambda g, m, p, n, v: extract_frame_features(g, m, p, n, v, cfg.frontend)
    )
    timed("frontend(classical)", fe, gray, mask_p, pts_map, nrm_map, val_map,
          reps=reps)
    feats = hard_sync(fe(gray, mask_p, pts_map, nrm_map, val_map))

    # --- stage 3: neighbor matching ---
    fc = cfg.feature_corres
    M = cfg.shapes.max_matches
    eye = jnp.eye(4).copy()

    def nb_match(fe_a, eye):
        return match_pair(
            fe_a.desc, fe_a.pts, fe_a.normals, fe_a.valid, eye,
            fe_a.desc, fe_a.pts + 0.001, fe_a.normals, fe_a.valid, eye,
            max_dist=fc.max_dist_neighbor, max_normal_deg=fc.max_normal_neighbor,
            max_matches=M,
        )

    nbj = jax.jit(nb_match)
    timed("neighbor match (1 pair)", nbj, feats, eye, reps=reps)
    nb = hard_sync(nbj(feats, eye))

    # --- stage 4: neighbor RANSAC ---
    rc = cfg.ransac
    pa = feats.pts[nb.idx_a]
    pb = feats.pts[nb.idx_b] + 0.001
    na = feats.normals[nb.idx_a]
    nbn = feats.normals[nb.idx_b]
    key = jax.random.PRNGKey(0)

    def nb_ransac(key, pa, pb, na, nbn, v, eye):
        return ransac_pair(
            key, pa, pb, na, nbn, v, eye,
            num_trials=rc.max_iter, inlier_dist=rc.inlier_dist,
            inlier_normal_deg=rc.inlier_normal_angle,
            max_trans=rc.max_trans_neighbor, max_rot_deg=rc.max_rot_deg_neighbor,
            min_matches=rc.min_match_after_ransac,
        )

    rj = jax.jit(nb_ransac)
    timed("neighbor RANSAC (2000 trials)", rj, key, pa, pb, na, nbn, nb.valid,
          eye, reps=reps)

    # --- stage 5: BA all-pairs matching ---
    KBA = cfg.bundle.max_ba_frames
    pi_np, pj_np = np.triu_indices(KBA, k=1)
    PI = jnp.asarray(pi_np, jnp.int32)
    PJ = jnp.asarray(pj_np, jnp.int32)
    P = PI.shape[0]
    N = feats.desc.shape[0]
    ba_desc = jnp.broadcast_to(feats.desc, (KBA, N, feats.desc.shape[1]))
    ba_pts = jnp.broadcast_to(feats.pts, (KBA, N, 3))
    ba_nrm = jnp.broadcast_to(feats.normals, (KBA, N, 3))
    ba_kpv = jnp.broadcast_to(feats.valid, (KBA, N))
    ba_pose = jnp.broadcast_to(jnp.eye(4), (KBA, 4, 4)).copy()
    pair_valid = jnp.ones((P,), bool)

    def ba_match(d, p, n, v, poses, pair_valid):
        return match_pairs_batched(
            d, p, n, v, poses, PI, PJ, pair_valid,
            max_dist=fc.max_dist_no_neighbor,
            max_normal_deg=fc.max_normal_no_neighbor,
            max_matches=M, backend=fc.backend,
        )

    bmj = jax.jit(ba_match)
    timed(f"BA matching ({P} pairs)", bmj, ba_desc, ba_pts, ba_nrm, ba_kpv,
          ba_pose, pair_valid, reps=reps)
    bm = hard_sync(
        bmj(ba_desc, ba_pts, ba_nrm, ba_kpv, ba_pose, pair_valid)
    )

    # --- stage 6: multi-pair RANSAC ---
    g = lambda arr, idx: jnp.take_along_axis(arr, idx[..., None], axis=1)
    mpa = g(jnp.take(ba_pts, PI, axis=0), bm.idx_a)
    mpb = g(jnp.take(ba_pts, PJ, axis=0), bm.idx_b)
    mna = g(jnp.take(ba_nrm, PI, axis=0), bm.idx_a)
    mnb = g(jnp.take(ba_nrm, PJ, axis=0), bm.idx_b)
    # NOTE: pass all device data as ARGUMENTS — a closed-over device constant
    # makes the jitted callable re-materialize it per call (~30 ms artifacts
    # measured on the axon TPU runtime)
    prior = jnp.broadcast_to(jnp.eye(4), (P, 4, 4)).copy()

    def mp_ransac(key, mpa, mpb, mna, mnb, v, prior):
        return ransac_multi_pair(
            key, mpa, mpb, mna, mnb, v, prior,
            num_trials=rc.max_iter, inlier_dist=rc.inlier_dist,
            inlier_normal_deg=rc.inlier_normal_angle,
            max_trans=rc.max_trans_no_neighbor, max_rot_deg=rc.max_rot_no_neighbor,
            min_matches=rc.min_match_after_ransac,
        )

    mrj = jax.jit(mp_ransac)
    timed(f"multi-pair RANSAC ({P} pairs)", mrj, key, mpa, mpb, mna, mnb,
          bm.valid, prior, reps=reps)

    # --- stage 7: pose-graph solve (sparse + dense) ---
    rngn = np.random.RandomState(0)
    spa = jnp.asarray(rngn.rand(P, M, 3).astype(np.float32))
    spb = spa + 0.001
    corres = SparseCorres(pair_i=PI, pair_j=PJ, pts_i=spa, pts_j=spb,
                          valid=jnp.ones((P, M), bool))
    Hd, Wd = H // 4, W // 4
    dense = DenseFrames(
        points=jnp.broadcast_to(pts_low, (KBA, Hd, Wd, 3)),
        normals=jnp.broadcast_to(nrm_low, (KBA, Hd, Wd, 3)),
        valid=jnp.broadcast_to(val_low, (KBA, Hd, Wd)),
    )
    fv = jnp.ones((KBA,), bool)
    fm = jnp.arange(KBA) > 0

    def solve(poses, corres, dense):
        inp = GraphInputs(poses=poses, frame_valid=fv, free_mask=fm,
                          corres=corres, dense=dense, K_lowres=K_low)
        return optimize_pose_graph(inp, cfg.bundle)[0]

    sj = jax.jit(solve)
    timed("pose-graph solve (7 GN)", sj, ba_pose, corres, dense, reps=reps)

    # --- full step for comparison ---
    step = jax.jit(make_track_frame(cfg, H, W))
    st = init_tracker_state(cfg, H, W, 0)
    init_pose = jnp.asarray(np.linalg.inv(seq.ob_in_cam[0]), jnp.float32)
    st, _ = hard_sync(step(st, obs, init_pose))  # frame 0 path
    timed("full step (track branch)", lambda s: step(s, obs, init_pose)[1], st,
          reps=reps)


if __name__ == "__main__":
    main()
