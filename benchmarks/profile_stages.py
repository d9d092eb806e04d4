"""Per-stage latency breakdown of the tracking step on the attached device.

Each stage of the per-frame pipeline (preprocess, frontend, neighbor match,
neighbor RANSAC, BA all-pairs matching, multi-pair RANSAC, pose-graph solve)
is jitted and timed separately, so the end-to-end number in bench.py can be
attributed to stages (the role of the reference's CUDATimer named events,
src/cuda/CUDATimer.h:28-120 + TimingLog).

Importable: profile_stages(...) returns {stage: ms} and feeds the BENCH
artifact's fleet analysis (per-stage ms at S=1/8/16) and the LF-Net path
latency breakdown.  `S>1` vmaps every stage over a leading stream axis —
the same shape the fleet step runs.  `measure_h2d=True` times the raw
host->device transfer of one frame's observation batch (the streaming
bottleneck candidate).

Usage: python benchmarks/profile_stages.py [--reps 10] [--streams S]
       [--hw 480x640] [--lfnet]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bundletrack_tpu.utils.timing import hard_sync


def _timed(fn, *args, reps=10):
    out = hard_sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / reps * 1000, out


def profile_stages(
    H: int = 480,
    W: int = 640,
    S: int = 1,
    reps: int = 10,
    cfg=None,
    lfnet_apply=None,
    measure_h2d: bool = False,
    include_full_step: bool = True,
    verbose: bool = True,
) -> dict:
    """Returns {stage_name: ms} for one frame's pipeline at stream batch S."""
    import jax
    import jax.numpy as jnp

    from bundletrack_tpu.config import TrackerConfig, ShapeConfig
    from bundletrack_tpu.data import render_synthetic_sequence
    from bundletrack_tpu.frontend.pipeline import extract_frame_features
    from bundletrack_tpu.matching.pairwise import match_pair, match_pairs_batched
    from bundletrack_tpu.ransac.ransac import ransac_multi_pair, ransac_pair
    from bundletrack_tpu.solver import GraphInputs, SparseCorres, optimize_pose_graph
    from bundletrack_tpu.solver.dense_p2p import stack_frame_dense
    from bundletrack_tpu.tracker.bundler import _normalize_obs, _preprocess
    from bundletrack_tpu.tracker.state import FrameObservation, init_tracker_state

    cfg = cfg or TrackerConfig(shapes=ShapeConfig(image_h=H, image_w=W))
    seq = render_synthetic_sequence(num_frames=2, H=H, W=W)
    out = {}

    def v(fn):
        """Vmap a stage over the stream axis when S > 1."""
        return jax.vmap(fn) if S > 1 else fn

    def tile(a):
        a = jnp.asarray(a)
        return jnp.broadcast_to(a, (S,) + a.shape).copy() if S > 1 else a

    gray = tile(seq.gray[1])
    depth = tile(seq.depth[1])
    mask = tile(seq.mask[1])
    K = tile(seq.K)
    obs = FrameObservation(gray=gray, depth=depth, mask=mask, K=K)

    if measure_h2d:
        # raw sensor formats as the driver ships them (u8 gray, u16 mm depth)
        g8 = np.asarray((seq.gray[1] * 255).astype(np.uint8))
        d16 = np.asarray((seq.depth[1] * 1000).astype(np.uint16))
        m1 = np.asarray(seq.mask[1])
        batch = {
            "gray": np.broadcast_to(g8, (S,) + g8.shape).copy(),
            "depth": np.broadcast_to(d16, (S,) + d16.shape).copy(),
            "mask": np.broadcast_to(m1, (S,) + m1.shape).copy(),
        }
        nbytes = sum(a.nbytes for a in batch.values())
        hard_sync(jax.device_put(batch))
        t0 = time.perf_counter()
        n = max(reps, 5)
        for _ in range(n):
            hard_sync(jax.device_put(batch))
        dt = (time.perf_counter() - t0) / n
        out["h2d_ms"] = round(dt * 1000, 2)
        out["h2d_bytes_per_frame"] = nbytes // S
        out["h2d_gbps"] = round(nbytes / dt / 1e9, 3)

    # --- stage 1: depth preprocess + cloud/normals + dense compaction ---
    pre = jax.jit(v(lambda o: _preprocess(_normalize_obs(o), cfg)))
    ms, pre_out = _timed(pre, obs, reps=reps)
    out["preprocess"] = round(ms, 2)
    depth_p, mask_p, pts_map, nrm_map, val_map, fd, K_low = pre_out

    # --- stage 2: frontend ---
    fe = jax.jit(
        v(
            lambda g, m, p, n, vv: extract_frame_features(
                g, m, p, n, vv, cfg.frontend, lfnet_apply
            )
        )
    )
    name = "frontend_lfnet" if cfg.frontend.kind == "lfnet" else "frontend_classical"
    ms, feats = _timed(fe, gray, mask_p, pts_map, nrm_map, val_map, reps=reps)
    out[name] = round(ms, 2)

    # --- stage 3+4: neighbor match + RANSAC ---
    fc, rc = cfg.feature_corres, cfg.ransac
    M = cfg.shapes.max_matches
    eye = tile(jnp.eye(4))

    def nb_match(fe_a, eye):
        return match_pair(
            fe_a.desc, fe_a.pts, fe_a.normals, fe_a.valid, eye,
            fe_a.desc, fe_a.pts + 0.001, fe_a.normals, fe_a.valid, eye,
            max_dist=fc.max_dist_neighbor, max_normal_deg=fc.max_normal_neighbor,
            max_matches=M,
        )

    nbj = jax.jit(v(nb_match))
    ms, nb = _timed(nbj, feats, eye, reps=reps)
    out["neighbor_match"] = round(ms, 2)

    def take2(arr, idx):
        return jnp.take_along_axis(arr, idx[..., None], axis=-2)

    pa = take2(feats.pts, nb.idx_a)
    pb = take2(feats.pts, nb.idx_b) + 0.001
    na = take2(feats.normals, nb.idx_a)
    nbn = take2(feats.normals, nb.idx_b)
    key = tile(jax.random.PRNGKey(0))

    def nb_ransac(key, pa, pb, na, nbn, vv, eye):
        return ransac_pair(
            key, pa, pb, na, nbn, vv, eye,
            num_trials=rc.max_iter, inlier_dist=rc.inlier_dist,
            inlier_normal_deg=rc.inlier_normal_angle,
            max_trans=rc.max_trans_neighbor, max_rot_deg=rc.max_rot_deg_neighbor,
            min_matches=rc.min_match_after_ransac,
        )

    rj = jax.jit(v(nb_ransac))
    ms, _ = _timed(rj, key, pa, pb, na, nbn, nb.valid, eye, reps=reps)
    out["neighbor_ransac"] = round(ms, 2)

    # --- stage 5: BA all-pairs matching ---
    KBA = cfg.bundle.max_ba_frames
    pi_np, pj_np = np.triu_indices(KBA, k=1)
    P = len(pi_np)
    N = feats.desc.shape[-2]

    def btile(a):
        a = jnp.asarray(a)
        t = jnp.broadcast_to(a, (KBA,) + a.shape).copy()
        return tile(t)

    ba_desc = btile(np.asarray(feats.desc)[0] if S > 1 else feats.desc)
    ba_pts = btile(np.asarray(feats.pts)[0] if S > 1 else feats.pts)
    ba_nrm = btile(np.asarray(feats.normals)[0] if S > 1 else feats.normals)
    ba_kpv = btile(np.asarray(feats.valid)[0] if S > 1 else feats.valid)
    ba_pose = btile(jnp.eye(4))
    pair_valid = tile(jnp.ones((P,), bool))
    PI = jnp.asarray(pi_np, jnp.int32)
    PJ = jnp.asarray(pj_np, jnp.int32)

    def ba_match(d, p, n, vv, poses, pair_valid):
        return match_pairs_batched(
            d, p, n, vv, poses, PI, PJ, pair_valid,
            max_dist=fc.max_dist_no_neighbor,
            max_normal_deg=fc.max_normal_no_neighbor,
            max_matches=M, backend=fc.backend,
        )

    bmj = jax.jit(v(ba_match))
    ms, bm = _timed(bmj, ba_desc, ba_pts, ba_nrm, ba_kpv, ba_pose, pair_valid,
                    reps=reps)
    out["ba_matching"] = round(ms, 2)

    # --- stage 6: multi-pair RANSAC ---
    if S > 1:
        mpa = jax.vmap(lambda t, i: jnp.take_along_axis(
            jnp.take(t, PI, axis=0), i[..., None], axis=1))(ba_pts, bm.idx_a)
        mpb = jax.vmap(lambda t, i: jnp.take_along_axis(
            jnp.take(t, PJ, axis=0), i[..., None], axis=1))(ba_pts, bm.idx_b)
        mna = jax.vmap(lambda t, i: jnp.take_along_axis(
            jnp.take(t, PI, axis=0), i[..., None], axis=1))(ba_nrm, bm.idx_a)
        mnb = jax.vmap(lambda t, i: jnp.take_along_axis(
            jnp.take(t, PJ, axis=0), i[..., None], axis=1))(ba_nrm, bm.idx_b)
        prior = tile(jnp.broadcast_to(jnp.eye(4), (P, 4, 4)).copy())
    else:
        g = lambda arr, idx: jnp.take_along_axis(arr, idx[..., None], axis=1)
        mpa = g(jnp.take(ba_pts, PI, axis=0), bm.idx_a)
        mpb = g(jnp.take(ba_pts, PJ, axis=0), bm.idx_b)
        mna = g(jnp.take(ba_nrm, PI, axis=0), bm.idx_a)
        mnb = g(jnp.take(ba_nrm, PJ, axis=0), bm.idx_b)
        prior = jnp.broadcast_to(jnp.eye(4), (P, 4, 4)).copy()

    def mp_ransac(key, mpa, mpb, mna, mnb, vv, prior):
        return ransac_multi_pair(
            key, mpa, mpb, mna, mnb, vv, prior,
            num_trials=rc.max_iter, inlier_dist=rc.inlier_dist,
            inlier_normal_deg=rc.inlier_normal_angle,
            max_trans=rc.max_trans_no_neighbor, max_rot_deg=rc.max_rot_no_neighbor,
            min_matches=rc.min_match_after_ransac,
        )

    mrj = jax.jit(v(mp_ransac))
    ms, _ = _timed(mrj, key, mpa, mpb, mna, mnb, bm.valid, prior, reps=reps)
    out["multipair_ransac"] = round(ms, 2)

    # --- stage 7: pose-graph solve (sparse + dense, pre-compacted tables) ---
    rngn = np.random.RandomState(0)
    spa = tile(jnp.asarray(rngn.rand(P, M, 3).astype(np.float32)))
    fv = jnp.ones((KBA,), bool)
    fm = jnp.arange(KBA) > 0
    dsrc = btile(np.asarray(fd.src)[0] if S > 1 else fd.src)
    dval = btile(np.asarray(fd.valid)[0] if S > 1 else fd.valid)
    dlin = btile(np.asarray(fd.lin)[0] if S > 1 else fd.lin)
    dtch = btile(np.asarray(fd.tchan)[0] if S > 1 else fd.tchan)
    K_low1 = K_low[0] if S > 1 else K_low

    def solve(poses, spa, dsrc, dval, dlin, dtch, K_low):
        corres = SparseCorres(pair_i=PI, pair_j=PJ, pts_i=spa,
                              pts_j=spa + 0.001,
                              valid=jnp.ones((P, M), bool))
        dc = stack_frame_dense(dsrc, dval, dlin, dtch)
        inp = GraphInputs(poses=poses, frame_valid=fv, free_mask=fm,
                          corres=corres, dense_compact=dc, K_lowres=K_low)
        return optimize_pose_graph(inp, cfg.bundle, p2p=cfg.p2p)[0]

    sj = jax.jit(v(solve))
    ms, _ = _timed(
        sj, ba_pose, spa, dsrc, dval, dlin, dtch,
        tile(K_low1) if S > 1 else K_low1, reps=reps,
    )
    out["pose_graph_solve"] = round(ms, 2)

    # --- full step for comparison ---
    if include_full_step:
        from bundletrack_tpu.tracker.bundler import make_track_frame

        single = make_track_frame(cfg, H, W, lfnet_apply)
        step = jax.jit(jax.vmap(single) if S > 1 else single)
        st = init_tracker_state(cfg, H, W, 0)
        if S > 1:
            st = jax.tree.map(lambda x: tile(x), st)
        init_pose = tile(jnp.asarray(np.linalg.inv(seq.ob_in_cam[0]), jnp.float32))
        st, _ = hard_sync(step(st, obs, init_pose))  # frame 0 path
        ms, _ = _timed(lambda s: step(s, obs, init_pose)[1], st, reps=reps)
        out["full_step"] = round(ms, 2)

    if verbose:
        for k, vms in out.items():
            print(f"{k:28s} {vms}", file=sys.stderr)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--streams", type=int, default=1)
    ap.add_argument("--hw", default="480x640")
    ap.add_argument("--lfnet", action="store_true")
    args = ap.parse_args(argv)
    H, W = (int(x) for x in args.hw.split("x"))

    lfnet_apply = None
    cfg = None
    if args.lfnet:
        from bundletrack_tpu.config import FrontendConfig, ShapeConfig, TrackerConfig
        from bundletrack_tpu.frontend import load_params_npz, make_lfnet_apply

        fcfg = FrontendConfig(kind="lfnet")
        ckpt = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "checkpoints", "lfnet_params.npz")
        _, params = load_params_npz(ckpt, fcfg)
        lfnet_apply = make_lfnet_apply(fcfg, params)
        cfg = TrackerConfig(frontend=fcfg, shapes=ShapeConfig(image_h=H, image_w=W))

    import json

    table = profile_stages(
        H=H, W=W, S=args.streams, reps=args.reps, cfg=cfg,
        lfnet_apply=lfnet_apply, measure_h2d=True,
    )
    print(json.dumps({"H": H, "W": W, "S": args.streams, "stages_ms": table}))


if __name__ == "__main__":
    main()
