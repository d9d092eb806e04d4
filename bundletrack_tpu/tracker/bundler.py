"""The per-frame tracking state machine — one jit-compiled XLA program.

TPU-native rewrite of Bundler::processNewFrame and optimizeGPU
(reference: src/Bundler.cpp:56-183, 279-359):

  preprocess depth -> features -> neighbor match + RANSAC -> Procrustes pose
  init -> greedy_rot BA subset -> all-pairs matching + multi-pair RANSAC ->
  robust GN pose-graph solve -> keyframe admission -> outputs.

Everything — including the failure paths (FAIL / NO_BA, reference
src/Frame.h:48-53) — runs inside a single jitted step with lax.cond, so a
tracked stream costs one host->device dispatch per frame, and S streams batch
by vmap over the state pytree (the scale-out axis the reference lacks).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bundletrack_tpu.config import TrackerConfig
from bundletrack_tpu.frontend.pipeline import FrameFeatures, extract_frame_features
from bundletrack_tpu.geometry.camera import scale_intrinsics
from bundletrack_tpu.geometry.se3 import se3_compose, se3_inverse
from bundletrack_tpu.matching.pairwise import match_pair, match_pairs_batched
from bundletrack_tpu.ops.depth import process_depth
from bundletrack_tpu.ops.masks import preprocess_mask
from bundletrack_tpu.ops.pointcloud import depth_to_cloud_and_normals
from bundletrack_tpu.ransac.ransac import ransac_pair, refine_pose_on_inliers
from bundletrack_tpu.solver.dense_p2p import (
    DenseFrames,
    compact_frame,
    stack_frame_dense,
)
from bundletrack_tpu.solver.gauss_newton import (
    GraphInputs,
    optimize_pose_graph_verified,
)
from bundletrack_tpu.solver.residuals import SparseCorres
from bundletrack_tpu.tracker.selection import (
    eviction_slot,
    keyframe_admission,
    select_ba_subset,
)
from bundletrack_tpu.tracker.state import (
    STATUS_FAIL,
    STATUS_NO_BA,
    STATUS_OK,
    FrameObservation,
    TrackerState,
    TrackOutput,
)
from bundletrack_tpu.matching.mappoints import forget_frame as forget_frame_mappoints


def _normalize_obs(obs: FrameObservation) -> FrameObservation:
    """Accept raw sensor dtypes and convert ON DEVICE.

    Host->device bandwidth is the binding constraint for streaming frames
    (the tunnel moves ~0.4 GB/s), so the driver ships gray as uint8 and depth
    as uint16 millimeters (1.2 MB/frame instead of 2.7) and the conversion
    runs fused into the step — the reference does the same: it uploads raw
    images and converts on the GPU (src/Frame.cpp:68-70,107-148;
    readDepthImage mm->m, src/Utils.cpp:49-68)."""
    gray = obs.gray
    if gray.dtype == jnp.uint8:
        gray = gray.astype(jnp.float32) * (1.0 / 255.0)
    depth = obs.depth
    if depth.dtype == jnp.uint16:
        depth = depth.astype(jnp.float32) * 1e-3
    return obs._replace(
        gray=gray.astype(jnp.float32),
        depth=depth.astype(jnp.float32),
        mask=obs.mask.astype(bool),
    )


def _preprocess(obs: FrameObservation, cfg: TrackerConfig):
    """Depth chain + cloud/normals + solve-ready dense tables (reference
    Frame ctor + CUDACache::storeFrame — each frame's low-res geometry is
    compacted ONCE here, never per solve)."""
    depth = process_depth(obs.depth, cfg.depth_processing)
    pts_map, nrm_map, val_map = depth_to_cloud_and_normals(depth, obs.K)
    # mask chain: (NOCS) largest-CC + convex-hull fill, then 5x5 dilate
    # (reference Frame::segmentationByMaskFile, src/Frame.cpp:262-319)
    seg_mask = preprocess_mask(obs.mask, cfg.segmentation)
    mask = seg_mask & (depth > 0.1)
    val_map = val_map & seg_mask
    ds = cfg.bundle.image_downscale
    fd = compact_frame(
        pts_map[::ds, ::ds],
        nrm_map[::ds, ::ds],
        val_map[::ds, ::ds],
        cfg.bundle.dense_src_capacity,
    )
    K_low = scale_intrinsics(obs.K, 1.0 / ds)
    return depth, mask, pts_map, nrm_map, val_map, fd, K_low


def _gather_match_points(ba_pts, ba_normals, pair_i, pair_j, matches):
    """[K,N,3] tables + match indices -> per-pair matched point arrays."""
    pi = jnp.take(ba_pts, pair_i, axis=0)  # [P, N, 3]
    pj = jnp.take(ba_pts, pair_j, axis=0)
    ni = jnp.take(ba_normals, pair_i, axis=0)
    nj = jnp.take(ba_normals, pair_j, axis=0)
    g = lambda arr, idx: jnp.take_along_axis(arr, idx[..., None], axis=1)
    return g(pi, matches.idx_a), g(pj, matches.idx_b), g(ni, matches.idx_a), g(
        nj, matches.idx_b
    )


def make_track_frame(
    cfg: TrackerConfig,
    H: int,
    W: int,
    lfnet_apply=None,
    mesh=None,
    pair_axis: Optional[str] = None,
):
    """Build the jittable per-frame step for images of size HxW.

    mesh + pair_axis: shard the BA pair work (all-pairs matching, map-point
    propagation, multi-pair RANSAC, normal-equation build) over
    `mesh[pair_axis]` with shard_map — the within-stream scale axis of
    SURVEY §2.6 (reference analog: one CUDA stream per pair,
    src/cuda/cuda_ransac.cu:1267-1284).  Each device processes P/n pairs;
    edge counts and the [K,K,6,6]+[K,6] normal-equation blocks psum over ICI
    once per GN iteration, and the tiny replicated solve keeps all devices in
    lockstep.  Results match the single-device step (same per-pair PRNG
    streams — keys are split before sharding)."""

    K_BA = cfg.bundle.max_ba_frames
    n_pool_sel = K_BA - 1
    pair_i_np, pair_j_np = np.triu_indices(K_BA, k=1)
    # NUMPY constants, not device arrays: a jitted closure that captures a
    # committed device array forces the axon TPU runtime into synchronous
    # dispatch for the REST OF THE PROCESS (~32 ms tunnel RTT per call, every
    # executable). numpy constants are baked into the program as literals.
    PAIR_I = pair_i_np.astype(np.int32)
    PAIR_J = pair_j_np.astype(np.int32)
    M = cfg.shapes.max_matches
    P_PAIRS = len(pair_i_np)

    use_pair_shard = mesh is not None and pair_axis is not None
    if use_pair_shard:
        n_shard = mesh.shape[pair_axis]
        if P_PAIRS % n_shard:
            raise ValueError(
                f"P={P_PAIRS} BA pairs (max_ba_frames={K_BA}) must divide "
                f"mesh axis {pair_axis!r}={n_shard}"
            )

    def ba_pair_section(
        ba_desc, ba_pts, ba_nrm, ba_kpv, ba_pose, ba_valid,
        mappoints, pool_slot_of, dense_compact, K_low, fail,
        pair_i, pair_j, keys,
    ):
        """Match -> propagate -> RANSAC -> gated solve over (a shard of) the
        BA pair axis.  pair_i/pair_j/keys are sharded when under shard_map;
        everything else is replicated."""
        axis = pair_axis if use_pair_shard else None
        fc = cfg.feature_corres
        rc = cfg.ransac
        new_idx = K_BA - 1

        pair_valid = ba_valid[pair_i] & ba_valid[pair_j]
        bm = match_pairs_batched(
            ba_desc, ba_pts, ba_nrm, ba_kpv, ba_pose,
            pair_i, pair_j, pair_valid,
            max_dist=fc.max_dist_no_neighbor,
            max_normal_deg=fc.max_normal_no_neighbor,
            max_matches=M,
            backend=fc.backend,
        )
        if cfg.feature_corres.map_points:
            # seed BA pairs with landmark-propagated matches (reference
            # findCorresByMapPoints, FeatureManager.cpp:489-520); RANSAC
            # filters the union just like fresh matches
            from bundletrack_tpu.matching.mappoints import propagate_matches
            from bundletrack_tpu.matching.pairwise import merge_matches

            si = pool_slot_of[pair_i]
            sj = pool_slot_of[pair_j]
            prop_ok = (si >= 0) & (sj >= 0) & pair_valid
            prop = jax.vmap(
                lambda a, b: propagate_matches(
                    mappoints, jnp.maximum(a, 0), jnp.maximum(b, 0), M
                )
            )(si, sj)
            prop = prop._replace(valid=prop.valid & prop_ok[:, None])
            bm = merge_matches(bm, prop, ba_desc.shape[1], M)
            bm = bm._replace(valid=bm.valid & pair_valid[:, None])

        mpa, mpb, mna, mnb = _gather_match_points(
            ba_pts, ba_nrm, pair_i, pair_j, bm
        )
        prior = se3_compose(se3_inverse(ba_pose[pair_j]), ba_pose[pair_i])
        mr = jax.vmap(
            lambda k, pa, pb, na, nb, mv, pr: ransac_pair(
                k, pa, pb, na, nb, mv, pr,
                num_trials=rc.max_iter,
                inlier_dist=rc.inlier_dist,
                inlier_normal_deg=rc.inlier_normal_angle,
                max_trans=rc.max_trans_no_neighbor,
                max_rot_deg=rc.max_rot_no_neighbor,
                min_matches=rc.min_match_after_ransac,
            )
        )(keys, mpa, mpb, mna, mnb, bm.valid, prior)
        edge_valid = bm.valid & mr.inliers
        touches_new = (pair_i == new_idx) | (pair_j == new_idx)
        n_edges_new = jnp.sum(edge_valid & touches_new[:, None])
        if axis is not None:
            n_edges_new = jax.lax.psum(n_edges_new, axis)
        no_ba = n_edges_new <= cfg.bundle.min_fm_edges_newframe

        corres = SparseCorres(
            pair_i=pair_i, pair_j=pair_j,
            pts_i=mpa, pts_j=mpb, valid=edge_valid,
        )
        free_mask = jnp.arange(K_BA) > 0  # anchor oldest selected frame

        def run_ba(_):
            inputs = GraphInputs(
                poses=ba_pose,
                frame_valid=ba_valid,
                free_mask=free_mask,
                corres=corres,
                dense_compact=dense_compact,
                K_lowres=K_low,
            )
            opt_poses, reject, _info = optimize_pose_graph_verified(
                inputs, cfg.bundle, p2p=cfg.p2p, axis_name=axis
            )
            return opt_poses, reject

        ba_out_poses, ba_rejected = jax.lax.cond(
            no_ba | fail,
            lambda _: (ba_pose, jnp.asarray(False)),
            run_ba,
            operand=None,
        )
        return (
            ba_out_poses, ba_rejected, no_ba, n_edges_new,
            bm.idx_a, bm.idx_b, edge_valid,
        )

    if use_pair_shard:
        from jax.sharding import PartitionSpec as PS

        rep = PS()
        ps = PS(pair_axis)
        ba_pair_call = jax.shard_map(
            ba_pair_section,
            mesh=mesh,
            in_specs=(rep,) * 11 + (ps, ps, ps),
            out_specs=(rep, rep, rep, rep, ps, ps, ps),
            check_vma=False,
        )
    else:
        ba_pair_call = ba_pair_section

    def step(
        state: TrackerState, obs: FrameObservation, init_pose: jnp.ndarray
    ):
        obs = _normalize_obs(obs)
        depth, mask, pts_map, nrm_map, val_map, fd, K_low = _preprocess(obs, cfg)

        feats = extract_frame_features(
            obs.gray, mask, pts_map, nrm_map, val_map, cfg.frontend, lfnet_apply
        )
        n_feat = jnp.sum(feats.valid)
        roi_ok = jnp.sum(mask) > 100  # reference FAILs on tiny ROI

        key, k_neighbor, k_multi = jax.random.split(state.rng_key, 3)
        state = state._replace(rng_key=key)

        def first_frame(_):
            pose0 = init_pose
            new_state = _admit_keyframe(
                state, feats, pose0, fd,
                frame_id=jnp.asarray(0, jnp.int32),
            )
            new_state = _set_prev(new_state, feats, pose0)
            new_state = new_state._replace(
                frame_count=jnp.asarray(1, jnp.int32),
                last_status=jnp.asarray(STATUS_OK, jnp.int32),
                prev_delta=jnp.eye(4, dtype=pose0.dtype),
                pred_pose=pose0,
            )
            out = TrackOutput(
                ob_in_cam=se3_inverse(pose0),
                pose_in_model=pose0,
                status=jnp.asarray(STATUS_OK, jnp.int32),
                num_matches=jnp.asarray(0, jnp.int32),
                num_ba_edges=jnp.asarray(0, jnp.int32),
            )
            return new_state, out

        def track(_):
            # ---- neighbor matching + RANSAC + Procrustes init ------------
            fc = cfg.feature_corres
            rc = cfg.ransac
            # constant-velocity pose prediction (deviation from the
            # reference, which inits to the last pose, src/Bundler.cpp:67):
            # pred_pose advances by the last inter-frame delta each frame —
            # including FAIL frames — so after an occlusion the prediction
            # tracks the true motion and the reference-width match/RANSAC
            # gates still contain the correct re-acquisition model (gate
            # widths stay compile-time constants; traced widths ballooned
            # XLA compile 5x).
            pose_init = state.pred_pose
            nb = match_pair(
                feats.desc, feats.pts, feats.normals, feats.valid, pose_init,
                state.prev_desc, state.prev_pts, state.prev_normals,
                state.prev_kp_valid, state.prev_pose,
                max_dist=fc.max_dist_neighbor,
                max_normal_deg=fc.max_normal_neighbor,
                max_matches=M,
            )
            pa = feats.pts[nb.idx_a]
            pb = state.prev_pts[nb.idx_b]
            na = feats.normals[nb.idx_a]
            nbn = state.prev_normals[nb.idx_b]
            # prior maps new-frame camera points into prev-frame camera
            # points under the prediction: p_prev^-1 @ p̂_new  (= identity
            # when the prediction equals the last pose)
            prior_nb = se3_compose(se3_inverse(state.prev_pose), pose_init)
            rr = ransac_pair(
                k_neighbor, pa, pb, na, nbn, nb.valid,
                prior_nb,
                num_trials=rc.max_iter,
                inlier_dist=rc.inlier_dist,
                inlier_normal_deg=rc.inlier_normal_angle,
                max_trans=rc.max_trans_neighbor,
                max_rot_deg=rc.max_rot_deg_neighbor,
                min_matches=rc.min_match_after_ransac,
            )
            T_new_to_prev = refine_pose_on_inliers(pa, pb, rr.inliers)
            pose_new = jnp.where(
                rr.valid, se3_compose(state.prev_pose, T_new_to_prev), pose_init
            )
            fail = (~rr.valid) | (~roi_ok) | (n_feat < 5)
            # reinit gate: after a FAIL, a weak re-acquisition must not lock
            # in a wrong pose — demand reinit_min_matches inliers to resume,
            # decaying by one per extra FAIL frame (escalating patience) so a
            # hard viewpoint cannot stall recovery forever.  Consumes
            # need_reinit; the reference only ever sets it
            # (src/Bundler.cpp:96-101).
            patience = 5
            required = jnp.maximum(
                cfg.ransac.min_match_after_ransac,
                cfg.ransac.reinit_min_matches
                - jnp.maximum(state.fail_streak - patience, 0),
            )
            fail = fail | (state.need_reinit & (rr.num_inliers < required))

            # ---- BA subset + edges ---------------------------------------
            slots, sel_valid = select_ba_subset(
                state.kf_frame_id, state.kf_pose, pose_new, n_pool_sel
            )
            gat = lambda a: jnp.take(a, slots, axis=0)
            app = lambda pool, new: jnp.concatenate([pool, new[None]], axis=0)
            ba_desc = app(gat(state.kf_desc), feats.desc)
            ba_pts = app(gat(state.kf_pts), feats.pts)
            ba_nrm = app(gat(state.kf_normals), feats.normals)
            ba_kpv = app(
                gat(state.kf_kp_valid) & sel_valid[:, None], feats.valid
            )
            ba_pose = app(gat(state.kf_pose), pose_new)
            ba_valid = jnp.concatenate([sel_valid, (~fail)[None]])
            # solve-ready dense tables: gather from the pool + new frame's
            ba_dsrc = app(gat(state.kf_dsrc), fd.src)
            ba_dvalid = app(gat(state.kf_dvalid) & sel_valid[:, None], fd.valid)
            ba_dlin = app(gat(state.kf_dlin), fd.lin)
            ba_tchan = app(gat(state.kf_tchan), fd.tchan)

            dense_compact = stack_frame_dense(ba_dsrc, ba_dvalid, ba_dlin, ba_tchan)
            pool_slot_of = jnp.concatenate(
                [slots, jnp.full((1,), -1, jnp.int32)]
            )  # BA position -> pool slot (-1 for the new frame)
            # per-pair PRNG streams split BEFORE any sharding, so the pair-
            # sharded path reproduces the single-device ransac_multi_pair
            ransac_keys = jax.random.split(k_multi, P_PAIRS)
            (
                ba_out_poses, ba_rejected, no_ba, n_edges_new,
                bm_idx_a, bm_idx_b, edge_valid,
            ) = ba_pair_call(
                ba_desc, ba_pts, ba_nrm, ba_kpv, ba_pose, ba_valid,
                state.mappoints, pool_slot_of, dense_compact, K_low, fail,
                jnp.asarray(PAIR_I), jnp.asarray(PAIR_J), ransac_keys,
            )
            new_idx = K_BA - 1
            no_ba = no_ba | ba_rejected  # rejected solve keeps procrustes pose
            pose_final = jnp.where(fail, state.prev_pose, ba_out_poses[new_idx])

            # scatter optimized keyframe poses back into the pool
            kf_pose = state.kf_pose.at[
                jnp.where(sel_valid, slots, state.kf_pose.shape[0])
            ].set(ba_out_poses[:n_pool_sel], mode="drop")

            status = jnp.where(
                fail,
                STATUS_FAIL,
                jnp.where(no_ba, STATUS_NO_BA, STATUS_OK),
            ).astype(jnp.int32)

            st = state._replace(kf_pose=kf_pose)

            # ---- keyframe admission (status OK only) ---------------------
            admit = keyframe_admission(
                st.kf_frame_id, st.kf_pose, pose_final, n_feat,
                status == STATUS_OK,
                cfg.keyframe.min_feat_num, cfg.keyframe.min_rot,
            )
            new_slot = eviction_slot(st.kf_frame_id, st.kf_pose)
            st_admit = _admit_keyframe(
                st, feats, pose_final, fd,
                frame_id=st.frame_count, slot=new_slot,
            )
            if cfg.feature_corres.map_points:
                # absorb the new keyframe's verified BA edges into the
                # landmark track table (reference updateFramePairMapPoints is
                # called per matched pair, FeatureManager.cpp:448-485; here
                # only pairs touching the new frame add tracks — every
                # keyframe passes through "new" once, so tracks still span
                # the whole pool over time)
                from bundletrack_tpu.matching.mappoints import update_mappoints
                from bundletrack_tpu.matching.pairwise import MatchResult as _MR

                mp = st_admit.mappoints
                for p_idx in range(len(pair_i_np)):
                    if pair_j_np[p_idx] != K_BA - 1:
                        continue
                    pool_pos = pair_i_np[p_idx]  # BA position of the pool frame
                    pool_slot = slots[pool_pos]
                    m = _MR(
                        idx_a=bm_idx_a[p_idx],
                        idx_b=bm_idx_b[p_idx],
                        valid=edge_valid[p_idx] & sel_valid[pool_pos],
                    )
                    mp = update_mappoints(mp, pool_slot, new_slot, m)
                st_admit = st_admit._replace(mappoints=mp)
            st = jax.tree.map(
                lambda a, b: jnp.where(admit, a, b), st_admit, st
            )

            # ---- prev update (skip on FAIL: reference forgets the frame) --
            st_prev = _set_prev(st, feats, pose_final)
            st = jax.tree.map(lambda a, b: jnp.where(~fail, a, b), st_prev, st)

            # constant-velocity model update: delta re-estimated on a normal
            # OK frame, reset to identity on the recovery frame (the k-frame
            # motion is not a per-frame delta), held during FAIL; prediction
            # advances by delta every frame including FAILs
            is_fail = status == STATUS_FAIL
            delta_ok = jnp.where(
                state.fail_streak == 0,
                se3_compose(pose_final, se3_inverse(state.prev_pose)),
                jnp.eye(4, dtype=pose_final.dtype),
            )
            new_delta = jnp.where(is_fail, state.prev_delta, delta_ok)
            new_pred = jnp.where(
                is_fail,
                se3_compose(state.prev_delta, state.pred_pose),
                se3_compose(new_delta, pose_final),
            )
            st = st._replace(
                frame_count=st.frame_count + 1,
                last_status=status,
                # set on FAIL, cleared by a successful (strong) re-acquisition
                need_reinit=is_fail,
                fail_streak=jnp.where(is_fail, st.fail_streak + 1, 0).astype(
                    jnp.int32
                ),
                prev_delta=new_delta,
                pred_pose=new_pred,
            )
            out = TrackOutput(
                ob_in_cam=se3_inverse(pose_final),
                pose_in_model=pose_final,
                status=status,
                num_matches=rr.num_inliers.astype(jnp.int32),
                num_ba_edges=n_edges_new.astype(jnp.int32),
            )
            return st, out

        return jax.lax.cond(state.frame_count == 0, first_frame, track, None)

    return step


def _admit_keyframe(
    state: TrackerState, feats: FrameFeatures, pose, fd,
    frame_id, slot=None,
):
    if slot is None:
        slot = eviction_slot(state.kf_frame_id, state.kf_pose)
    mp = forget_frame_mappoints(state.mappoints, slot)
    return state._replace(
        kf_desc=state.kf_desc.at[slot].set(feats.desc),
        kf_pts=state.kf_pts.at[slot].set(feats.pts),
        kf_normals=state.kf_normals.at[slot].set(feats.normals),
        kf_kp_valid=state.kf_kp_valid.at[slot].set(feats.valid),
        kf_pose=state.kf_pose.at[slot].set(pose),
        kf_dsrc=state.kf_dsrc.at[slot].set(fd.src),
        kf_dvalid=state.kf_dvalid.at[slot].set(fd.valid),
        kf_dlin=state.kf_dlin.at[slot].set(fd.lin),
        kf_tchan=state.kf_tchan.at[slot].set(fd.tchan),
        kf_frame_id=state.kf_frame_id.at[slot].set(frame_id),
        mappoints=mp,
    )


def _set_prev(state: TrackerState, feats: FrameFeatures, pose):
    return state._replace(
        prev_desc=feats.desc,
        prev_pts=feats.pts,
        prev_normals=feats.normals,
        prev_kp_valid=feats.valid,
        prev_pose=pose,
        prev_valid=jnp.asarray(True),
    )


def track_frame(state, obs, init_pose, cfg: TrackerConfig):
    """Convenience non-specialized entry (compiles per image size)."""
    H, W = obs.gray.shape
    return make_track_frame(cfg, H, W)(state, obs, init_pose)
