"""Multi-stream fleet tracking + sharding tests on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bundletrack_tpu.config import (
    BundleConfig,
    FrontendConfig,
    KeyframeConfig,
    RansacConfig,
    ShapeConfig,
    TrackerConfig,
)
from bundletrack_tpu.data import render_synthetic_sequence
from bundletrack_tpu.eval import pose_errors
from bundletrack_tpu.parallel import (
    init_fleet_state,
    make_fleet_step,
    make_mesh,
    make_sharded_lfnet_train_step,
)
from bundletrack_tpu.tracker.state import FrameObservation


def tiny_cfg():
    return TrackerConfig(
        bundle=BundleConfig(max_ba_frames=4, num_iter_outer=3),
        keyframe=KeyframeConfig(pool_size=4, min_rot=5.0),
        frontend=FrontendConfig(top_k=64),
        ransac=RansacConfig(max_iter=128),
        shapes=ShapeConfig(max_matches=64, image_h=96, image_w=128),
    )


class TestFleet:
    def test_eight_streams_sharded(self):
        assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
        S, H, W = 8, 96, 128
        cfg = tiny_cfg()
        mesh = make_mesh({"stream": 8})
        step = make_fleet_step(cfg, H, W, mesh=mesh)
        state = init_fleet_state(cfg, H, W, S)

        # each stream gets a differently-seeded synthetic sequence
        seqs = [
            render_synthetic_sequence(num_frames=4, H=H, W=W, seed=s, orbit_deg_per_frame=3.0)
            for s in range(S)
        ]
        init_pose = jnp.asarray(
            np.stack([np.linalg.inv(s.ob_in_cam[0]) for s in seqs])
        )
        outs = []
        for f in range(4):
            obs = FrameObservation(
                gray=jnp.asarray(np.stack([s.gray[f] for s in seqs])),
                depth=jnp.asarray(np.stack([s.depth[f] for s in seqs])),
                mask=jnp.asarray(np.stack([s.mask[f] for s in seqs])),
                K=jnp.asarray(np.stack([s.K for s in seqs])),
            )
            state, out = step(state, obs, init_pose)
            outs.append(jax.tree.map(np.asarray, out))

        # every stream tracked its own sequence
        for s in range(S):
            for f in range(4):
                assert outs[f].status[s] in (0, 2)
                rot, trans = pose_errors(outs[f].ob_in_cam[s], seqs[s].ob_in_cam[f])
                assert rot < 3.0 and trans < 0.02, (s, f, rot, trans)

    def test_fleet_matches_single_stream(self):
        """A 2-stream fleet must produce the same poses as two single runs."""
        from bundletrack_tpu.tracker.driver import track_sequence

        cfg = tiny_cfg()
        H, W = 96, 128
        seqs = [
            render_synthetic_sequence(num_frames=3, H=H, W=W, seed=s) for s in range(2)
        ]
        # single-stream reference
        single_poses = [track_sequence(cfg, s)[0] for s in seqs]

        step = make_fleet_step(cfg, H, W)  # no mesh: plain vmap
        state = init_fleet_state(cfg, H, W, 2)
        init_pose = jnp.asarray(np.stack([np.linalg.inv(s.ob_in_cam[0]) for s in seqs]))
        fleet_poses = []
        for f in range(3):
            obs = FrameObservation(
                gray=jnp.asarray(np.stack([s.gray[f] for s in seqs])),
                depth=jnp.asarray(np.stack([s.depth[f] for s in seqs])),
                mask=jnp.asarray(np.stack([s.mask[f] for s in seqs])),
                K=jnp.asarray(np.stack([s.K for s in seqs])),
            )
            state, out = step(state, obs, init_pose)
            fleet_poses.append(np.asarray(out.ob_in_cam))
        for s in range(2):
            for f in range(3):
                # identical math modulo per-stream RNG stream; poses must agree
                # to tracking tolerance
                d = np.abs(fleet_poses[f][s] - single_poses[s][f]).max()
                assert d < 1e-2, (s, f, d)


class TestShardedTraining:
    def test_dp_tp_train_step(self):
        from bundletrack_tpu.frontend.lfnet import init_lfnet
        from bundletrack_tpu.models import LFNetTrainBatch

        cfg = FrontendConfig(
            kind="lfnet", input_size=32, top_k=16, desc_dim=64,
            net_channel=8, net_num_scales=3, sm_ksize=5, desc_net_channel=16,
        )
        model, params = init_lfnet(cfg)
        mesh = make_mesh({"data": 4, "model": 2})
        tx = optax.adam(1e-3)
        step, params, opt_state = make_sharded_lfnet_train_step(model, tx, params, mesh)

        # check the tp sharding actually applied
        fc1 = params["descriptor"]["fc1"]["kernel"]
        assert fc1.sharding.spec == jax.sharding.PartitionSpec(None, "model")

        B, H, W = 4, 32, 32
        rng = np.random.RandomState(0)
        img = rng.rand(B, H, W, 1).astype(np.float32)
        gx, gy = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
        warp = np.broadcast_to(np.stack([gx, gy], -1)[None], (B, H, W, 2)).copy()
        batch = LFNetTrainBatch(
            img1=jnp.asarray(img),
            img2=jnp.asarray(img),
            warp12=jnp.asarray(warp),
            warp_valid=jnp.ones((B, H, W), bool),
        )
        params2, opt_state, metrics = step(params, opt_state, batch)
        assert np.isfinite(float(metrics["loss"]))
        # params keep their sharding through the update
        fc1b = params2["descriptor"]["fc1"]["kernel"]
        assert fc1b.sharding.spec == jax.sharding.PartitionSpec(None, "model")
