import jax.numpy as jnp
import numpy as np
import pytest

from bundletrack_tpu.config import TrackerConfig, load_config, nocs_config
from bundletrack_tpu.geometry.se3 import so3_exp
from bundletrack_tpu.tracker.selection import (
    eviction_slot,
    keyframe_admission,
    select_ba_subset,
)


def pose_with_rot_z(deg):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(so3_exp(jnp.asarray([0, 0, np.deg2rad(deg)], jnp.float32)))
    return T


class TestKeyframeAdmission:
    def _pool(self, degs, cap=8):
        ids = np.full(cap, -1, np.int32)
        poses = np.stack([np.eye(4, dtype=np.float32)] * cap)
        for i, d in enumerate(degs):
            ids[i] = i
            poses[i] = pose_with_rot_z(d)
        return jnp.asarray(ids), jnp.asarray(poses)

    def test_admits_when_far_from_all(self):
        ids, poses = self._pool([0.0, 20.0])
        ok = keyframe_admission(
            ids, poses, jnp.asarray(pose_with_rot_z(40.0)), jnp.asarray(100),
            jnp.asarray(True), min_feat_num=0, min_rot_deg=10.0,
        )
        assert bool(ok)

    def test_rejects_when_close_to_any(self):
        ids, poses = self._pool([0.0, 20.0])
        ok = keyframe_admission(
            ids, poses, jnp.asarray(pose_with_rot_z(25.0)), jnp.asarray(100),
            jnp.asarray(True), min_feat_num=0, min_rot_deg=10.0,
        )
        assert not bool(ok)

    def test_rejects_on_bad_status_or_few_feats(self):
        ids, poses = self._pool([0.0])
        far = jnp.asarray(pose_with_rot_z(90.0))
        assert not bool(
            keyframe_admission(ids, poses, far, jnp.asarray(100),
                               jnp.asarray(False), 0, 10.0)
        )
        assert not bool(
            keyframe_admission(ids, poses, far, jnp.asarray(3),
                               jnp.asarray(True), 5, 10.0)
        )


class TestSubsetSelection:
    def test_selects_closest_in_rotation(self):
        """greedy_rot prefers keyframes with min cumulative rotation to the set
        (reference Bundler.cpp:243-273 picks minimum cum_dist)."""
        cap = 8
        ids = np.full(cap, -1, np.int32)
        poses = np.stack([np.eye(4, dtype=np.float32)] * cap)
        degs = [0.0, 10.0, 50.0, 60.0, 12.0]
        for i, d in enumerate(degs):
            ids[i] = i
            poses[i] = pose_with_rot_z(d)
        new_pose = jnp.asarray(pose_with_rot_z(11.0))
        slots, valid = select_ba_subset(
            jnp.asarray(ids), jnp.asarray(poses), new_pose, max_pool_frames=3
        )
        sel = set(np.asarray(slots)[np.asarray(valid)].tolist())
        # oldest (0 deg) always in; then the two near 11 deg (slots 1 and 4)
        assert 0 in sel
        assert sel == {0, 1, 4}

    def test_all_fit(self):
        cap = 4
        ids = jnp.asarray([0, 1, -1, -1], jnp.int32)
        poses = jnp.stack([jnp.eye(4)] * 4)
        slots, valid = select_ba_subset(ids, poses, jnp.eye(4), max_pool_frames=3)
        assert int(valid.sum()) == 2
        # sorted by frame id
        s = np.asarray(slots)[np.asarray(valid)]
        assert list(s) == [0, 1]


class TestEviction:
    def test_prefers_free_slot(self):
        ids = jnp.asarray([0, 1, -1, 2], jnp.int32)
        poses = jnp.stack([jnp.eye(4)] * 4)
        assert int(eviction_slot(ids, poses)) == 2

    def test_evicts_most_redundant_not_oldest(self):
        ids = jnp.asarray([0, 1, 2, 3], jnp.int32)
        poses = jnp.stack(
            [
                jnp.asarray(pose_with_rot_z(d))
                for d in [0.0, 30.0, 31.0, 90.0]
            ]
        )
        # slots 1 and 2 are nearly identical; oldest (0) is protected
        assert int(eviction_slot(ids, poses)) in (1, 2)


class TestConfigYamlCompat:
    def test_loads_reference_ycbineoat_yaml(self):
        cfg = load_config("/root/reference/config_ycbineoat.yml")
        assert cfg.bundle.num_iter_outer == 7
        assert cfg.bundle.num_iter_inner == 5
        assert cfg.bundle.max_ba_frames == 15
        assert cfg.bundle.robust_delta == pytest.approx(0.005)
        assert cfg.keyframe.min_rot == 10
        assert cfg.feature_corres.max_dist_neighbor == pytest.approx(0.03)
        assert cfg.ransac.max_iter == 2000
        assert cfg.ransac.inlier_dist == pytest.approx(0.01)
        assert cfg.p2p.max_dist == pytest.approx(0.02)
        assert cfg.depth_processing.erode.ratio == pytest.approx(0.8)
        assert cfg.depth_processing.bilateral_filter.sigma_d == 2

    def test_loads_reference_nocs_yaml(self):
        cfg = load_config("/root/reference/config_nocs.yml", base=nocs_config())
        assert cfg.use_6pack_datalist
        assert cfg.bundle.min_fm_edges_newframe == 10
        assert cfg.feature_corres.max_dist_neighbor == pytest.approx(10000)
        assert cfg.ransac.inlier_dist == pytest.approx(0.005)
        assert cfg.segmentation.seg_dilation_iter == 3

    def test_unknown_keys_ignored(self):
        cfg = load_config({"sift": {"scales": [2, 4, 8]}, "port": "5555"})
        assert isinstance(cfg, TrackerConfig)
