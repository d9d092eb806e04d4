"""End-to-end solve-verification reject path through the full tracker step.

The reference compiles its useVerification check but hard-codes it off
(reference: src/cuda/Solver/CUDASolverBundling.cpp:396-417; SBA.cpp:74,87
m_bVerify=false); here `bundle.use_verification` actually gates a reject
path — optimize_pose_graph_verified reverts the solve and the bundler
reports NO_BA (tracker/bundler.py run_ba + status plumbing).  These tests
drive that path inside the full jitted step: the cond-branch interaction,
the pool-pose revert, and status propagation, plus recovery after a
corrupted-sensing episode.
"""

import numpy as np
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
from bundletrack_tpu.tracker.driver import Tracker
from bundletrack_tpu.tracker.state import STATUS_FAIL, STATUS_NO_BA, STATUS_OK

H, W = 120, 160


@pytest.fixture(scope="module")
def seq():
    return render_synthetic_sequence(
        num_frames=12, H=H, W=W, orbit_deg_per_frame=4.0
    )


def _cfg(verify_dist_thresh: float) -> TrackerConfig:
    return TrackerConfig(
        bundle=BundleConfig(
            max_ba_frames=8,
            use_verification=True,
            verify_dist_thresh=verify_dist_thresh,
            dense_src_capacity=512,
        ),
        keyframe=KeyframeConfig(pool_size=8, min_rot=5.0),
        frontend=FrontendConfig(top_k=128),
        ransac=RansacConfig(max_iter=256),
        shapes=ShapeConfig(max_matches=64, image_h=H, image_w=W),
    )


def _run(cfg, seq, corrupt_frames=(), depth_scale=1.0):
    tracker = Tracker(cfg, H, W)
    init = np.linalg.inv(seq.ob_in_cam[0])
    statuses, errs = [], []
    for f in range(seq.gray.shape[0]):
        depth = seq.depth[f]
        if f in corrupt_frames:
            depth = depth * depth_scale
        out = tracker.process_frame(
            seq.gray[f], depth, seq.mask[f], seq.K, init_pose=init
        )
        statuses.append(int(out.status))
        T = np.asarray(out.ob_in_cam)
        errs.append(float(np.linalg.norm(T[:3, 3] - seq.ob_in_cam[f][:3, 3])))
    return np.asarray(statuses), np.asarray(errs)


class TestVerificationRejectE2E:
    def test_reject_fires_and_reverts_cleanly(self, seq):
        """A trigger-happy threshold (5 mm < the keypoint-noise floor) must
        reject every BA solve: all BA frames report NO_BA, never FAIL, and
        the reverted pool/procrustes-only trajectory stays accurate — the
        revert path does not corrupt the pose state."""
        statuses, errs = _run(_cfg(verify_dist_thresh=0.005), seq)
        ba_frames = statuses[1:]  # frame 0 has no BA
        assert (ba_frames == STATUS_NO_BA).all(), statuses.tolist()
        assert STATUS_FAIL not in statuses
        assert errs.max() < 0.01, errs.tolist()

    def test_default_threshold_not_trigger_happy(self, seq):
        """The reference-parity threshold (0.02) must never reject on clean
        data: every frame tracks OK with the solve accepted."""
        statuses, errs = _run(_cfg(verify_dist_thresh=0.02), seq)
        assert (statuses == STATUS_OK).all(), statuses.tolist()
        assert errs.max() < 0.01

    def test_corruption_flagged_then_recovers(self, seq):
        """With verification enabled and a 2-frame depth-scale corruption,
        the corrupted frames are flagged (FAIL or NO_BA — never silently
        OK-with-bad-pose) and the trajectory recovers afterwards."""
        statuses, errs = _run(
            _cfg(verify_dist_thresh=0.02), seq,
            corrupt_frames=(6, 7), depth_scale=1.08,
        )
        assert (statuses[6:8] != STATUS_OK).all(), statuses.tolist()
        # recovery: last three frames track OK and tight
        assert (statuses[-3:] == STATUS_OK).all(), statuses.tolist()
        assert errs[-1] < 0.01, errs.tolist()
        # clean prefix unaffected
        assert (statuses[:6] == STATUS_OK).all()
