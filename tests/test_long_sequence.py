"""Long-sequence robustness: pool saturation, eviction, occlusion recovery.

The reference keeps every keyframe and only bounds the BA subset
(src/Bundler.cpp:185-274); this framework caps the keyframe pool with
redundancy-aware eviction (tracker/selection.py).  YCBInEOAT sequences run
1000+ frames, so eviction under pool saturation + drift is exactly where a
capped pool could bite — this test runs a full camera orbit (160 frames,
2.5 deg/frame = 400 deg total) with a small pool plus an occlusion dropout,
using the TRAINED LF-Net frontend (checkpoints/lfnet_params.npz), and
asserts drift stays bounded and the FAIL path recovers.

Note on depth-processing config: erode.diff is an absolute threshold tuned
for 480x640/f~576 (reference config_ycbineoat.yml); at this test's 120x160
(f=144) the equivalent setting is diff*4, else slanted faces erode away
entirely (that resolution-scaling is what the reference would need too —
CUDAImageUtil.cu:676-733 uses the same absolute threshold).
"""

import os

import numpy as np
import pytest

from bundletrack_tpu.config import (
    BundleConfig,
    DepthProcessingConfig,
    ErodeConfig,
    FrontendConfig,
    KeyframeConfig,
    RansacConfig,
    ShapeConfig,
    TrackerConfig,
)
from bundletrack_tpu.data import render_synthetic_sequence
from bundletrack_tpu.eval import adds_auc, pose_errors
from bundletrack_tpu.tracker.driver import track_sequence

N_FRAMES = 100  # full 400-deg orbit at 4 deg/frame (was 160 x 2.5)
# occlusion at the corner-on viewpoint (~180 deg) — the hardest case: the
# constant-velocity prediction (tracker/bundler.py) must carry the pose
# through the dropout so the reference-width gates still contain the correct
# re-acquisition model when the object reappears
OCCLUDED = (45, 46, 47)
CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                    "lfnet_params.npz")


@pytest.fixture(scope="module")
def long_run():
    from bundletrack_tpu.frontend import load_params_npz, make_lfnet_apply

    fcfg = FrontendConfig(kind="lfnet", input_size=192, top_k=256)
    _, params = load_params_npz(CKPT, fcfg)
    lfnet_apply = make_lfnet_apply(fcfg, params)
    cfg = TrackerConfig(
        depth_processing=DepthProcessingConfig(erode=ErodeConfig(diff=0.004)),
        bundle=BundleConfig(max_ba_frames=8),
        keyframe=KeyframeConfig(pool_size=8, min_rot=5.0),
        frontend=fcfg,
        ransac=RansacConfig(max_iter=512),
        shapes=ShapeConfig(max_matches=128, image_h=120, image_w=160),
    )
    seq = render_synthetic_sequence(
        num_frames=N_FRAMES, H=120, W=160, orbit_deg_per_frame=4.0
    )
    # occlusion dropout: the object vanishes for a few frames
    for f in OCCLUDED:
        seq.mask[f] = False
        seq.depth[f] = 0.0
    poses, statuses, trk = track_sequence(cfg, seq, lfnet_apply=lfnet_apply)
    return cfg, seq, poses, statuses, trk


class TestLongSequence:
    def test_pool_saturated_and_evicting(self, long_run):
        cfg, _, _, _, trk = long_run
        kf_ids = np.asarray(trk.state.kf_frame_id)
        assert (kf_ids >= 0).all(), "pool should be full after 100 frames"
        # eviction happened: some keyframes are from late in the run
        assert kf_ids.max() > cfg.keyframe.pool_size * 4

    def test_occlusion_fails_only_there(self, long_run):
        """FAILs cover the occlusion plus at most a short reinit window
        (weak re-acquisitions stay FAIL by the reinit_min_matches gate)."""
        _, _, _, statuses, _ = long_run
        fails = set(np.nonzero(statuses == 1)[0])
        assert set(OCCLUDED) <= fails
        # escalating-patience gate guarantees recovery within ~15 frames of
        # the occlusion end (reinit_min_matches decay, tracker/bundler.py)
        assert fails <= set(range(OCCLUDED[0], OCCLUDED[-1] + 18)), fails

    def test_recovers_after_occlusion(self, long_run):
        """Re-acquisition can start off-pose (the reference has no
        re-localization either — _need_reinit is set but never consumed,
        src/Bundler.cpp:96-101); keyframe-memory BA must pull the trajectory
        back by the end of the orbit.  The transient is chaotic, so assert
        the recovered steady state, not a fixed re-convergence frame."""
        _, seq, poses, _, _ = long_run
        tail_rot = [
            pose_errors(poses[f], seq.ob_in_cam[f])[0]
            for f in range(N_FRAMES - 20, N_FRAMES)
        ]
        assert np.mean(tail_rot) < 3.0, f"tail rot {np.mean(tail_rot)} deg"

    def test_drift_bounded_over_full_orbit(self, long_run):
        _, seq, poses, statuses, _ = long_run
        ok = statuses != 1
        rng = np.random.RandomState(0)
        model_pts = (rng.rand(500, 3).astype(np.float32) - 0.5) * 0.2
        auc = adds_auc(
            [poses[f] for f in range(N_FRAMES) if ok[f]],
            [seq.ob_in_cam[f] for f in range(N_FRAMES) if ok[f]],
            model_pts,
        )
        assert auc > 90.0, f"ADD-S AUC {auc}"
        # end-of-run pose tight after 400 deg of orbit + eviction churn
        rot_deg, trans = pose_errors(poses[-1], seq.ob_in_cam[-1])
        assert rot_deg < 3.0, f"terminal rot drift {rot_deg} deg"
        assert trans < 0.015, f"terminal trans drift {trans} m"
