"""Long-horizon suite machinery: pass reports, VOS-in-the-loop mask
generation, and the long-pass renderer (tiny scale — the full >=128-frame
480x640 runs live in bench.py)."""

import numpy as np

from bundletrack_tpu.config import (
    BundleConfig,
    SegmentationConfig,
    ShapeConfig,
    TrackerConfig,
)
from bundletrack_tpu.data.hard_world import long_hard_passes, render_hard_sequence
from bundletrack_tpu.eval.hard_suite import (
    generate_vos_masks,
    pass_report,
    run_long_suite,
)


def _tiny_cfg(H, W):
    return TrackerConfig(
        shapes=ShapeConfig(image_h=H, image_w=W),
        bundle=BundleConfig(dense_src_capacity=256),
    )


class TestLongPasses:
    def test_long_passes_render(self):
        passes = long_hard_passes(H=48, W=64, num_frames=6)
        assert set(passes) == {"orbit", "occluder", "scale2x"}
        for seq in passes.values():
            assert seq.gray.shape == (6, 48, 64)
            assert seq.mask_gt.any()

    def test_pass_report_fields(self):
        seq = render_hard_sequence("cube", num_frames=4, H=48, W=64, seed=5)
        # perfect poses -> zero errors, AUC 100
        poses = [np.asarray(p) for p in seq.ob_in_cam]
        rep = pass_report(poses, [0, 0, 2, 1], seq, "cube")
        assert rep["adds_auc"] == 100.0
        assert rep["max_trans_err_mm"] < 1e-3
        assert rep["n_fail"] == 1 and rep["n_no_ba"] == 1
        assert rep["frames"] == 4

    def test_run_long_suite_tiny(self):
        H, W = 96, 128
        passes = {
            "orbit": render_hard_sequence(
                "lshape", num_frames=5, H=H, W=W, seed=11),
        }
        out = run_long_suite(_tiny_cfg(H, W), passes=passes)
        assert "orbit" in out["passes"]
        assert out["passes"]["orbit"]["frames"] == 5
        assert isinstance(out["mean_adds_auc"], float)


class TestVOSMaskGeneration:
    def test_generate_vos_masks_shapes(self):
        import jax

        from bundletrack_tpu.models.vos import VOSNet

        H, W = 96, 128
        seq = render_hard_sequence("cube", num_frames=4, H=H, W=W, seed=3)
        model = VOSNet(out_dim=32, width=16)
        params = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 48, 64, 3), np.float32)
        )["params"]
        masks = generate_vos_masks(
            seq, params, model, SegmentationConfig(), work_hw=(48, 64)
        )
        assert masks.shape == (4, H, W)
        assert masks.dtype == bool
        # frame 0 is the sequence's own init mask
        np.testing.assert_array_equal(masks[0], np.asarray(seq.mask[0], bool))
