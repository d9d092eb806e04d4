"""Tests: host cloud utilities (voxel downsample, outlier removal) and the
run_vos / eval_nocs CLI apps."""

import json
import os

import numpy as np
import pytest

from bundletrack_tpu.ops.pointcloud import (
    statistical_outlier_removal,
    voxel_downsample,
)


class TestCloudUtils:
    def test_voxel_downsample_centroids(self):
        # two tight clusters far apart -> exactly two centroids
        rng = np.random.RandomState(0)
        c1 = rng.rand(50, 3) * 0.001
        c2 = rng.rand(60, 3) * 0.001 + 1.0
        out = voxel_downsample(np.concatenate([c1, c2]), voxel_size=0.015)
        assert out.shape == (2, 3)
        got = out[np.argsort(out[:, 0])]
        np.testing.assert_allclose(got[0], c1.mean(0), atol=1e-6)
        np.testing.assert_allclose(got[1], c2.mean(0), atol=1e-6)

    def test_voxel_downsample_reduces_and_preserves_extent(self):
        rng = np.random.RandomState(1)
        pts = rng.rand(5000, 3).astype(np.float32) * 0.2
        out = voxel_downsample(pts, 0.015)  # reference vox_size (DataLoader.cpp:92)
        assert 0 < len(out) < len(pts)
        assert np.all(out.min(0) >= pts.min(0) - 0.015)
        assert np.all(out.max(0) <= pts.max(0) + 0.015)

    def test_voxel_downsample_empty(self):
        out = voxel_downsample(np.zeros((0, 3)), 0.01)
        assert out.shape[0] == 0

    def test_outlier_removal_drops_far_points(self):
        rng = np.random.RandomState(0)
        cloud = rng.rand(200, 3).astype(np.float32) * 0.1
        outliers = np.array([[5.0, 5.0, 5.0], [-4.0, 2.0, 9.0]], np.float32)
        pts = np.concatenate([cloud, outliers])
        filtered, keep = statistical_outlier_removal(pts, num_neighbors=30, std_mul=3.0)
        assert not keep[-1] and not keep[-2]  # both far points dropped
        assert keep[:200].mean() > 0.95  # bulk survives

    def test_outlier_removal_tiny_cloud_noop(self):
        pts = np.random.RandomState(0).rand(10, 3).astype(np.float32)
        filtered, keep = statistical_outlier_removal(pts, num_neighbors=30)
        assert keep.all() and len(filtered) == 10


class TestEvalNocsApp:
    def test_perfect_predictions(self, tmp_path, capsys):
        from bundletrack_tpu.apps.eval_nocs import main

        rng = np.random.RandomState(0)
        gt_dir = tmp_path / "gt"
        pred_dir = tmp_path / "pred"
        os.makedirs(gt_dir)
        os.makedirs(pred_dir)
        pose = np.eye(4)
        pose[:3, 3] = [0.0, 0.0, 0.6]
        for i in range(6):
            th = 0.05 * i
            R = np.array(
                [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
            )
            p = pose.copy()
            p[:3, :3] = R
            p[:3, 3] += [0.01 * i, 0, 0]
            np.savetxt(gt_dir / f"{i:04d}.txt", p)
            np.savetxt(pred_dir / f"{i:04d}.txt", p)
        model = tmp_path / "model.xyz"
        np.savetxt(model, rng.rand(200, 3) * 0.1)

        # noise disabled: identical trajectories must score perfectly
        out = main([
            "--pred_dir", str(pred_dir), "--gt_dir", str(gt_dir),
            "--model", str(model), "--class_name", "camera",
            "--noise_trans", "0",
        ])
        assert out["IoU25"] == 100.0
        assert out["5deg5cm"] == 100.0

    def test_noise_injection_reanchors(self, tmp_path):
        """With the reference's 0.02 m init noise, a perfect relative
        trajectory stays within the 5cm gate (reference eval_nocs.py:95-111)."""
        from bundletrack_tpu.apps.eval_nocs import main

        rng = np.random.RandomState(0)
        gt_dir = tmp_path / "gt"
        pred_dir = tmp_path / "pred"
        os.makedirs(gt_dir)
        os.makedirs(pred_dir)
        base = np.eye(4)
        base[:3, 3] = [0, 0, 0.6]
        for i in range(5):
            p = base.copy()
            p[:3, 3] += [0.01 * i, 0.005 * i, 0]
            np.savetxt(gt_dir / f"{i:04d}.txt", p)
            np.savetxt(pred_dir / f"{i:04d}.txt", p)
        model = tmp_path / "model.xyz"
        np.savetxt(model, rng.rand(200, 3) * 0.2 - 0.1)
        out = main([
            "--pred_dir", str(pred_dir), "--gt_dir", str(gt_dir),
            "--model", str(model), "--class_name", "bowl",
            "--noise_trans", "0.02",
        ])
        # translation error equals the injected noise (<= ~3.5 cm) every frame
        assert out["IoU25"] > 0
        assert out["trans_err_cm_mean"] < 4.0


class TestRunVosApp:
    def test_mask_propagation_smoke(self, tmp_path, capsys):
        """End-to-end: synthetic frames on disk -> propagated mask PNGs."""
        from bundletrack_tpu.apps.run_vos import main
        from bundletrack_tpu.data import render_synthetic_sequence
        from bundletrack_tpu.data.native_io import read_png, write_png

        seq = render_synthetic_sequence(num_frames=3, H=64, W=64, orbit_deg_per_frame=2.0)
        img_dir = tmp_path / "rgb"
        os.makedirs(img_dir)
        for i in range(3):
            rgb = (np.stack([seq.gray[i]] * 3, -1) * 255).astype(np.uint8)
            write_png(str(img_dir / f"{i:04d}.png"), rgb)
        init_mask = tmp_path / "init.png"
        write_png(str(init_mask), seq.mask[0].astype(np.uint8) * 255)
        out_dir = tmp_path / "masks"

        main([
            "--img_dir", str(img_dir),
            "--init_mask_file", str(init_mask),
            "--mask_save_dir", str(out_dir),
        ])
        files = sorted(os.listdir(out_dir))
        assert files == ["0000.png", "0001.png", "0002.png"]
        m0 = read_png(str(out_dir / "0000.png"))
        np.testing.assert_array_equal(m0 > 0, seq.mask[0])
        # propagated masks are valid binary images of the right size
        m2 = read_png(str(out_dir / "0002.png"))
        assert m2.shape == (64, 64)
