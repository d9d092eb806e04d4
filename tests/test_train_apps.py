"""Tests: warp-field ground truth + the LF-Net / VOS trainer CLIs."""

import json

import numpy as np
import pytest

from bundletrack_tpu.data import render_synthetic_sequence
from bundletrack_tpu.data.pairs import (
    lfnet_pair_batch,
    vos_clip_batch,
    warp_field_from_depth,
)


class TestWarpField:
    def test_geometric_consistency(self):
        """Unprojecting frame-2 depth at warped coords must give the same
        object-frame point as unprojecting frame 1 at the source pixel."""
        seq = render_synthetic_sequence(num_frames=2, H=96, W=128, orbit_deg_per_frame=5.0)
        K = seq.K
        warp, valid = warp_field_from_depth(
            seq.depth[0], K, seq.ob_in_cam[0], seq.ob_in_cam[1],
            depth2=seq.depth[1], mask1=seq.mask[0],
        )
        assert valid.sum() > 500

        H, W = seq.depth[0].shape
        u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))

        def unproject_to_obj(depth, uu, vv, ob_in_cam):
            z = depth
            x = (uu - K[0, 2]) / K[0, 0] * z
            y = (vv - K[1, 2]) / K[1, 1] * z
            p = np.stack([x, y, z], -1)
            T = np.linalg.inv(ob_in_cam)
            return p @ T[:3, :3].T + T[:3, 3]

        p1_obj = unproject_to_obj(seq.depth[0], u, v, seq.ob_in_cam[0])
        ui = np.clip(np.round(warp[..., 0]).astype(int), 0, W - 1)
        vi = np.clip(np.round(warp[..., 1]).astype(int), 0, H - 1)
        d2 = seq.depth[1][vi, ui]
        p2_obj = unproject_to_obj(d2, warp[..., 0], warp[..., 1], seq.ob_in_cam[1])
        err = np.linalg.norm(p1_obj - p2_obj, axis=-1)
        # nearest-pixel depth lookup on a 0.2 m cube at ~128 px: a few mm
        assert np.median(err[valid]) < 0.01

    def test_occlusion_pixels_invalid(self):
        """Pixels whose correspondent is occluded in frame 2 must be masked."""
        seq = render_synthetic_sequence(num_frames=2, H=96, W=128, orbit_deg_per_frame=30.0)
        _, valid_checked = warp_field_from_depth(
            seq.depth[0], seq.K, seq.ob_in_cam[0], seq.ob_in_cam[1],
            depth2=seq.depth[1], mask1=seq.mask[0],
        )
        _, valid_uncheck = warp_field_from_depth(
            seq.depth[0], seq.K, seq.ob_in_cam[0], seq.ob_in_cam[1],
            depth2=None, mask1=seq.mask[0],
        )
        # a 30-degree rotation hides part of the cube face
        assert valid_checked.sum() < valid_uncheck.sum()

    def test_batch_builders(self):
        seq = render_synthetic_sequence(num_frames=4, H=64, W=64)
        b = lfnet_pair_batch(seq, [(0, 1), (1, 2)])
        assert b["img1"].shape == (2, 64, 64, 1)
        assert b["warp12"].shape == (2, 64, 64, 2)
        c = vos_clip_batch(seq, [0], 3)
        assert c["clips"].shape == (1, 3, 64, 64, 3)
        assert c["labels"].shape == (1, 3, 64, 64)


class TestTrainerApps:
    def test_train_lfnet_cli_smoke(self, tmp_path, capsys):
        """CLI wiring: steps run, loss trends down, checkpoint written.
        (Sharp descent is asserted in test_lfnet.py
        test_train_step_reduces_loss on a controlled batch — at this tiny
        CLI config the loss oscillates near a flat optimum, so the check
        here is the noise-robust mean-of-tail <= mean-of-head.)"""
        from bundletrack_tpu.apps.train_lfnet import main

        metrics = main([
            "--steps", "6", "--size", "32", "--batch", "2", "--top-k", "16",
            "--desc-dim", "32", "--num-seqs", "1", "--log-every", "1",
            "--net-channel", "8", "--num-scales", "3", "--desc-channel", "16",
            "--sm-ksize", "5",
            "--mesh", "none", "--lr", "1e-3",
            "--ckpt-dir", str(tmp_path / "ck"), "--ckpt-every", "6",
        ])
        lines = [
            json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")
        ]
        losses = [l["loss"] for l in lines]
        assert len(losses) == 6
        assert np.all(np.isfinite(losses))
        assert np.mean(losses[-3:]) <= np.mean(losses[:3]) + 1e-3
        assert (tmp_path / "ck" / "meta.json").exists()

    def test_train_lfnet_resume(self, tmp_path, capsys):
        from bundletrack_tpu.apps.train_lfnet import main

        args = [
            "--size", "32", "--batch", "2", "--top-k", "16",
            "--desc-dim", "32", "--num-seqs", "1", "--log-every", "2",
            "--net-channel", "8", "--num-scales", "3", "--desc-channel", "16",
            "--sm-ksize", "5",
            "--mesh", "none", "--ckpt-dir", str(tmp_path / "ck"),
            "--ckpt-every", "2",
        ]
        main(["--steps", "2"] + args)
        main(["--steps", "4", "--resume"] + args)
        meta = json.loads((tmp_path / "ck" / "meta.json").read_text())
        assert meta["step"] == 4

    def test_train_vos_cli(self, capsys):
        from bundletrack_tpu.apps.train_vos import main

        metrics = main([
            "--steps", "4", "--size", "48", "--batch", "2", "--clip-len", "3",
            "--num-seqs", "1", "--log-every", "2", "--mesh", "none",
        ])
        assert np.isfinite(float(metrics["loss"]))
