"""Photometric (dense color) term tests — in-plane alignment that the
point-to-plane term cannot observe."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from bundletrack_tpu.config import BundleConfig
from bundletrack_tpu.geometry.camera import unproject
from bundletrack_tpu.ops.intensity import intensity_gradients
from bundletrack_tpu.solver import (
    DenseFrames,
    GraphInputs,
    SparseCorres,
    optimize_pose_graph,
)


class TestIntensityGradients:
    def test_linear_ramp(self):
        H, W = 16, 20
        img = jnp.asarray(np.tile(np.arange(W, dtype=np.float32), (H, 1))) * 0.1
        gx, gy = intensity_gradients(img, jnp.ones((H, W), bool))
        np.testing.assert_allclose(np.asarray(gx)[2:-2, 2:-2], 0.1, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy)[2:-2, 2:-2], 0.0, atol=1e-6)


class TestPhotometricAlignment:
    def test_recovers_in_plane_shift(self):
        H, W = 48, 64
        K = np.array(
            [[60.0, 0, W / 2 - 0.5], [0, 60.0, H / 2 - 0.5], [0, 0, 1]], np.float32
        )
        depth = np.full((H, W), 1.0, np.float32)
        pts = np.asarray(unproject(jnp.asarray(depth), jnp.asarray(K)))
        normals = np.zeros((H, W, 3), np.float32)
        normals[..., 2] = -1.0
        valid = np.ones((H, W), bool)
        # smooth texture as a function of world x/y
        x, y = pts[..., 0], pts[..., 1]
        intensity = (
            0.5
            + 0.2 * np.sin(20.0 * x)
            + 0.2 * np.cos(17.0 * y)
        ).astype(np.float32)
        gx, gy = intensity_gradients(jnp.asarray(intensity), jnp.asarray(valid))

        stack2 = lambda a: jnp.asarray(np.stack([a, a]))
        frames = DenseFrames(
            points=stack2(pts),
            normals=stack2(normals),
            valid=stack2(valid),
            intensity=stack2(intensity),
            grad_x=stack2(np.asarray(gx)),
            grad_y=stack2(np.asarray(gy)),
        )
        # frame 1 shifted 4 mm in x: invisible to point-to-plane on a
        # fronto-parallel plane, visible to the photometric term
        poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
        poses[1][0, 3] = 0.004
        cfg = BundleConfig(
            w_sparse=0.0, w_dense_depth=0.0, w_dense_color=1.0,
            num_iter_outer=6, lm_lambda=1e-4,
        )
        corres = SparseCorres(
            pair_i=jnp.asarray([0], jnp.int32),
            pair_j=jnp.asarray([1], jnp.int32),
            pts_i=jnp.zeros((1, 4, 3)),
            pts_j=jnp.zeros((1, 4, 3)),
            valid=jnp.zeros((1, 4), bool),
        )
        inputs = GraphInputs(
            poses=jnp.asarray(poses),
            frame_valid=jnp.ones(2, bool),
            free_mask=jnp.asarray([False, True]),
            corres=corres,
            dense=frames,
            K_lowres=jnp.asarray(K),
        )
        out, _ = optimize_pose_graph(inputs, cfg)
        out = np.asarray(out)
        assert abs(out[1][0, 3]) < 0.002, out[1][:3, 3]
