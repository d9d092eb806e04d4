import jax.numpy as jnp
import numpy as np

from bundletrack_tpu.ops.fusion import fuse_depth_frames


class TestDepthFusion:
    def test_fusing_identical_frames_denoises(self):
        rng = np.random.RandomState(0)
        H, W = 32, 40
        K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32)
        base = np.full((H, W), 1.0, np.float32)
        depths = np.stack(
            [base + 0.005 * rng.randn(H, W).astype(np.float32) for _ in range(5)]
        )
        poses = np.stack([np.eye(4, dtype=np.float32)] * 5)
        fused = np.asarray(
            fuse_depth_frames(jnp.asarray(depths), jnp.asarray(poses), jnp.asarray(K))
        )
        inner = slice(4, -4)
        assert np.abs(fused[inner, inner] - 1.0).std() < np.abs(
            depths[0][inner, inner] - 1.0
        ).std()

    def test_invalid_stays(self):
        H, W = 16, 16
        K = np.array([[50.0, 0, 8], [0, 50.0, 8], [0, 0, 1]], np.float32)
        depths = np.zeros((2, H, W), np.float32)
        poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
        fused = np.asarray(
            fuse_depth_frames(jnp.asarray(depths), jnp.asarray(poses), jnp.asarray(K))
        )
        assert (fused == 0).all()


class TestSolverVerification:
    def test_high_residual_fraction_reported(self):
        from bundletrack_tpu.config import BundleConfig
        from bundletrack_tpu.solver import GraphInputs, SparseCorres
        from bundletrack_tpu.solver.gauss_newton import verify_solution

        rng = np.random.RandomState(0)
        K = 3
        pi, pj = np.triu_indices(K, k=1)
        M = 32
        pts = rng.rand(len(pi), M, 3).astype(np.float32)
        # half the matches are gross outliers under identity poses
        pts_j = pts.copy()
        pts_j[:, : M // 2] += 0.5
        corres = SparseCorres(
            pair_i=jnp.asarray(pi, jnp.int32),
            pair_j=jnp.asarray(pj, jnp.int32),
            pts_i=jnp.asarray(pts),
            pts_j=jnp.asarray(pts_j),
            valid=jnp.ones((len(pi), M), bool),
        )
        inputs = GraphInputs(
            poses=jnp.broadcast_to(jnp.eye(4), (K, 4, 4)),
            frame_valid=jnp.ones(K, bool),
            free_mask=jnp.asarray([False, True, True]),
            corres=corres,
        )
        info = verify_solution(inputs.poses, inputs, BundleConfig())
        assert float(info["high_residual_frac"]) > 0.4
        assert float(info["max_residual"]) > 0.5
