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

    @staticmethod
    def _graph(corrupt: bool):
        rng = np.random.RandomState(1)
        K, M = 3, 64
        pi, pj = np.triu_indices(K, k=1)
        pts = rng.rand(len(pi), M, 3).astype(np.float32)
        if corrupt:
            # mutually inconsistent correspondences: no rigid motion fits,
            # so post-solve residuals stay high
            pts_j = pts + 0.2 * rng.randn(len(pi), M, 3).astype(np.float32)
        else:
            pts_j = pts.copy()
        from bundletrack_tpu.solver import GraphInputs, SparseCorres

        corres = SparseCorres(
            pair_i=jnp.asarray(pi, jnp.int32),
            pair_j=jnp.asarray(pj, jnp.int32),
            pts_i=jnp.asarray(pts),
            pts_j=jnp.asarray(pts_j),
            valid=jnp.ones((len(pi), M), bool),
        )
        poses = np.stack([np.eye(4, dtype=np.float32)] * K)
        poses[1, :3, 3] += 0.01  # slight perturbation for the solver to fix
        return GraphInputs(
            poses=jnp.asarray(poses),
            frame_valid=jnp.ones(K, bool),
            free_mask=jnp.asarray([False, True, True]),
            corres=corres,
        )

    def test_verification_rejects_corrupted_solve(self):
        """Corrupted correspondences -> solve rejected, poses unchanged
        (reference useVerification, CUDASolverBundling.cpp:396-417)."""
        from bundletrack_tpu.config import BundleConfig
        from bundletrack_tpu.solver.gauss_newton import (
            optimize_pose_graph_verified,
        )

        cfg = BundleConfig(use_verification=True)
        inputs = self._graph(corrupt=True)
        poses, rejected, _ = optimize_pose_graph_verified(inputs, cfg)
        assert bool(rejected)
        np.testing.assert_array_equal(np.asarray(poses), np.asarray(inputs.poses))

    def test_verification_accepts_clean_solve(self):
        from bundletrack_tpu.config import BundleConfig
        from bundletrack_tpu.solver.gauss_newton import (
            optimize_pose_graph_verified,
        )

        cfg = BundleConfig(use_verification=True)
        inputs = self._graph(corrupt=False)
        poses, rejected, info = optimize_pose_graph_verified(inputs, cfg)
        assert not bool(rejected)
        # the solve actually moved the perturbed pose back
        assert not np.allclose(np.asarray(poses)[1], np.asarray(inputs.poses)[1])
        assert float(info["high_residual_frac"]) < 0.05
