import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from bundletrack_tpu.config import BundleConfig
from bundletrack_tpu.geometry.se3 import se3_exp, se3_inverse, transform_points
from bundletrack_tpu.geometry.camera import unproject
from bundletrack_tpu.solver import (
    SparseCorres,
    sparse_normal_equations,
    optimize_pose_graph,
    GraphInputs,
    DenseFrames,
    solve_normal_equations_cholesky,
    solve_normal_equations_pcg,
)

rng = np.random.RandomState(0)


def random_pose(scale_rot=0.3, scale_t=0.2):
    xi = np.concatenate(
        [scale_t * rng.randn(3), scale_rot * rng.randn(3)]
    ).astype(np.float32)
    return np.asarray(se3_exp(jnp.asarray(xi)))


def build_graph(K=5, n_landmarks=60, M=64, noise=0.0):
    """K ground-truth poses, landmarks visible in all frames, all-pairs corres."""
    poses_gt = np.stack([np.eye(4, dtype=np.float32)] + [random_pose() for _ in range(K - 1)])
    landmarks = rng.rand(n_landmarks, 3).astype(np.float32) - 0.5
    # camera-frame observations: p_cam = T_inv * landmark
    cam_pts = np.stack(
        [
            np.asarray(transform_points(se3_inverse(jnp.asarray(T)), jnp.asarray(landmarks)))
            for T in poses_gt
        ]
    )
    cam_pts += noise * rng.randn(*cam_pts.shape).astype(np.float32)
    pair_i, pair_j = np.triu_indices(K, k=1)
    P = len(pair_i)
    sel = rng.randint(0, n_landmarks, (P, M))
    pts_i = np.take_along_axis(cam_pts[pair_i], sel[..., None], axis=1)
    pts_j = np.take_along_axis(cam_pts[pair_j], sel[..., None], axis=1)
    corres = SparseCorres(
        pair_i=jnp.asarray(pair_i, jnp.int32),
        pair_j=jnp.asarray(pair_j, jnp.int32),
        pts_i=jnp.asarray(pts_i),
        pts_j=jnp.asarray(pts_j),
        valid=jnp.ones((P, M), bool),
    )
    return poses_gt, corres


class TestSparseNormalEquations:
    def test_matches_autodiff(self):
        """Analytic J^T W J == autodiff jacobian of residuals wrt left-perturbation."""
        poses_gt, corres = build_graph(K=3, M=16)
        poses = jnp.asarray(np.stack([random_pose() for _ in range(3)]))
        delta_cfg = 1e9  # huge huber delta -> weights all 1, pure least squares
        H, g, cost, w = sparse_normal_equations(poses, corres, robust_delta=delta_cfg)

        def residuals_of_delta(delta):
            new_poses = jax.vmap(lambda d, T: se3_exp(d) @ T)(delta, poses)
            Ti = new_poses[corres.pair_i]
            Tj = new_poses[corres.pair_j]
            r = transform_points(Ti, corres.pts_i) - transform_points(Tj, corres.pts_j)
            return r.reshape(-1)

        delta0 = jnp.zeros((3, 6))
        J = jax.jacfwd(residuals_of_delta)(delta0).reshape(-1, 18)
        r0 = residuals_of_delta(delta0)
        H_ref = (J.T @ J).reshape(3, 6, 3, 6).transpose(0, 2, 1, 3)
        g_ref = (J.T @ r0).reshape(3, 6)
        np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref), atol=1e-2, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3, rtol=1e-3)

    def test_invalid_matches_ignored(self):
        poses_gt, corres = build_graph(K=3, M=16)
        poses = jnp.asarray(poses_gt)
        corres_all_invalid = corres._replace(valid=jnp.zeros_like(corres.valid))
        H, g, cost, _ = sparse_normal_equations(poses, corres_all_invalid, 0.005)
        assert float(jnp.abs(H).sum()) == 0.0
        assert float(cost) == 0.0


class TestPoseGraphOptimization:
    def _run(self, backend, noise=0.0, huber_outliers=False):
        K = 5
        poses_gt, corres = build_graph(K=K, M=64, noise=noise)
        if huber_outliers:
            pts_j = np.array(corres.pts_j)
            pts_j[:, :6] += 0.5  # 10% gross outliers
            corres = corres._replace(pts_j=jnp.asarray(pts_j))
        # perturb all but anchor
        init = poses_gt.copy()
        for k in range(1, K):
            xi = np.concatenate([0.03 * rng.randn(3), 0.05 * rng.randn(3)]).astype(np.float32)
            init[k] = np.asarray(se3_exp(jnp.asarray(xi))) @ init[k]
        cfg = BundleConfig(solver_backend=backend, w_dense_depth=0.0,
                           num_iter_outer=7, num_iter_inner=10)
        inputs = GraphInputs(
            poses=jnp.asarray(init),
            frame_valid=jnp.ones(K, bool),
            free_mask=jnp.asarray([False] + [True] * (K - 1)),
            corres=corres,
        )
        out, info = optimize_pose_graph(inputs, cfg)
        out = np.asarray(out)
        errs_t = np.linalg.norm(out[:, :3, 3] - poses_gt[:, :3, 3], axis=-1)
        errs_r = [
            Rotation.from_matrix(out[k, :3, :3] @ poses_gt[k, :3, :3].T).magnitude()
            for k in range(K)
        ]
        return errs_t, np.asarray(errs_r)

    def test_cholesky_converges_exact(self):
        errs_t, errs_r = self._run("cholesky")
        assert errs_t.max() < 1e-4
        assert errs_r.max() < 1e-4

    def test_pcg_converges(self):
        errs_t, errs_r = self._run("pcg")
        assert errs_t.max() < 1e-3
        assert errs_r.max() < 1e-3

    def test_huber_rejects_outliers(self):
        errs_t, errs_r = self._run("cholesky", huber_outliers=True)
        assert errs_t.max() < 5e-3
        assert errs_r.max() < 5e-3

    def test_noise_robust(self):
        errs_t, errs_r = self._run("cholesky", noise=0.001)
        assert errs_t.max() < 5e-3


class TestSolveBackendsAgree:
    def test_cholesky_vs_pcg(self):
        K = 4
        # random SPD blocked system
        A = rng.randn(K * 6, K * 6).astype(np.float32)
        Hd = A @ A.T + 10.0 * np.eye(K * 6, dtype=np.float32)
        H = jnp.asarray(Hd.reshape(K, 6, K, 6).transpose(0, 2, 1, 3))
        g = jnp.asarray(rng.randn(K, 6).astype(np.float32))
        d1 = np.asarray(solve_normal_equations_cholesky(H, g, 0.0)).ravel()
        d2 = np.asarray(solve_normal_equations_pcg(H, g, num_iters=60, lm_lambda=0.0)).ravel()
        ref = np.linalg.solve(Hd, -np.asarray(g).ravel())
        np.testing.assert_allclose(d1, ref, atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(d2, ref, atol=1e-2, rtol=1e-2)


class TestDensePointToPlane:
    def test_dense_term_refines_translation(self):
        """Two views of a tilted plane; dense-only BA recovers a small z offset."""
        from bundletrack_tpu.solver.dense_p2p import dense_p2p_normal_equations

        H_img, W_img = 32, 40
        K_mat = np.array([[40.0, 0, W_img / 2 - 0.5], [0, 40.0, H_img / 2 - 0.5], [0, 0, 1]], np.float32)
        # tilted plane depth for identity camera: z = 1 + 0.2x + 0.1y
        u = np.arange(W_img)[None, :].repeat(H_img, 0).astype(np.float32)
        v = np.arange(H_img)[:, None].repeat(W_img, 1).astype(np.float32)
        fx, fy, cx, cy = K_mat[0, 0], K_mat[1, 1], K_mat[0, 2], K_mat[1, 2]
        a, b = 0.2, 0.1
        z = 1.0 / (1.0 - a * (u - cx) / fx - b * (v - cy) / fy)
        pts = np.asarray(unproject(jnp.asarray(z), jnp.asarray(K_mat)))
        n = np.array([a, b, -1.0], np.float32)
        n /= np.linalg.norm(n)
        normals = np.tile(n, (H_img, W_img, 1)).astype(np.float32)
        valid = np.ones((H_img, W_img), bool)
        frames = DenseFrames(
            points=jnp.asarray(np.stack([pts, pts])),
            normals=jnp.asarray(np.stack([normals, normals])),
            valid=jnp.asarray(np.stack([valid, valid])),
        )
        # frame1 pose offset along plane normal by 5 mm (observable by p2p)
        poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
        poses[1][:3, 3] = 0.005 * n
        cfg = BundleConfig(w_sparse=0.0, w_dense_depth=1.0, num_iter_outer=5)
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
            K_lowres=jnp.asarray(K_mat),
        )
        Hn, gn, cost, counts = dense_p2p_normal_equations(
            jnp.asarray(poses), frames, jnp.ones(2, bool),
            corres.pair_i, corres.pair_j, jnp.asarray(K_mat),
            min_pair_pixels=100,
        )
        assert int(counts[0]) > 500  # association found plenty of pixels
        out, info = optimize_pose_graph(inputs, cfg)
        out = np.asarray(out)
        # normal-direction offset should shrink substantially
        residual_offset = abs(np.dot(out[1][:3, 3], n))
        assert residual_offset < 0.002


class TestP2PConfigPlumbing:
    """YAML p2p.* gates must reach the dense term (reference reads
    p2p.max_dist / max_normal_angle into the solver,
    src/cuda/Solver/CUDASolverBundling.cpp:93-99)."""

    def _plane_inputs(self):
        H_img, W_img = 32, 40
        K_mat = np.array(
            [[40.0, 0, W_img / 2 - 0.5], [0, 40.0, H_img / 2 - 0.5], [0, 0, 1]],
            np.float32,
        )
        u = np.arange(W_img)[None, :].repeat(H_img, 0).astype(np.float32)
        v = np.arange(H_img)[:, None].repeat(W_img, 1).astype(np.float32)
        fx, fy, cx, cy = K_mat[0, 0], K_mat[1, 1], K_mat[0, 2], K_mat[1, 2]
        a, b = 0.2, 0.1
        z = 1.0 / (1.0 - a * (u - cx) / fx - b * (v - cy) / fy)
        pts = np.asarray(unproject(jnp.asarray(z), jnp.asarray(K_mat)))
        n = np.array([a, b, -1.0], np.float32)
        n /= np.linalg.norm(n)
        normals = np.tile(n, (H_img, W_img, 1)).astype(np.float32)
        valid = np.ones((H_img, W_img), bool)
        frames = DenseFrames(
            points=jnp.asarray(np.stack([pts, pts])),
            normals=jnp.asarray(np.stack([normals, normals])),
            valid=jnp.asarray(np.stack([valid, valid])),
        )
        poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
        poses[1][:3, 3] = 0.005 * n
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
            K_lowres=jnp.asarray(K_mat),
        )
        return inputs, np.asarray(poses), n

    def test_yaml_p2p_changes_normal_equations(self):
        from bundletrack_tpu.config import TrackerConfig, load_config
        from bundletrack_tpu.solver.gauss_newton import build_normal_equations

        inputs, _, _ = self._plane_inputs()
        cfg = TrackerConfig(bundle=BundleConfig(w_sparse=0.0, w_dense_depth=1.0))
        # tighten the gate below the 5 mm plane offset -> all associations cut
        tight = load_config(
            {"p2p": {"max_dist": 0.0005, "min_pair_pixels": 10}}, base=cfg
        )
        loose = load_config(
            {"p2p": {"max_dist": 0.02, "min_pair_pixels": 10}}, base=cfg
        )
        assert tight.p2p.max_dist == 0.0005  # YAML key parsed
        H_t, _, _ = build_normal_equations(inputs, cfg.bundle, p2p=tight.p2p)
        H_l, _, _ = build_normal_equations(inputs, cfg.bundle, p2p=loose.p2p)
        assert float(jnp.abs(H_t).sum()) == 0.0
        assert float(jnp.abs(H_l).sum()) > 0.0

    def test_min_pair_pixels_gate(self):
        from bundletrack_tpu.config import P2PConfig
        from bundletrack_tpu.solver.gauss_newton import build_normal_equations

        inputs, _, _ = self._plane_inputs()
        bcfg = BundleConfig(w_sparse=0.0, w_dense_depth=1.0)
        # the 32x40 plane yields ~1280 associations; demanding more drops the pair
        H_hi, _, _ = build_normal_equations(
            inputs, bcfg, p2p=P2PConfig(min_pair_pixels=10_000)
        )
        H_lo, _, _ = build_normal_equations(
            inputs, bcfg, p2p=P2PConfig(min_pair_pixels=100)
        )
        assert float(jnp.abs(H_hi).sum()) == 0.0
        assert float(jnp.abs(H_lo).sum()) > 0.0

    def test_optimize_respects_p2p(self):
        """A gate that cuts the only signal must leave the offset unsolved."""
        from bundletrack_tpu.config import P2PConfig

        inputs, poses, n = self._plane_inputs()
        cfg = BundleConfig(w_sparse=0.0, w_dense_depth=1.0, num_iter_outer=5)
        out_loose, _ = optimize_pose_graph(inputs, cfg, p2p=P2PConfig())
        out_tight, _ = optimize_pose_graph(
            inputs, cfg, p2p=P2PConfig(max_dist=0.0005)
        )
        assert abs(np.dot(np.asarray(out_loose)[1][:3, 3], n)) < 0.002
        # gated-out dense term -> no information -> pose unchanged
        np.testing.assert_allclose(np.asarray(out_tight), poses, atol=1e-6)


class TestCompactFrame:
    """Per-frame (admission-time) compaction must match the batched per-solve
    compaction that the standalone API uses."""

    def test_matches_batched_compaction(self):
        import jax
        import jax.numpy as jnp

        from bundletrack_tpu.solver.dense_p2p import (
            DenseFrames,
            compact_dense_frames,
            compact_frame,
            stack_frame_dense,
        )

        rng = np.random.RandomState(3)
        K, H, W, C = 4, 24, 32, 64
        pts = jnp.asarray(rng.rand(K, H, W, 3).astype(np.float32))
        nrm = jnp.zeros((K, H, W, 3)).at[..., 2].set(-1.0)
        val = jnp.asarray(rng.rand(K, H, W) > 0.5)

        batched = compact_dense_frames(
            DenseFrames(points=pts, normals=nrm, valid=val), capacity=C
        )
        per_frame = jax.vmap(lambda p, n, v: compact_frame(p, n, v, C))(
            pts, nrm, val
        )
        stacked = stack_frame_dense(
            per_frame.src, per_frame.valid, per_frame.lin, per_frame.tchan
        )
        np.testing.assert_allclose(
            np.asarray(stacked.src), np.asarray(batched.src), atol=0
        )
        np.testing.assert_array_equal(
            np.asarray(stacked.src_valid), np.asarray(batched.src_valid)
        )
        np.testing.assert_array_equal(
            np.asarray(stacked.src_lin), np.asarray(batched.src_lin)
        )
        np.testing.assert_array_equal(
            np.asarray(stacked.tchan, np.float32),
            np.asarray(batched.tchan, np.float32),
        )

    def test_dense_solve_same_result_precompacted(self):
        """optimize_pose_graph(dense=...) == optimize_pose_graph(dense_compact=...)."""
        import jax
        import jax.numpy as jnp

        from bundletrack_tpu.config import BundleConfig
        from bundletrack_tpu.solver import (
            DenseFrames,
            GraphInputs,
            SparseCorres,
            optimize_pose_graph,
        )
        from bundletrack_tpu.solver.dense_p2p import compact_dense_frames

        rng = np.random.RandomState(0)
        K, M = 4, 32
        pi, pj = np.triu_indices(K, k=1)
        P = len(pi)
        pa = jnp.asarray(rng.rand(P, M, 3).astype(np.float32))
        corres = SparseCorres(
            pair_i=jnp.asarray(pi, jnp.int32),
            pair_j=jnp.asarray(pj, jnp.int32),
            pts_i=pa,
            pts_j=pa + 0.01,
            valid=jnp.ones((P, M), bool),
        )
        Hd, Wd = 16, 16
        dense = DenseFrames(
            points=jnp.asarray(rng.rand(K, Hd, Wd, 3).astype(np.float32)),
            normals=jnp.zeros((K, Hd, Wd, 3)).at[..., 2].set(-1.0),
            valid=jnp.ones((K, Hd, Wd), bool),
        )
        Klow = jnp.asarray(
            np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]], np.float32)
        )
        cfg = BundleConfig(num_iter_outer=2, dense_src_capacity=64)
        base = GraphInputs(
            poses=jnp.broadcast_to(jnp.eye(4), (K, 4, 4)),
            frame_valid=jnp.ones(K, bool),
            free_mask=jnp.arange(K) > 0,
            corres=corres,
            dense=dense,
            K_lowres=Klow,
        )
        p1, _ = optimize_pose_graph(base, cfg)
        cd = compact_dense_frames(dense, capacity=64)
        p2, _ = optimize_pose_graph(
            base._replace(dense=None, dense_compact=cd), cfg
        )
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
