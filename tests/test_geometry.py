import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from bundletrack_tpu.geometry import (
    se3_exp,
    se3_log,
    se3_inverse,
    so3_exp,
    so3_log,
    hat,
    huber,
    kabsch,
    rigid_from_three_points,
    rotation_geodesic_distance,
    transform_points,
    project,
    unproject,
    scale_intrinsics,
    bilinear_sample,
)

rng = np.random.RandomState(0)


def random_rotations(n):
    return Rotation.random(n, random_state=rng).as_matrix().astype(np.float32)


class TestSO3:
    def test_exp_matches_scipy(self):
        w = rng.randn(64, 3).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_log_roundtrip(self):
        # own RandomState: the module-global rng makes the sample set depend
        # on test execution order, and rotations near pi legitimately round-
        # trip at only ~2e-4 in f32 (d log/dR blows up at angle -> pi)
        R = Rotation.random(
            128, random_state=np.random.RandomState(42)
        ).as_matrix().astype(np.float32)
        w = so3_log(jnp.asarray(R))
        R2 = np.asarray(so3_exp(w))
        np.testing.assert_allclose(R2, R, atol=5e-4)

    def test_small_angle(self):
        w = (rng.randn(16, 3) * 1e-6).astype(np.float32)
        R = so3_exp(jnp.asarray(w))
        w2 = np.asarray(so3_log(R))
        np.testing.assert_allclose(w2, w, atol=1e-7)

    def test_near_pi(self):
        axes = rng.randn(32, 3)
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        for ang in [np.pi - 1e-4, np.pi - 1e-2, 3.0]:
            w = (axes * ang).astype(np.float32)
            R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
            w2 = np.asarray(so3_log(jnp.asarray(R)))
            R2 = Rotation.from_rotvec(w2).as_matrix()
            np.testing.assert_allclose(R2, R, atol=5e-3)

    def test_geodesic_distance(self):
        R1 = random_rotations(8)
        R2 = random_rotations(8)
        d = np.asarray(rotation_geodesic_distance(jnp.asarray(R1), jnp.asarray(R2)))
        for i in range(8):
            ang = Rotation.from_matrix(R1[i].T @ R2[i]).magnitude()
            assert abs(d[i] - ang) < 1e-4


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = rng.randn(64, 6).astype(np.float32) * 0.5
        T = se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(se3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_inverse(self):
        xi = rng.randn(16, 6).astype(np.float32)
        T = se3_exp(jnp.asarray(xi))
        eye = np.asarray(T @ se3_inverse(T))
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)

    def test_transform_points(self):
        xi = rng.randn(6).astype(np.float32)
        T = np.asarray(se3_exp(jnp.asarray(xi)))
        pts = rng.randn(10, 3).astype(np.float32)
        out = np.asarray(transform_points(jnp.asarray(T), jnp.asarray(pts)))
        ref = (T[:3, :3] @ pts.T).T + T[:3, 3]
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestHuber:
    def test_quadratic_region(self):
        e_sq = jnp.asarray([1e-6, 4e-6])
        rho0, rho1 = huber(e_sq, delta=0.005)
        np.testing.assert_allclose(np.asarray(rho0), np.asarray(e_sq), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(rho1), 1.0, rtol=1e-5)

    def test_linear_region(self):
        delta = 0.005
        e = 0.1
        rho0, rho1 = huber(jnp.asarray([e * e]), delta=delta)
        assert abs(float(rho0[0]) - (2 * delta * e - delta**2)) < 1e-8
        assert abs(float(rho1[0]) - delta / e) < 1e-8


class TestProcrustes:
    def _make_pair(self, n, noise=0.0):
        src = rng.randn(n, 3).astype(np.float32)
        R = random_rotations(1)[0]
        t = rng.randn(3).astype(np.float32)
        dst = (R @ src.T).T + t + noise * rng.randn(n, 3).astype(np.float32)
        return src, dst, R, t

    def test_kabsch_exact(self):
        src, dst, R, t = self._make_pair(50)
        T = np.asarray(kabsch(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(T[:3, :3], R, atol=1e-5)
        np.testing.assert_allclose(T[:3, 3], t, atol=1e-5)

    def test_kabsch_weighted_ignores_outliers(self):
        src, dst, R, t = self._make_pair(50)
        dst_noisy = dst.copy()
        dst_noisy[:5] += 10.0
        w = np.ones(50, dtype=np.float32)
        w[:5] = 0.0
        T = np.asarray(kabsch(jnp.asarray(src), jnp.asarray(dst_noisy), jnp.asarray(w)))
        np.testing.assert_allclose(T[:3, :3], R, atol=1e-5)

    def test_kabsch_reflection_fix(self):
        # Nearly-planar degenerate config that tends to produce reflections
        src = rng.randn(10, 3).astype(np.float32)
        src[:, 2] *= 1e-4
        R = random_rotations(1)[0]
        dst = (R @ src.T).T
        T = np.asarray(kabsch(jnp.asarray(src), jnp.asarray(dst)))
        assert np.linalg.det(T[:3, :3]) > 0.99

    def test_three_point_exact(self):
        src, dst, R, t = self._make_pair(3)
        T, valid = rigid_from_three_points(jnp.asarray(src), jnp.asarray(dst))
        T = np.asarray(T)
        assert bool(valid)
        np.testing.assert_allclose(T[:3, :3], R, atol=1e-4)
        np.testing.assert_allclose(T[:3, 3], t, atol=1e-4)

    def test_three_point_batched(self):
        src = rng.randn(7, 11, 3, 3).astype(np.float32)
        R = random_rotations(77).reshape(7, 11, 3, 3)
        t = rng.randn(7, 11, 1, 3).astype(np.float32)
        dst = np.einsum("btij,btnj->btni", R, src) + t
        T, valid = rigid_from_three_points(jnp.asarray(src), jnp.asarray(dst))
        assert np.asarray(valid).all()
        np.testing.assert_allclose(np.asarray(T)[..., :3, :3], R, atol=1e-3)

    def test_degenerate_flagged(self):
        src = np.stack([np.zeros(3), np.ones(3), 2 * np.ones(3)]).astype(np.float32)
        _, valid = rigid_from_three_points(jnp.asarray(src), jnp.asarray(src))
        assert not bool(valid)


class TestCamera:
    K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]], dtype=np.float32)

    def test_project_unproject_roundtrip(self):
        depth = (rng.rand(48, 64).astype(np.float32) + 0.5)
        K = jnp.asarray(self.K)
        pts = unproject(jnp.asarray(depth), K)
        u, v, z = project(pts, K)
        uu, vv = np.meshgrid(np.arange(64), np.arange(48))
        np.testing.assert_allclose(np.asarray(u), uu, atol=1e-3)
        np.testing.assert_allclose(np.asarray(v), vv, atol=1e-3)
        np.testing.assert_allclose(np.asarray(z), depth, atol=1e-6)

    def test_scale_intrinsics(self):
        Ks = np.asarray(scale_intrinsics(jnp.asarray(self.K), 0.25))
        assert abs(Ks[0, 0] - 150.0) < 1e-5
        assert abs(Ks[0, 2] - ((320 + 0.5) * 0.25 - 0.5)) < 1e-5

    def test_bilinear_sample(self):
        img = np.arange(12, dtype=np.float32).reshape(3, 4)
        vals, w = bilinear_sample(jnp.asarray(img), jnp.asarray([1.5]), jnp.asarray([1.0]))
        assert abs(float(vals[0]) - 5.5) < 1e-5
        assert abs(float(w[0]) - 1.0) < 1e-5

    def test_bilinear_sample_oob(self):
        img = np.ones((3, 4), dtype=np.float32)
        _, w = bilinear_sample(jnp.asarray(img), jnp.asarray([-5.0]), jnp.asarray([0.0]))
        assert float(w[0]) == 0.0
