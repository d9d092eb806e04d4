import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from bundletrack_tpu.eval.nocs_protocol import (
    compute_3d_iou,
    degree_cm_error,
    evaluate_nocs,
    perturb_init_pose,
    reanchor_trajectory,
)

rng = np.random.RandomState(0)


def unit_bbox():
    corners = np.array(
        [[x, y, z] for x in (-0.05, 0.05) for y in (-0.1, 0.1) for z in (-0.03, 0.03)]
    ).T
    return corners.astype(np.float32)


def pose(rotvec=(0, 0, 0), t=(0, 0, 0)):
    T = np.eye(4)
    T[:3, :3] = Rotation.from_rotvec(rotvec).as_matrix()
    T[:3, 3] = t
    return T


class TestIoU:
    def test_identical_pose_iou_one(self):
        T = pose((0.3, 0.2, 0.1), (0.1, 0.2, 0.3))
        assert compute_3d_iou(T, T, unit_bbox(), "laptop") == pytest.approx(1.0)

    def test_disjoint_iou_zero(self):
        assert compute_3d_iou(
            pose(), pose(t=(1, 0, 0)), unit_bbox(), "laptop"
        ) == 0.0

    def test_y_symmetry_sweep(self):
        # a bottle rotated about y must still give IoU ~1
        T1 = pose()
        T2 = pose(rotvec=(0, np.pi / 3, 0))
        asym = compute_3d_iou(T1, T2, unit_bbox(), "laptop")
        sym = compute_3d_iou(T1, T2, unit_bbox(), "bottle")
        assert sym > asym
        assert sym > 0.9


class TestDegreeCm:
    def test_symmetric_ignores_y_spin(self):
        T1 = pose()
        T2 = pose(rotvec=(0, 1.0, 0))
        r, t = degree_cm_error(T1, T2, "bottle")
        assert r < 1e-3
        r2, _ = degree_cm_error(T1, T2, "laptop")
        assert r2 > 50.0

    def test_translation(self):
        _, t = degree_cm_error(pose(), pose(t=(0, 0.03, 0)), "laptop")
        assert t == pytest.approx(0.03)


class TestNoiseInjection:
    def test_perturb_within_bounds(self):
        p = perturb_init_pose(pose(), trans_noise=0.02, rng=np.random.RandomState(1))
        assert np.abs(p[:3, 3]).max() <= 0.02 + 1e-9

    def test_reanchor_preserves_relative_motion(self):
        traj = [pose(t=(0, 0, 0.5)), pose((0, 0.1, 0), (0.01, 0, 0.5))]
        noisy = perturb_init_pose(traj[0], 0.02, rng=np.random.RandomState(2))
        out = reanchor_trajectory(traj, noisy)
        rel_orig = traj[1] @ np.linalg.inv(traj[0])
        rel_new = out[1] @ np.linalg.inv(out[0])
        np.testing.assert_allclose(rel_new, rel_orig, atol=1e-10)


class TestEvaluateNocs:
    def test_perfect_tracking(self):
        gts = [pose((0, 0.1 * i, 0), (0, 0, 0.5 + 0.01 * i)) for i in range(5)]
        out = evaluate_nocs(gts, gts, unit_bbox(), "laptop")
        assert out["5deg5cm"] == 100.0
        assert out["IoU25"] == 100.0
        assert out["rot_err_deg_mean"] == pytest.approx(0.0, abs=1e-3)
