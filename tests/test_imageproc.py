import jax.numpy as jnp
import numpy as np

from bundletrack_tpu.config import DepthProcessingConfig
from bundletrack_tpu.ops import (
    erode_depth,
    bilateral_filter_depth,
    process_depth,
    compute_normals,
    depth_to_cloud_and_normals,
    dilate_mask,
    mask_roi,
    largest_component_fill,
    crop_resize_square,
    keypoints_to_original,
)

K = np.array([[300.0, 0, 32], [0, 300, 24], [0, 0, 1]], dtype=np.float32)


class TestDepthOps:
    def test_erode_keeps_smooth_region(self):
        depth = np.full((32, 32), 1.0, np.float32)
        out = np.asarray(erode_depth(jnp.asarray(depth)))
        # interior must be preserved
        assert (out[4:-4, 4:-4] > 0).all()

    def test_erode_kills_lonely_pixel(self):
        depth = np.zeros((16, 16), np.float32)
        depth[8, 8] = 1.0
        out = np.asarray(erode_depth(jnp.asarray(depth)))
        assert out[8, 8] == 0.0

    def test_bilateral_smooths_noise(self):
        rng = np.random.RandomState(0)
        depth = 1.0 + 0.002 * rng.randn(32, 32).astype(np.float32)
        out = np.asarray(bilateral_filter_depth(jnp.asarray(depth)))
        assert out[8:-8, 8:-8].std() < depth[8:-8, 8:-8].std()

    def test_bilateral_preserves_invalid(self):
        depth = np.full((16, 16), 1.0, np.float32)
        depth[5, 5] = 0.0
        out = np.asarray(bilateral_filter_depth(jnp.asarray(depth)))
        assert out[5, 5] == 0.0

    def test_process_depth_chain(self):
        depth = np.full((32, 32), 1.0, np.float32)
        depth[0, 0] = 5.0  # beyond zfar -> zeroed
        out = np.asarray(process_depth(jnp.asarray(depth), DepthProcessingConfig()))
        assert out[0, 0] == 0.0
        assert abs(out[16, 16] - 1.0) < 1e-3


class TestNormals:
    def test_plane_normals(self):
        # fronto-parallel plane at z=1: normals = (0,0,-1)
        depth = np.full((48, 64), 1.0, np.float32)
        pts, normals, valid = depth_to_cloud_and_normals(jnp.asarray(depth), jnp.asarray(K))
        n = np.asarray(normals)[8:-8, 8:-8]
        np.testing.assert_allclose(n[..., 2], -1.0, atol=1e-4)

    def test_tilted_plane(self):
        # plane z = 1 + 0.3 * x  (x in meters) -> normal ∝ (0.3, 0, -1)
        H, W = 48, 64
        u = np.arange(W)[None, :].repeat(H, 0).astype(np.float32)
        fx, cx = K[0, 0], K[0, 2]
        # z = 1 / (1 - 0.3*(u-cx)/fx) gives x = (u-cx)/fx*z and z = 1 + 0.3x
        z = 1.0 / (1.0 - 0.3 * (u - cx) / fx)
        pts, normals, valid = depth_to_cloud_and_normals(jnp.asarray(z), jnp.asarray(K))
        n = np.asarray(normals)[20, 30]
        expected = np.array([0.3, 0, -1.0])
        expected /= np.linalg.norm(expected)
        np.testing.assert_allclose(n, expected, atol=1e-2)


class TestMasks:
    def test_dilate(self):
        m = np.zeros((16, 16), bool)
        m[8, 8] = True
        out = np.asarray(dilate_mask(jnp.asarray(m), iterations=1, ksize=3))
        assert out[7:10, 7:10].all()
        assert not out[5, 5]

    def test_roi(self):
        m = np.zeros((20, 30), bool)
        m[5:10, 12:18] = True
        umin, umax, vmin, vmax, ok = [np.asarray(x) for x in mask_roi(jnp.asarray(m))]
        assert (umin, umax, vmin, vmax) == (12, 17, 5, 9)
        assert ok

    def test_roi_empty(self):
        m = np.zeros((20, 30), bool)
        *_, ok = mask_roi(jnp.asarray(m))
        assert not bool(ok)

    def test_largest_component(self):
        m = np.zeros((32, 32), bool)
        m[2:20, 2:20] = True  # big blob
        m[25:28, 25:28] = True  # small blob
        out = np.asarray(largest_component_fill(jnp.asarray(m)))
        assert out[10, 10]
        assert not out[26, 26]

    def test_dilate_does_not_wrap(self):
        m = np.zeros((16, 16), bool)
        m[0, 0] = True  # corner pixel: dilation must not bleed to other edges
        out = np.asarray(dilate_mask(jnp.asarray(m), iterations=1, ksize=5))
        assert out[:3, :3].all()
        assert not out[-1].any() and not out[:, -1].any()

    def test_largest_component_long_snake(self):
        """Segmented-scan CC must label a >64-px-diameter component exactly
        (the old fixed-64-iteration diffusion fragmented it)."""
        m = np.zeros((40, 120), bool)
        m[5, 2:118] = True   # long horizontal arm
        m[5:35, 60] = True   # vertical arm
        m[34, 10:110] = True  # return arm -> geodesic diameter ~250 px
        m[2:4, 2:4] = True   # small separate blob
        out = np.asarray(largest_component_fill(jnp.asarray(m)))
        snake = m.copy()
        snake[2:4, 2:4] = False
        np.testing.assert_array_equal(out, snake)

    def test_convex_hull_fill_matches_scipy(self):
        from scipy.spatial import ConvexHull, Delaunay

        from bundletrack_tpu.ops.masks import convex_hull_fill

        rng = np.random.RandomState(3)
        H, W = 48, 64
        m = np.zeros((H, W), bool)
        pts = np.stack(
            [rng.randint(8, 40, 40), rng.randint(10, 54, 40)], axis=-1
        )  # (h, w)
        m[pts[:, 0], pts[:, 1]] = True
        out = np.asarray(convex_hull_fill(jnp.asarray(m), num_dirs=256))
        hull = Delaunay(np.stack([pts[:, 1], pts[:, 0]], -1))  # (w, h)
        gw, gh = np.meshgrid(np.arange(W), np.arange(H))
        inside = hull.find_simplex(np.stack([gw.ravel(), gh.ravel()], -1)) >= 0
        inside = inside.reshape(H, W)
        # outer approximation: every exact-hull pixel filled, and the
        # boundary band of extra pixels stays thin
        assert (out | ~inside).all()
        assert (out & ~inside).sum() <= inside.sum() * 0.25

    def test_convex_hull_empty(self):
        from bundletrack_tpu.ops.masks import convex_hull_fill

        out = np.asarray(convex_hull_fill(jnp.zeros((16, 16), bool)))
        assert not out.any()

    def test_preprocess_mask_nocs_chain(self):
        """NOCS fixture: detached blob dropped, concavity filled, dilated
        (reference Frame::segmentationByMaskFile, src/Frame.cpp:262-319)."""
        from bundletrack_tpu.config import SegmentationConfig
        from bundletrack_tpu.ops.masks import preprocess_mask

        m = np.zeros((64, 64), bool)
        # C-shaped main blob (concave)
        m[10:50, 10:20] = True
        m[10:20, 10:45] = True
        m[40:50, 10:45] = True
        # small detached blob far away
        m[55:58, 55:58] = True
        cfg = SegmentationConfig(seg_dilation_iter=1, nocs_mask_fill=True)
        out = np.asarray(preprocess_mask(jnp.asarray(m), cfg))
        assert out[30, 30]  # concavity filled by the hull
        assert not out[56, 56]  # detached blob removed
        assert out[8, 10]  # 5x5 dilation grew the boundary
        # ycbineoat path: no CC/hull, just the single 5x5 dilate
        cfg2 = SegmentationConfig()
        out2 = np.asarray(preprocess_mask(jnp.asarray(m), cfg2))
        assert out2[56, 56] and not out2[30, 30]


class TestCropResize:
    def test_roundtrip_keypoints(self):
        img = np.random.RandomState(0).rand(48, 64, 3).astype(np.float32)
        roi = (jnp.asarray(10), jnp.asarray(40), jnp.asarray(5), jnp.asarray(35))
        out, scale, ou, ov = crop_resize_square(jnp.asarray(img), roi, 32)
        assert out.shape == (32, 32, 3)
        # keypoint at crop center maps back to ROI center
        kp = jnp.asarray([[16.0, 16.0]])
        orig = np.asarray(keypoints_to_original(kp, scale, ou, ov))[0]
        # ROI is 31x31 px from (10,5); crop center ~ roi center
        assert abs(orig[0] - (10 + 16 / float(scale))) < 1e-4
        assert 20 < orig[0] < 30 and 15 < orig[1] < 25

    def test_crop_content(self):
        img = np.zeros((40, 40), np.float32)
        img[20, 20] = 100.0
        roi = (jnp.asarray(16), jnp.asarray(23), jnp.asarray(16), jnp.asarray(23))
        out, scale, *_ = crop_resize_square(jnp.asarray(img), roi, 16)
        # bright pixel lands near center of the crop
        y, x = np.unravel_index(np.asarray(out).argmax(), (16, 16))
        assert 6 <= x <= 10 and 6 <= y <= 10
