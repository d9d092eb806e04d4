"""Native IO + dataset loader tests (synthetic on-disk sequences)."""

import os

import numpy as np
import pytest

from bundletrack_tpu.data.native_io import (
    SequencePrefetcher,
    _read_png_python,
    get_lib,
    read_png,
    write_png,
)
from bundletrack_tpu.data.ycbineoat import YcbineoatLoader

rng = np.random.RandomState(0)


class TestPngCodec:
    def test_u8_rgb_roundtrip(self, tmp_path):
        img = rng.randint(0, 255, (33, 47, 3), np.uint8)
        p = str(tmp_path / "a.png")
        write_png(p, img)
        np.testing.assert_array_equal(read_png(p), img)
        np.testing.assert_array_equal(_read_png_python(p), img)

    def test_u16_gray_roundtrip(self, tmp_path):
        img = rng.randint(0, 65535, (24, 31)).astype(np.uint16)
        p = str(tmp_path / "d.png")
        write_png(p, img)
        np.testing.assert_array_equal(read_png(p), img)
        np.testing.assert_array_equal(_read_png_python(p), img)

    def test_u8_gray_roundtrip(self, tmp_path):
        img = rng.randint(0, 255, (10, 11), np.uint8)
        p = str(tmp_path / "m.png")
        write_png(p, img)
        np.testing.assert_array_equal(read_png(p), img)

    def test_native_lib_builds(self):
        assert get_lib() is not None

    def test_prefetcher(self, tmp_path):
        paths = []
        for i in range(8):
            p = str(tmp_path / f"{i}.png")
            write_png(p, np.full((16, 16), i * 1000, np.uint16))
            paths.append(p)
        pf = SequencePrefetcher(paths, threads=2, ahead=3)
        for i in [0, 3, 1, 7, 5]:
            np.testing.assert_array_equal(
                pf.get(i), np.full((16, 16), i * 1000, np.uint16)
            )
        pf.close()


def _make_ycbineoat_dir(root, n=3, H=32, W=40):
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    os.makedirs(root / "masks")
    os.makedirs(root / "annotated_poses")
    K = np.array([[100.0, 0, 20], [0, 100, 16], [0, 0, 1]])
    np.savetxt(root / "cam_K.txt", K)
    for i in range(n):
        fid = f"{i:05d}"
        write_png(str(root / "rgb" / f"{fid}.png"), rng.randint(0, 255, (H, W, 3), np.uint8))
        write_png(str(root / "depth" / f"{fid}.png"), np.full((H, W), 500 + i, np.uint16))
        write_png(str(root / "masks" / f"{fid}.png"), np.full((H, W), 255, np.uint8))
        pose = np.eye(4)
        pose[2, 3] = 0.5
        np.savetxt(root / "annotated_poses" / f"{fid}.txt", pose)
    return K


class TestYcbineoatLoader:
    def test_load(self, tmp_path):
        K = _make_ycbineoat_dir(tmp_path)
        loader = YcbineoatLoader(str(tmp_path))
        assert len(loader) == 3
        np.testing.assert_allclose(loader.K, K)
        fd = loader[1]
        assert fd.gray.shape == (32, 40)
        assert abs(fd.depth[0, 0] - 0.501) < 1e-6
        assert fd.mask.all()
        assert fd.frame_id == "00001"
        # init pose = inv(ob_in_cam0)
        assert abs(loader.init_pose_in_model[2, 3] + 0.5) < 1e-6
        gt = loader.gt_pose(2)
        assert gt is not None and abs(gt[2, 3] - 0.5) < 1e-6
