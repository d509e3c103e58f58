"""Native data loader + KITTI reader on generated fixture files."""

import os

import numpy as np
import pytest
from PIL import Image

from lvio_fusion_tpu.datasets import native
from lvio_fusion_tpu.datasets.kitti import KittiOdometry


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    seq = root / "sequences" / "07"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    (seq / "velodyne").mkdir(parents=True)
    (root / "poses").mkdir(parents=True)

    rng = np.random.default_rng(0)
    n = 6
    H, W = 90, 160
    for i in range(n):
        for cam in ("image_0", "image_1"):
            img = (rng.uniform(0, 255, (H, W))).astype(np.uint8)
            Image.fromarray(img, "L").save(seq / cam / f"{i:06d}.png")
        pts = rng.uniform(-10, 10, (1000, 4)).astype(np.float32)
        pts.tofile(seq / "velodyne" / f"{i:06d}.bin")
    np.savetxt(seq / "times.txt", np.arange(n) * 0.1)
    with open(seq / "calib.txt", "w") as f:
        f.write("P0: 700 0 80 0 0 700 45 0 0 0 1 0\n")
        f.write("P1: 700 0 80 -378 0 700 45 0 0 0 1 0\n")
        f.write("Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    poses = np.zeros((n, 12))
    poses[:, 0] = poses[:, 5] = poses[:, 10] = 1.0
    poses[:, 11] = np.arange(n) * 0.5  # forward z
    np.savetxt(root / "poses" / "07.txt", poses)
    return str(root)


def test_native_velodyne_roundtrip(tmp_path):
    pts = np.arange(40, dtype=np.float32).reshape(10, 4)
    path = tmp_path / "scan.bin"
    pts.tofile(path)
    out = native.load_velodyne(str(path))
    np.testing.assert_array_equal(out, pts)


def test_native_png_roundtrip(tmp_path):
    img = (np.random.default_rng(1).uniform(0, 255, (60, 80))
           ).astype(np.uint8)
    path = tmp_path / "img.png"
    Image.fromarray(img, "L").save(path)
    out = native.load_png_gray(str(path))
    np.testing.assert_array_equal(out, img)


def test_native_lib_compiles():
    lib = native._load()
    assert lib is not None, "native dataloader failed to build"


def test_kitti_reader(kitti_root):
    ds = KittiOdometry(kitti_root, "07", with_lidar=True, prefetch=4)
    assert ds.n == 6
    assert abs(ds.baseline - 378.0 / 700.0) < 1e-6
    t, gt = ds.ground_truth()
    assert gt.shape == (6, 7)
    assert abs(gt[-1, 6] - 2.5) < 1e-6

    frames = list(ds.frames())
    assert len(frames) == 6
    f = frames[0]
    assert f.left.shape == (90, 160) and f.left.dtype == np.float32
    assert f.scan is not None and f.scan.shape[1] == 4
    assert 0.0 <= f.left.min() and f.left.max() <= 1.0
