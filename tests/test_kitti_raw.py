"""KITTI raw OXTS reader on a generated fixture drive."""

import os

import numpy as np

from lvio_fusion_tpu.datasets.kitti_raw import read_oxts


def test_read_oxts(tmp_path):
    drive = tmp_path / "2011_09_26_drive_0001_sync"
    oxts = drive / "oxts"
    (oxts / "data").mkdir(parents=True)
    n = 5
    with open(oxts / "timestamps.txt", "w") as f:
        for i in range(n):
            f.write(f"2011-09-26 13:02:{25 + i:02d}.{i * 100000000:09d}\n")
    # a car moving north at ~1e-5 deg/sample
    for i in range(n):
        v = np.zeros(30)
        v[0] = 49.0 + i * 1e-5   # lat
        v[1] = 8.43              # lon
        v[2] = 112.0             # alt
        v[3:6] = [0.01, -0.02, 1.2]
        v[11:14] = [0.1, 0.2, 9.8]
        v[17:20] = [0.001, 0.002, 0.05]
        with open(oxts / "data" / f"{i:010d}.txt", "w") as f:
            f.write(" ".join(f"{x:.9f}" for x in v))

    d = read_oxts(str(drive))
    assert len(d.times) == n
    assert abs(d.times[1] - d.times[0] - 1.1) < 1e-6  # 1s + 0.1s frac diff
    # ENU: northward motion ~1.11 m per 1e-5 deg
    np.testing.assert_allclose(d.enu[0], 0.0, atol=1e-9)
    assert abs(d.enu[1][1] - 1.112) < 0.01, d.enu[1]
    np.testing.assert_allclose(d.acc[0], [0.1, 0.2, 9.8], atol=1e-6)
    np.testing.assert_allclose(d.gyr[0], [0.001, 0.002, 0.05], atol=1e-6)
