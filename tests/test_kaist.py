"""KAIST Complex Urban reader: round-trip a tiny synthetic dataset in the
published sensor_data/ layout (stereo_stamp.csv + stereo/{left,right} pngs
+ xsens_imu.csv + gps.csv + VLP_left)."""

import os

import numpy as np
import pytest

from lvio_fusion_tpu.datasets.kaist import KaistUrban


@pytest.fixture()
def kaist_root(tmp_path):
    from PIL import Image

    sd = tmp_path / "sensor_data"
    (sd / "stereo" / "left").mkdir(parents=True)
    (sd / "stereo" / "right").mkdir(parents=True)
    (sd / "VLP_left").mkdir()
    t0 = 1_544_590_798_000_000_000  # ns epoch like the real data
    stamps = [t0 + i * 100_000_000 for i in range(4)]  # 10 Hz
    (sd / "stereo_stamp.csv").write_text(
        "\n".join(str(s) for s in stamps) + "\n")
    rng = np.random.default_rng(0)
    for s in stamps:
        for side in ("left", "right"):
            img = rng.integers(0, 255, (24, 32), np.uint8)
            Image.fromarray(img).save(sd / "stereo" / side / f"{s}.png")

    # IMU at 100 Hz: t, quat(4), euler(3), gyro(3), acc(3), mag(3)
    lines = []
    for i in range(40):
        t = t0 + i * 10_000_000
        vals = [0, 0, 0, 1, 0, 0, 0, 0.01, -0.02, 0.03, 0.1, 0.2, 9.81,
                0, 0, 0]
        lines.append(f"{t}," + ",".join(f"{v:.9g}" for v in vals))
    (sd / "xsens_imu.csv").write_text("\n".join(lines) + "\n")

    # GPS at 5 Hz: t, lat, lon, alt, 9 covariance entries
    lines = []
    for i in range(3):
        t = t0 + i * 200_000_000
        vals = [36.37 + i * 1e-5, 127.36, 70.0 + i] + [0.01] * 9
        lines.append(f"{t}," + ",".join(f"{v:.12g}" for v in vals))
    (sd / "gps.csv").write_text("\n".join(lines) + "\n")

    # one VLP-16 scan
    (sd / "VLP_left_stamp.csv").write_text(f"{stamps[0]}\n")
    pts = rng.normal(0, 5, (100, 4)).astype(np.float32)
    pts.tofile(sd / "VLP_left" / f"{stamps[0]}.bin")
    return str(tmp_path)


def test_kaist_reader_roundtrip(kaist_root):
    ds = KaistUrban(kaist_root, with_lidar=True)
    frames = list(ds.frames())
    assert len(frames) == 4
    assert frames[0].time == 0.0
    assert abs(frames[1].time - 0.1) < 1e-9
    assert frames[0].left.shape == (24, 32)
    assert 0.0 <= frames[0].left.min() and frames[0].left.max() <= 1.0

    imu = ds.imu()
    assert len(imu.times) == 40
    np.testing.assert_allclose(imu.gyr[0], [0.01, -0.02, 0.03], rtol=1e-5)
    np.testing.assert_allclose(imu.acc[0], [0.1, 0.2, 9.81], rtol=1e-5)
    assert abs(imu.times[1] - 0.01) < 1e-6

    gps = ds.gps()
    assert len(gps.times) == 3
    np.testing.assert_allclose(gps.enu[0], [0, 0, 0], atol=1e-6)
    # +1e-5 deg latitude ~ 1.11 m north; altitude +1 m
    assert abs(gps.enu[1][1] - 1.11) < 0.05
    assert abs(gps.enu[1][2] - 1.0) < 0.01

    scan = ds.lidar_scan(0)
    assert scan.shape == (100, 4)
