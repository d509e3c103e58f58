"""EuRoC MAV (ASL) reader: round-trip a tiny synthetic dataset in the
published mav0/ layout (cam0/cam1 data.csv + pngs + imu0 + ground truth)."""

import numpy as np
import pytest

from lvio_fusion_tpu.datasets.euroc import EurocMav


@pytest.fixture()
def euroc_root(tmp_path):
    from PIL import Image

    mav = tmp_path / "mav0"
    t0 = 1_403_636_579_763_555_584  # ns epoch like the real data
    stamps = [t0 + i * 50_000_000 for i in range(5)]  # 20 Hz
    rng = np.random.default_rng(0)
    for cam in ("cam0", "cam1"):
        (mav / cam / "data").mkdir(parents=True)
        lines = ["#timestamp [ns],filename"]
        for i, s in enumerate(stamps):
            # drop one right frame to exercise the sync tolerance
            if cam == "cam1" and i == 3:
                continue
            name = f"{s}.png"
            lines.append(f"{s},{name}")
            img = rng.integers(0, 255, (24, 32), np.uint8)
            Image.fromarray(img).save(mav / cam / "data" / name)
        (mav / cam / "data.csv").write_text("\n".join(lines) + "\n")

    (mav / "imu0").mkdir()
    lines = ["#timestamp,wx,wy,wz,ax,ay,az"]
    for i in range(50):
        t = t0 + i * 5_000_000  # 200 Hz
        lines.append(f"{t},0.01,-0.02,0.03,0.1,0.2,9.81")
    (mav / "imu0" / "data.csv").write_text("\n".join(lines) + "\n")

    (mav / "state_groundtruth_estimate0").mkdir()
    lines = ["#timestamp,px,py,pz,qw,qx,qy,qz,..."]
    for i, s in enumerate(stamps):
        lines.append(f"{s},{0.1*i},0,0,1,0,0,0,0,0,0,0,0,0,0,0,0")
    (mav / "state_groundtruth_estimate0" / "data.csv").write_text(
        "\n".join(lines) + "\n")
    return str(tmp_path)


def test_euroc_reader_roundtrip(euroc_root):
    ds = EurocMav(euroc_root)
    assert ds.n == 4  # the dropped right frame breaks one pair
    frames = list(ds.frames())
    assert len(frames) == 4
    assert frames[0].time == 0.0
    assert abs(frames[1].time - 0.05) < 1e-9
    assert frames[0].left.shape == (24, 32)
    assert 0.0 <= frames[0].left.min() and frames[0].left.max() <= 1.0

    imu = ds.imu()
    assert len(imu.times) == 50
    np.testing.assert_allclose(imu.gyr[0], [0.01, -0.02, 0.03], rtol=1e-5)
    np.testing.assert_allclose(imu.acc[0], [0.1, 0.2, 9.81], rtol=1e-5)
    assert abs(imu.times[1] - 0.005) < 1e-6

    t_gt, poses = ds.ground_truth()
    assert poses.shape == (5, 7)
    np.testing.assert_allclose(poses[0, :4], [1, 0, 0, 0])  # qw first
    np.testing.assert_allclose(poses[2, 4], 0.2, rtol=1e-5)

    # pointing straight at mav0 also works
    ds2 = EurocMav(euroc_root + "/mav0")
    assert ds2.n == 4
