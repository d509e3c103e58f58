"""CLI plumbing for the external fused-odometry stream (the reference's
use_eskf subscription, lvio_fusion_node.cpp:215 + :481-483): a TUM CSV
is read, re-based to its first pose, and fed per frame as the
``init_pose`` guess. Also drives ``--overview`` (run-overview figure)
through the CLI end to end."""

import numpy as np


def test_cli_run_with_init_odom_and_overview(tmp_path):
    from lvio_fusion_tpu import cli
    from lvio_fusion_tpu.datasets.synthetic import make_sequence
    from lvio_fusion_tpu.utils.trajectory import read_tum, write_tum_csv

    # the synthetic builder's exact sequence (memoized — free here); its
    # ground truth doubles as the "external ESKF" odometry stream
    seq = make_sequence(num_frames=30, H=240, W=360, num_points=400,
                        seed=0, with_imu=False, with_lidar=False)
    odom_csv = tmp_path / "eskf.csv"
    write_tum_csv(str(odom_csv), seq.gt_times, seq.gt_poses)
    ot, op = read_tum(str(odom_csv))
    assert len(ot) == 30 and op.shape == (30, 7)

    traj = tmp_path / "traj.csv"
    overview = tmp_path / "overview.png"
    cli.main(["run", "--dataset", "synthetic", "--frames", "30",
              "--init-odom", str(odom_csv),
              "--overview", str(overview), "--out", str(traj)])

    assert traj.exists() and overview.exists()
    assert overview.stat().st_size > 10_000
    t, p = read_tum(str(traj))
    assert len(t) >= 3 and np.all(np.isfinite(p))
