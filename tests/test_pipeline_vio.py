"""End-to-end stereo VIO on a synthetic sequence with consistent IMU:
initialization must fire, gravity-align the map, and the aligned ATE must
stay small."""

import numpy as np
import pytest

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.utils.trajectory import ate_rmse


def test_vio_pipeline_initializes_and_tracks():
    seq = make_sequence(num_frames=32, H=240, W=360, num_points=400,
                        seed=1, with_imu=True, imu_rate=200.0)
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10,
        use_imu=True, init_kfs=8, max_keyframe_interval=0.25)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)

    imu_i = 0
    for fr in seq.frames:
        while (imu_i < len(seq.imu_times)
               and seq.imu_times[imu_i] <= fr.time):
            est.input_imu(seq.imu_times[imu_i], seq.imu_acc[imu_i],
                          seq.imu_gyr[imu_i])
            imu_i += 1
        est.input_image(fr.time, fr.left, fr.right)

    assert est.imu_initialized, "VI initialization never fired"
    # gravity-aligned world: estimated biases should be small (unbiased sim)
    assert float(np.abs(est.cur_bias).max()) < 0.2, est.cur_bias

    times, poses = est.trajectory()
    idx = np.searchsorted(seq.gt_times, times)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    # map was gravity-rotated => compare with rigid alignment
    ate = ate_rmse(poses[:, 4:], gt[:, 4:], align=True)
    total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
    print(f"VIO keyframes={len(times)} ATE={ate:.4f} over {total:.1f} m")
    assert ate < 0.05 * max(total, 1.0), f"ATE {ate} too large"
