"""Hostile end-to-end ATE gate (the in-repo stand-in for dataset replay
while no real KITTI/KAIST data is mounted): a long closed-loop sequence
with exposure drift, sensor noise, and moving occluders, run through the
FULL LVIO + GNSS + loop-closure configuration, with the final ATE
asserted against the BASELINE accuracy target.

Covers, in one run: equalizeHist under exposure drift, tracking
robustness to occluders/noise, VI initialization + gravity alignment,
lidar scan-to-map refinement, GNSS alignment + section refinement, loop
detection + pose-graph correction + FilterOldSubmaps bookkeeping, and
the async-BA forward re-solve — the whole deterministic schedule.
"""

import numpy as np
import pytest

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.utils.trajectory import ate_rmse


@pytest.mark.slow
def test_hostile_closed_loop_full_stack():
    seq = make_sequence(
        num_frames=160, H=240, W=360, num_points=1400, seed=11,
        speed=2.0, closed_loop=True, loop_turns=1.35,
        with_imu=True, imu_rate=200.0,
        with_lidar=True, lidar_rows=16, lidar_cols=360,
        exposure_drift=0.3, pixel_noise=0.02, num_occluders=2)

    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10,
        use_imu=True, init_kfs=8,
        use_lidar=True, num_scans=16, horizon_scan=360, ang_res_y=2.0,
        ang_bottom=15.0, ground_rows=8, min_range=1.0, max_range=50.0,
        max_scan_points=8192, max_ground=512, max_surf=512,
        lidar_map_cap=2048, lidar_up_axis="y",
        use_navsat=True, use_loop=True, loop_min_elapsed=8.0,
        loop_threshold=3.0, global_every_kfs=6,
        max_keyframe_interval=0.3,
        equalize_hist=True)  # exposure drift demands it
    est = Estimator(seq.cam_left, seq.cam_right, cfg,
                    lidar_extrinsic=seq.lidar_extrinsic)
    est.navsat.trust_yaw = 2.0
    est.navsat.trust_pitch = 4.0

    # GPS track: gt in a yawed+offset ENU frame with noise
    yaw = 0.3
    Rz = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                   [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
    off = np.array([40.0, -20.0, 2.0])
    rng = np.random.default_rng(1)

    imu_i = 0
    for i, fr in enumerate(seq.frames):
        while (imu_i < len(seq.imu_times)
               and seq.imu_times[imu_i] <= fr.time):
            est.input_imu(seq.imu_times[imu_i], seq.imu_acc[imu_i],
                          seq.imu_gyr[imu_i])
            imu_i += 1
        est.input_pointcloud(seq.scan_times[i], seq.scans[i])
        p_enu = Rz.T @ (seq.gt_poses[i][4:] - off) + rng.normal(0, 0.05, 3)
        est.input_navsat(fr.time - 0.001, p_enu)
        est.input_image(fr.time, fr.left, fr.right)
    est.finalize()

    assert est.imu_initialized, "VI init never fired on the hostile run"
    assert est.navsat.initialized, "GNSS alignment never initialized"

    times, poses = est.trajectory()
    assert len(times) >= 10, f"only {len(times)} keyframes"
    idx = np.searchsorted(seq.gt_times, times)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
    ate = ate_rmse(poses[:, 4:], gt[:, 4:], align=True)
    closure = np.linalg.norm(seq.gt_poses[-1][4:] - seq.gt_poses[0][4:])
    print(f"HOSTILE kfs={len(times)} ATE={ate:.3f} over {total:.1f} m "
          f"(gt closure {closure:.2f} m) loops={len(est.pose_graph.submaps)}")
    # the closed circle must actually produce a corrected loop submap
    assert len(est.pose_graph.submaps) >= 1, "no loop correction fired"
    # BASELINE gate: ATE within 5% of trajectory length on the full stack
    assert ate < 0.05 * total, f"hostile ATE {ate} over {total} m"
