"""Kitchen-sink integration: IMU + lidar + navsat + loop + RL agent all
enabled simultaneously (the reference's full kitti configuration)."""

import numpy as np

from lvio_fusion_tpu.adapt.agent import Agent
from lvio_fusion_tpu.adapt.td3 import TD3
from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.utils.trajectory import ate_rmse


def test_all_subsystems_together():
    seq = make_sequence(num_frames=26, H=240, W=360, num_points=400,
                        seed=11, with_imu=True, with_lidar=True,
                        lidar_rows=16, lidar_cols=360)
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10,
        use_imu=True, init_kfs=8, max_keyframe_interval=0.25,
        use_lidar=True, num_scans=16, horizon_scan=360, ang_res_y=2.0,
        ang_bottom=15.0, ground_rows=8, min_range=1.0, max_range=50.0,
        max_scan_points=8192, max_ground=512, max_surf=512,
        lidar_map_cap=2048, lidar_up_axis="y",
        use_navsat=True, use_loop=True, relocator_mode=3,
        loop_min_elapsed=60.0, global_every_kfs=3)
    est = Estimator(seq.cam_left, seq.cam_right, cfg,
                    lidar_extrinsic=seq.lidar_extrinsic)
    est.set_agent(Agent(TD3(seed=3)))
    est.navsat.trust_yaw = 1.5
    est.navsat.trust_pitch = 2.0  # short sim: ~3 m total path

    rng = np.random.default_rng(0)
    imu_i = 0
    for i, fr in enumerate(seq.frames):
        while (imu_i < len(seq.imu_times)
               and seq.imu_times[imu_i] <= fr.time):
            est.input_imu(seq.imu_times[imu_i], seq.imu_acc[imu_i],
                          seq.imu_gyr[imu_i])
            imu_i += 1
        est.input_pointcloud(seq.scan_times[i], seq.scans[i])
        est.input_navsat(fr.time - 0.001,
                         seq.gt_poses[i][4:] + rng.normal(0, 0.02, 3))
        est.input_image(fr.time, fr.left, fr.right)
    est.finalize()

    assert est.imu_initialized
    assert est.navsat.initialized
    assert est.relocator is not None and est.relocator.mode == 3
    assert sum(1 for f in est.map.kf_lidar if f is not None) >= 3
    assert sum(1 for d in est.map.kf_desc if d is not None) >= 3

    times, poses = est.trajectory()
    idx = np.searchsorted(seq.gt_times, times)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    # map was gravity-rotated: compare aligned
    ate = ate_rmse(poses[:, 4:], gt[:, 4:], align=True)
    total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
    print(f"FULL keyframes={len(times)} ATE={ate:.4f} over {total:.1f} m")
    assert ate < 0.08 * max(total, 1.0), f"ATE {ate}"
