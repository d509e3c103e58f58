"""Estimator wiring with use_loop: relocator runs on the kf schedule
without corrections on a loop-free sequence (wiring smoke; the correction
math itself is covered by test_relocator)."""

import numpy as np

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.utils.trajectory import ate_rmse


def test_loop_wiring_no_false_positives():
    seq = make_sequence(num_frames=16, H=240, W=360, num_points=400,
                        seed=9, with_lidar=True, lidar_rows=16,
                        lidar_cols=360)
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10,
        use_lidar=True, use_loop=True, loop_min_elapsed=0.5,
        loop_threshold=3.0, num_scans=16, horizon_scan=360, ang_res_y=2.0,
        ang_bottom=15.0, ground_rows=8, min_range=1.0, max_range=50.0,
        max_scan_points=8192, max_ground=512, max_surf=512,
        lidar_map_cap=2048, max_keyframe_interval=0.3,
        lidar_up_axis="y", global_every_kfs=2)
    est = Estimator(seq.cam_left, seq.cam_right, cfg,
                    lidar_extrinsic=seq.lidar_extrinsic)
    for i, fr in enumerate(seq.frames):
        est.input_pointcloud(seq.scan_times[i], seq.scans[i])
        est.input_image(fr.time, fr.left, fr.right)
    est.finalize()

    assert est.relocator is not None
    # forward corridor: no revisits => no pending loops and clean ATE
    times, poses = est.trajectory()
    idx = np.searchsorted(seq.gt_times, times)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    ate = ate_rmse(poses[:, 4:], gt[:, 4:], align=False)
    assert ate < 0.2, f"loop stage corrupted a loop-free run: ATE {ate}"
