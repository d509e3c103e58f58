"""End-to-end stereo + lidar odometry: scans attach to keyframes, leaving
keyframes get scan-to-map refined, ATE stays small."""

import numpy as np

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.utils.trajectory import ate_rmse


def test_lvio_pipeline_runs_and_refines():
    seq = make_sequence(num_frames=24, H=240, W=360, num_points=400,
                        seed=3, with_lidar=True, lidar_rows=16,
                        lidar_cols=360)
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10,
        use_lidar=True, num_scans=16, horizon_scan=360, ang_res_y=2.0,
        ang_bottom=15.0, ground_rows=8, min_range=1.0, max_range=50.0,
        max_scan_points=8192, max_ground=512, max_surf=512,
        lidar_map_cap=2048, max_keyframe_interval=0.3,
        lidar_up_axis="y")  # camera-world: y is vertical
    est = Estimator(seq.cam_left, seq.cam_right, cfg,
                    lidar_extrinsic=seq.lidar_extrinsic)

    for i, fr in enumerate(seq.frames):
        est.input_pointcloud(seq.scan_times[i], seq.scans[i])
        est.input_image(fr.time, fr.left, fr.right)
    est.finalize()

    # every keyframe must have lidar features attached
    n_lidar = sum(1 for f in est.map.kf_lidar if f is not None)
    assert n_lidar >= est.map.num_kfs - 1, "lidar features missing on kfs"
    # scan-to-map refinement must have run on all kfs by finalize
    assert est._lidar_done == est.map.num_kfs

    times, poses = est.trajectory()
    idx = np.searchsorted(seq.gt_times, times)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    ate = ate_rmse(poses[:, 4:], gt[:, 4:], align=False)
    total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
    print(f"LVIO keyframes={len(times)} ATE={ate:.4f} over {total:.1f} m")
    assert ate < 0.06 * max(total, 1.0), f"ATE {ate} too large"
