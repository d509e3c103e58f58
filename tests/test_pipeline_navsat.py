"""End-to-end VO + navsat: GPS fixes attach to keyframes, the ENU->map
extrinsic initializes, and quick-fix keeps the trajectory pinned."""

import numpy as np

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.utils.trajectory import ate_rmse


def test_navsat_pipeline():
    seq = make_sequence(num_frames=28, H=240, W=360, num_points=400,
                        seed=5, speed=2.2, yaw_rate=0.0)
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10,
        use_navsat=True, max_keyframe_interval=0.25, global_every_kfs=3,
        navsat_v=True)  # GPS-speed prediction seeding (frontend.cpp:104-106)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    # navsat trust gates assume vehicle scales; relax for the short sim
    est.navsat.trust_yaw = 2.0
    est.navsat.trust_pitch = 4.0

    # GPS track: gt positions in a yawed+offset ENU frame, small noise
    yaw = 0.4
    Rz = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                   [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
    off = np.array([100.0, -50.0, 3.0])
    rng = np.random.default_rng(0)

    for i, fr in enumerate(seq.frames):
        p_enu = Rz.T @ (seq.gt_poses[i][4:] - off) \
            + rng.normal(0, 0.02, 3)
        est.input_navsat(fr.time - 0.001, p_enu)
        est.input_image(fr.time, fr.left, fr.right)
    est.finalize()

    assert est.navsat.initialized, "navsat never initialized"
    assert len(est.navsat.kf_fix) >= est.map.num_kfs - 2
    # navsat_v: GPS-derived speed must reflect the simulated velocity
    t_mid = seq.frames[len(seq.frames) // 2].time
    v = est.navsat.speed(t_mid, t_mid - 0.4)
    assert abs(v - 2.2) < 0.5, f"GPS speed {v} vs simulated 2.2 m/s"

    times, poses = est.trajectory()
    idx = np.searchsorted(seq.gt_times, times)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    ate = ate_rmse(poses[:, 4:], gt[:, 4:], align=False)
    total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
    print(f"NAVSAT keyframes={len(times)} ATE={ate:.4f} over {total:.1f} m")
    assert ate < 0.05 * max(total, 1.0)
