"""Long multi-loop synthetic validation (VERDICT r4 #4's stand-in while
no real dataset mounts): 3 seeds x 520 frames of a KITTI-calibrated
(fx=718.856, baseline=0.5372 m, 376x1241) closed course tracing ~2.4
revolutions, run through the FULL LVIO + loop-closure stack. Asserts
per-seed ATE < 5% of trajectory length, >= 2 loop submaps per seed
(multi-loop: the course revisits covered ground on every turn), and
cross-seed ATE stability.

Runs on the default platform (the real TPU chip when the tunnel is up —
CPU would take ~30 min/seed at this resolution). Results are recorded
in misc/long_multiloop_r07.log and summarized in PARITY.md.

    PYTHONPATH=/root/.axon_site:/root/repo /opt/venv/bin/python \
        misc/long_multiloop_gate.py
"""

import sys
import time

import numpy as np


def run_seed(seed: int, frames: int = 520):
    from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
    from lvio_fusion_tpu.datasets.synthetic import make_sequence
    from lvio_fusion_tpu.utils.trajectory import ate_rmse

    H, W = 376, 1241
    seq = make_sequence(
        num_frames=frames, H=H, W=W, num_points=4000, seed=seed,
        speed=2.0, closed_loop=True, loop_turns=2.4,
        fx=718.856, cx=607.1928, cy=185.2157, baseline=0.5372,
        with_imu=True, imu_rate=200.0,
        with_lidar=True, lidar_rows=16, lidar_cols=720)
    cfg = EstimatorConfig(
        height=H, width=W, num_features=400, num_features_init=50,
        num_features_tracking_bad=20, num_features_needed_for_keyframe=120,
        window_kfs=8, landmark_slots=512, obs_slots=2048, po_slots=1024,
        ba_iters=5,
        use_imu=True, init_kfs=8,
        use_lidar=True, num_scans=16, horizon_scan=720, ang_res_y=2.0,
        ang_bottom=15.0, ground_rows=8, min_range=1.0, max_range=50.0,
        max_scan_points=16384, max_ground=512, max_surf=512,
        lidar_map_cap=2048, lidar_up_axis="y",
        use_loop=True, loop_min_elapsed=8.0, loop_threshold=3.0,
        global_every_kfs=6, max_keyframe_interval=0.3,
        dct_k=16, dct_quality=100, dct_bits=4)
    est = Estimator(seq.cam_left, seq.cam_right, cfg,
                    lidar_extrinsic=seq.lidar_extrinsic)
    t0 = time.perf_counter()
    imu_i = 0
    for i, fr in enumerate(seq.frames):
        while (imu_i < len(seq.imu_times)
               and seq.imu_times[imu_i] <= fr.time):
            est.input_imu(seq.imu_times[imu_i], seq.imu_acc[imu_i],
                          seq.imu_gyr[imu_i])
            imu_i += 1
        est.input_pointcloud(seq.scan_times[i], seq.scans[i])
        est.input_image(fr.time,
                        np.clip(fr.left * 255, 0, 255).astype(np.uint8),
                        np.clip(fr.right * 255, 0, 255).astype(np.uint8))
    est.finalize()
    dt = time.perf_counter() - t0

    times, poses = est.trajectory()
    idx = np.searchsorted(seq.gt_times, times)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
    ate = ate_rmse(poses[:, 4:], gt[:, 4:], align=True)
    n_loops = len(est.pose_graph.submaps) if est.pose_graph else 0
    print(f"seed {seed}: kfs={len(times)} ATE={ate:.3f} m over "
          f"{total:.1f} m ({100 * ate / total:.2f}%) loops={n_loops} "
          f"imu_init={est.imu_initialized} "
          f"[{frames / dt:.1f} fps]", flush=True)
    return ate, total, n_loops, bool(est.imu_initialized)


def main():
    res = [run_seed(s) for s in (21, 22, 23)]
    ates = np.array([r[0] for r in res])
    totals = np.array([r[1] for r in res])
    loops = [r[2] for r in res]
    ok = True
    for (ate, total, n_loops, imu_ok), s in zip(res, (21, 22, 23)):
        if ate >= 0.05 * total:
            print(f"FAIL seed {s}: ATE {ate:.3f} >= 5% of {total:.1f} m")
            ok = False
        if n_loops < 2:
            print(f"FAIL seed {s}: only {n_loops} loop submaps")
            ok = False
        if not imu_ok:
            print(f"FAIL seed {s}: VI init never fired")
            ok = False
    spread = ates.max() - ates.min()
    rel = ates / totals
    print(f"ATE% per seed: {[f'{100 * r:.2f}' for r in rel]} "
          f"(spread {spread:.3f} m); loops per seed: {loops}")
    # stability: no seed may be an outlier beyond 3x the best seed's ATE%
    if rel.max() > 3.0 * max(rel.min(), 1e-6):
        print("FAIL: cross-seed ATE unstable")
        ok = False
    print("LONG-MULTILOOP GATE:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
