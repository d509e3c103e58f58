"""Batched frontend with on-device IMU prediction: when frame_batch > 1
and the IMU is initialized, per-frame raw sample windows ride along in the
batch dispatch and seed LK via a light preintegration scan chained across
the batch (frontend.cpp PredictState semantics, zero extra round trips)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.utils.trajectory import ate_rmse


def test_preintegrate_light_matches_full():
    """The light scan must agree with the full (covariance-carrying)
    preintegration on dp/dq/dv."""
    from lvio_fusion_tpu.ops.imu_preint import (
        preintegrate, preintegrate_light,
    )
    rng = np.random.default_rng(0)
    S = 16
    acc = rng.normal(0, 1, (S, 3)).astype(np.float32) + [0, 0, 9.81]
    gyr = rng.normal(0, 0.3, (S, 3)).astype(np.float32)
    dt = np.full(S, 0.005, np.float32)
    dt[0] = 0.0
    ba = np.array([0.01, -0.02, 0.03], np.float32)
    bg = np.array([-0.001, 0.002, 0.0], np.float32)
    full = preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                        jnp.asarray(ba), jnp.asarray(bg),
                        0.1, 0.01, 1e-3, 1e-4)
    dp, dq, dv, sdt = preintegrate_light(
        jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
        jnp.asarray(ba), jnp.asarray(bg))
    np.testing.assert_allclose(np.asarray(dp), np.asarray(full.dp),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(full.dq),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(full.dv),
                               atol=1e-5)
    np.testing.assert_allclose(float(sdt), float(full.sum_dt), atol=1e-6)


def test_vio_batched_tracks():
    """VIO with frame_batch=4: IMU must initialize mid-sequence and the
    remaining batches must track on IMU-seeded warps without losing
    accuracy (48 frames so ~20 run post-init through the IMU path)."""
    seq = make_sequence(num_frames=48, H=240, W=360, num_points=400,
                        seed=1, with_imu=True, imu_rate=200.0)
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10,
        use_imu=True, init_kfs=8, max_keyframe_interval=0.25,
        frame_batch=4)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    imu_i = 0
    for fr in seq.frames:
        while (imu_i < len(seq.imu_times)
               and seq.imu_times[imu_i] <= fr.time):
            est.input_imu(seq.imu_times[imu_i], seq.imu_acc[imu_i],
                          seq.imu_gyr[imu_i])
            imu_i += 1
        est.input_image(fr.time, fr.left, fr.right)
    est.finalize()
    assert est.imu_initialized, "VI initialization never fired (batched)"

    times, poses = est.trajectory()
    idx = np.searchsorted(seq.gt_times, times)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    # map was gravity-rotated at VI init => compare with rigid alignment
    ate = ate_rmse(poses[:, 4:], gt[:, 4:], align=True)
    total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
    print(f"batched-VIO kfs={len(times)} ATE={ate:.4f} over {total:.1f} m")
    assert ate < 0.05 * max(total, 1.0), f"ATE {ate} too large for {total} m"
