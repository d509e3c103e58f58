"""IMU initializer retry ladder (reference initializer.cpp:58-130): a
corrupted early IMU stream must make the first initialization attempt fail
(unphysical gyro bias), and the estimator must recover by re-attempting at
a later keyframe once clean samples dominate the window."""

import numpy as np

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence


def test_imu_init_retries_after_corrupt_start():
    seq = make_sequence(num_frames=40, H=240, W=360, num_points=400,
                        seed=1, with_imu=True, imu_rate=200.0)
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10,
        use_imu=True, init_kfs=8, max_keyframe_interval=0.25)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)

    # corrupt the gyro for the first ~40% of samples: a huge fake bias
    # makes the inertial solve land on |bg| >> 0.2 and be rejected
    n_bad = int(0.4 * len(seq.imu_times))
    gyr = np.asarray(seq.imu_gyr).copy()
    gyr[:n_bad] += np.array([0.9, -0.7, 0.8])

    attempts = {"fail": 0, "ok": 0}
    orig = Estimator._initialize_imu

    def spy(self, **kw):
        st = orig(self, **kw)
        if st > 0:
            attempts["ok"] += 1
        elif st < 0:
            attempts["fail"] += 1
        return st

    Estimator._initialize_imu = spy
    try:
        imu_i = 0
        for fr in seq.frames:
            while (imu_i < len(seq.imu_times)
                   and seq.imu_times[imu_i] <= fr.time):
                est.input_imu(seq.imu_times[imu_i], seq.imu_acc[imu_i],
                              gyr[imu_i])
                imu_i += 1
            est.input_image(fr.time, fr.left, fr.right)
    finally:
        Estimator._initialize_imu = orig

    assert attempts["fail"] >= 1, \
        "corrupted gyro should fail at least one init attempt"
    assert attempts["ok"] >= 1 and est.imu_initialized, \
        f"initialization never recovered: {attempts}"
    # after recovery the estimated bias must be physical again
    assert float(np.linalg.norm(est.cur_bias[3:])) <= 0.2
