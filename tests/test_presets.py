"""Shipped config presets parse through Estimator.from_config with the
reference flag semantics (reference config/*.yaml run modes)."""

import numpy as np
import pytest

from lvio_fusion_tpu.core.estimator import Estimator

TINY = dict(num_features=32, num_features_init=10,
            num_features_tracking_bad=5,
            num_features_needed_for_keyframe=20, window_kfs=3,
            landmark_slots=32, obs_slots=64, po_slots=32, ba_iters=2)


def test_kaist28_preset_wiring():
    est = Estimator.from_config("configs/kaist28.yaml", height=120,
                                width=160, **TINY)
    c = est.cfg
    assert c.use_imu and c.use_navsat and not c.use_lidar and not c.use_loop
    assert c.navsat_v and c.undistort and not c.remove_moving_points
    assert est.navsat is not None and est.relocator is None
    # distortion made it into the camera model (undistort maps need it)
    assert abs(float(est.cam_left.k1) + 0.0500404858) < 1e-6  # f32 store
    assert abs(float(est.cam_left.fx) - 816.40221474060002) < 1e-3
    assert c.acc_n == pytest.approx(0.1)


def test_kaist39_preset_wiring():
    est = Estimator.from_config("configs/kaist39.yaml", height=120,
                                width=160, **TINY)
    c = est.cfg
    assert not c.use_imu and c.use_navsat and not c.use_lidar
    assert c.navsat_v and c.undistort
    assert c.num_features == 32  # override wins
    assert c.gyr_w == pytest.approx(2.0e-6)
    # kaist39 uses the urban39 rig extrinsics — distinct from kaist28
    ext = np.asarray(est.cam_left.extrinsic)
    assert abs(ext[4] - 1.71239) < 1e-4


def test_euroc_preset_equalizes():
    est = Estimator.from_config("configs/euroc.yaml", height=120,
                                width=160, **TINY)
    assert est.cfg.equalize_hist, "EuRoC preset must equalize frames"
    assert not est.cfg.use_imu and not est.cfg.use_navsat
