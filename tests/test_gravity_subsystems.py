"""Cross-subsystem consistency of the whole-map gravity rotation
(Map::ApplyGravityRotation consumers): the lidar world clouds must be
re-rendered whenever lidar is on (loop or no loop), and a lidar-free
loop config must not touch a mapping that does not exist."""

import numpy as np
import jax.numpy as jnp

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.geometry.se3 import se3_apply, se3_identity, se3_make
from lvio_fusion_tpu.models.camera import Camera

ALIGN = np.array([np.sqrt(0.5), 0.0, np.sqrt(0.5), 0.0, 0, 0, 0],
                 np.float32)  # 90 deg about y, no translation


def make_rig():
    cam_left = Camera.create(400.0, 400.0, 180.0, 120.0, se3_identity())
    cam_right = Camera.create(
        400.0, 400.0, 180.0, 120.0,
        se3_make(jnp.array([1.0, 0, 0, 0]), jnp.array([0.5, 0.0, 0.0])))
    return cam_left, cam_right


def base_cfg(**kw):
    return EstimatorConfig(
        height=240, width=360, num_features=64, num_features_init=20,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=40,
        window_kfs=4, landmark_slots=64, obs_slots=256, po_slots=128,
        ba_iters=2, **kw)


def test_lidar_world_rerendered_without_loop():
    """use_lidar=True, use_loop=False: gravity alignment must still
    re-render the cached world clouds (they are consumed by the
    scan-to-map local map on the very next refinement)."""
    cam_left, cam_right = make_rig()
    cfg = base_cfg(use_lidar=True, use_imu=True, num_scans=16,
                   horizon_scan=360, max_scan_points=1024, max_ground=64,
                   max_surf=64, lidar_map_cap=256, lidar_up_axis="y")
    est = Estimator(cam_left, cam_right, cfg,
                    lidar_extrinsic=np.array([1, 0, 0, 0, 0, 0, 0],
                                             np.float32))
    assert est.relocator is None

    # one keyframe with a tiny body-frame lidar feature cloud
    pose = np.array([1, 0, 0, 0, 1.0, 2.0, 3.0], np.float32)
    kf = est.map.add_keyframe(0.0, pose)
    pts = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], np.float32)
    est.map.kf_lidar[kf] = {
        "ground": pts, "ground_valid": np.ones(3, bool),
        "surf": pts + 1.0, "surf_valid": np.ones(3, bool),
    }
    est.lidar_mapping.to_world(est.map, kf)

    # rotate the map pose as _initialize_imu does, then propagate
    from lvio_fusion_tpu.utils import np_se3
    est.map.kf_pose[kf] = np_se3.se3_mul(ALIGN, pose)
    est._on_gravity_aligned(ALIGN)

    assert est.lidar_mapping.up_axis == "z"
    got = est.lidar_mapping.world_ground[kf][0]
    want = np.asarray(
        jnp.stack([se3_apply(jnp.asarray(est.map.kf_pose[kf]),
                             jnp.asarray(p)) for p in pts]))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lidar_free_loop_config_survives_alignment():
    """use_imu + use_loop with use_lidar=False (visual relocator only):
    gravity alignment must not reach for a lidar mapping that was never
    constructed."""
    cam_left, cam_right = make_rig()
    cfg = base_cfg(use_imu=True, use_loop=True, relocator_mode=1)
    est = Estimator(cam_left, cam_right, cfg)
    assert est.relocator is not None and est.lidar_mapping is None

    est._on_gravity_aligned(ALIGN)  # must not raise
    assert est.relocator.up_axis == "z"
