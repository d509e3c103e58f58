"""Reference-format YAML config parsing + Estimator.from_config."""

import numpy as np

from lvio_fusion_tpu.core.estimator import Estimator
from lvio_fusion_tpu.utils import config as cfgmod

KITTI_YAML = """%YAML:1.0
use_imu: 1
use_lidar: 1
use_navsat: 0
use_loop: 0
use_adapt: 0
camera0.fx: 718.856
camera0.fy: 718.856
camera0.cx: 607.1928
camera0.cy: 185.2157
camera1.fx: 718.856
camera1.fy: 718.856
camera1.cx: 607.1928
camera1.cy: 185.2157
num_scans: 64
horizon_scan: 1800
ang_res_y: 0.427
ang_bottom: 24.9
ground_rows: 60
cycle_time: 0.1036
min_range: 5
max_range: 30
resolution: 0.2
acc_n: 0.1
gyr_n: 0.01
acc_w: 0.001
gyr_w: 1.0e-4
g_norm: 9.81007
body_to_cam0: !!opencv-matrix
   rows: 4
   cols: 4
   dt: d
   data: [ 0.00875116, -0.00479609, 0.99995027, 1.10224312,
           -0.99986428, -0.01400249, 0.00868325, -0.31907194,
           0.01396015, -0.99989044, -0.00491798, 0.74606588,
           0, 0, 0, 1 ]
body_to_cam1: !!opencv-matrix
   rows: 4
   cols: 4
   dt: d
   data: [ 0.00875116, -0.00479609, 0.99995027, 1.10695031,
           -0.99986428, -0.01400249, 0.00868325, -0.85616498,
           0.01396015, -0.99989044, -0.00491798, 0.75356513,
           0, 0, 0, 1 ]
body_to_lidar: !!opencv-matrix
   rows: 4
   cols: 4
   dt: d
   data: [ 1, 0, 0, 0.81,
           0, 1, 0, -0.31,
           0, 0, 1, 0.80,
           0, 0, 0, 1 ]
num_features: 500
num_features_init: 50
num_features_tracking_bad: 20
num_features_needed_for_keyframe: 120
windows_size: 3
accuracy: 1
threshold: 10
"""


def test_parse_opencv_yaml(tmp_path):
    p = tmp_path / "kitti.yaml"
    p.write_text(KITTI_YAML)
    c = cfgmod.load(str(p))
    assert c.get("num_scans") == 64
    assert abs(c.get("camera0.fx") - 718.856) < 1e-6
    T = np.asarray(c.mat44_to_se3("body_to_cam0"))
    assert T.shape == (7,)
    np.testing.assert_allclose(T[4:], [1.10224312, -0.31907194, 0.74606588],
                               atol=1e-5)
    flags = c.flags()
    assert flags["use_imu"] and flags["use_lidar"] and not flags["use_loop"]


def test_estimator_from_config(tmp_path):
    p = tmp_path / "kitti.yaml"
    p.write_text(KITTI_YAML)
    est = Estimator.from_config(str(p), height=376, width=1241)
    assert est.cfg.use_imu and est.cfg.use_lidar
    assert est.cfg.num_scans == 64
    assert abs(float(est.cam_left.fx) - 718.856) < 1e-3
    assert est.lidar_extrinsic is not None
    np.testing.assert_allclose(est.lidar_extrinsic[4:],
                               [0.81, -0.31, 0.80], atol=1e-5)
