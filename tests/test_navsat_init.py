"""Navsat two-pass initialization (navsat.cpp:100-133): the yaw-only
Procrustes seed must be refined by the full 6-DoF pass so a PITCHED/ROLLED
ENU frame still converges."""

import numpy as np

from lvio_fusion_tpu.core.hostmap import HostMap
from lvio_fusion_tpu.navsat.navsat import Navsat
from lvio_fusion_tpu.utils import np_se3


def _rot(roll, pitch, yaw):
    def q(axis, a):
        v = np.zeros(4)
        v[0] = np.cos(a / 2)
        v[1 + axis] = np.sin(a / 2)
        return v
    return np_se3.quat_mul(q(2, yaw), np_se3.quat_mul(q(1, pitch),
                                                      q(0, roll)))


def test_initialize_converges_with_pitched_enu():
    rng = np.random.default_rng(0)
    m = HostMap()
    nav = Navsat(accuracy=1.0)
    # winding planar-ish trajectory in the map frame
    t = np.linspace(0, 30, 40)
    xyz = np.stack([t * 1.5, 4.0 * np.sin(t / 4), 0.05 * t], -1)
    # ENU frame pitched 8 deg, rolled 5 deg, yawed 70 deg w.r.t. the map
    q = _rot(np.radians(5), np.radians(8), np.radians(70))
    T_enu_map = np.concatenate([q, [3.0, -2.0, 1.0]]).astype(np.float32)
    T_map_enu = np_se3.se3_inv(T_enu_map)
    for i in range(len(t)):
        m.add_keyframe(t[i], np.concatenate([[1, 0, 0, 0], xyz[i]]))
        enu = np_se3.se3_apply(T_map_enu, xyz[i])
        nav.kf_fix[i] = enu + rng.normal(0, 0.02, 3)

    assert nav.initialize(m)
    # recovered extrinsic must map ENU fixes back onto the trajectory
    errs = [np.linalg.norm(nav.get_point(i, m) - xyz[i])
            for i in range(len(t))]
    err = float(np.mean(errs))
    print("mean init residual:", err)
    assert err < 0.1, f"6-DoF refinement failed to converge: {err}"

    # sanity: the yaw-only seed ALONE cannot explain a pitched frame
    cy = np.cos(np.radians(70) / 2)
    sy = np.sin(np.radians(70) / 2)
    yaw_only = np.array([cy, 0, 0, sy, 3.0, -2.0, 1.0], np.float32)
    errs0 = [np.linalg.norm(np_se3.se3_apply(yaw_only, nav.kf_fix[i])
                            - xyz[i]) for i in range(len(t))]
    assert np.mean(errs0) > 5 * err


def test_loop_anchor_overrides_gps_fix():
    """A keyframe carrying a loop anchor must report the loop-implied
    position (GetFixPoint, navsat.cpp:43-57)."""
    m = HostMap()
    nav = Navsat()
    m.add_keyframe(0.0, np.array([1, 0, 0, 0, 0, 0, 0], np.float32))
    m.add_keyframe(1.0, np.array([1, 0, 0, 0, 5, 0, 0], np.float32))
    nav.kf_fix[1] = np.array([99.0, 99.0, 99.0])  # bogus GPS
    rel = np.array([1, 0, 0, 0, 5.25, 0.5, 0], np.float32)
    m.kf_loop[1] = (0, rel)
    p = nav.get_point(1, m)
    np.testing.assert_allclose(p, [5.25, 0.5, 0], atol=1e-6)
