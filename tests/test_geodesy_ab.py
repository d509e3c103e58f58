"""Geodetic->ENU conversion + navsat A-B turning-segment smoothing."""

import numpy as np

from lvio_fusion_tpu.core.hostmap import HostMap
from lvio_fusion_tpu.loop.pose_graph import Section
from lvio_fusion_tpu.navsat.navsat import Navsat
from lvio_fusion_tpu.utils.geodesy import LocalCartesian


class TestGeodesy:
    def test_origin_is_zero(self):
        lc = LocalCartesian()
        p = lc.forward(48.137, 11.575, 520.0)
        np.testing.assert_allclose(p, 0.0, atol=1e-9)

    def test_small_northward_step(self):
        lc = LocalCartesian()
        lc.forward(48.0, 11.0, 500.0)
        # +0.001 deg latitude ~ 111.2 m north
        p = lc.forward(48.001, 11.0, 500.0)
        assert abs(p[1] - 111.2) < 0.5, p
        assert abs(p[0]) < 0.01 and abs(p[2]) < 0.01

    def test_eastward_step_scales_with_latitude(self):
        lc = LocalCartesian()
        lc.forward(60.0, 10.0, 0.0)
        p = lc.forward(60.0, 10.001, 0.0)
        # 0.001 deg lon at 60N ~ 111.3 * cos(60) = 55.7 m east
        assert abs(p[0] - 55.7) < 0.5, p


class TestOptimizeAB:
    def test_smooths_turn_segment(self):
        # quarter-turn trajectory A..B with noisy inner kfs; GPS at truth
        n = 20
        ang = np.linspace(0, np.pi / 2, n)
        gt = np.stack([10 * np.sin(ang), 10 * (1 - np.cos(ang)),
                       np.zeros(n)], 1)
        rng = np.random.default_rng(0)
        noise = rng.normal(0, 0.3, (n, 3))
        noise[0] = noise[-1] = 0  # endpoints already correct

        m = HostMap()
        nav = Navsat()
        nav.initialized = True
        for i in range(n):
            m.add_keyframe(i * 0.5, np.concatenate(
                [[1, 0, 0, 0], gt[i] + noise[i]]).astype(np.float32))
            nav.kf_fix[i] = gt[i].astype(np.float32)

        err0 = np.linalg.norm(
            np.stack(m.kf_pose)[:, 4:] - gt, axis=1).mean()
        nav.optimize_ab(m, Section(A=0, B=n - 1, C=n - 1))
        err1 = np.linalg.norm(
            np.stack(m.kf_pose)[:, 4:] - gt, axis=1).mean()
        print(f"AB smoothing: {err0:.3f} -> {err1:.3f}")
        assert err1 < 0.5 * err0
