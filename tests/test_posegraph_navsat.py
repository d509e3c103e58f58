"""Pose-graph sectioning/optimization and navsat alignment/refinement."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.core.hostmap import HostMap
from lvio_fusion_tpu.geometry.se3 import se3_exp, se3_identity, se3_mul
from lvio_fusion_tpu.loop.pose_graph import PoseGraph, Section
from lvio_fusion_tpu.navsat.navsat import Navsat


def make_map(poses, dt=0.2):
    m = HostMap()
    for i, p in enumerate(poses):
        m.add_keyframe(i * dt, np.asarray(p, np.float32))
    return m


def straight_turn_straight(n1=60, nt=10, n2=40, step=0.5):
    poses = [se3_identity()]
    for _ in range(n1):
        poses.append(se3_mul(poses[-1], se3_exp(
            jnp.asarray([0, 0, 0, step, 0, 0], jnp.float32))))
    for _ in range(nt):
        poses.append(se3_mul(poses[-1], se3_exp(
            jnp.asarray([0, 0, np.pi / 2 / nt, step, 0, 0], jnp.float32))))
    for _ in range(n2):
        poses.append(se3_mul(poses[-1], se3_exp(
            jnp.asarray([0, 0, 0, step, 0, 0], jnp.float32))))
    return jnp.stack(poses)


class TestSectioning:
    def test_detects_turn(self):
        poses = straight_turn_straight()
        m = make_map(np.asarray(poses))
        pg = PoseGraph()
        pg.update_sections(m)
        secs = list(pg.sections.values()) + [pg.current]
        # at least one boundary should be near the turn (kf 30-40)
        bounds = [s.A for s in secs if s.A > 0]
        assert bounds, f"no sections created: {[(s.A, s.B, s.C) for s in secs]}"
        assert any(50 <= b <= 80 for b in bounds), bounds


class TestGraphOptimize:
    def test_distributes_loop_correction(self):
        # chain of 10 anchors along x; pretend loop closure moved the last
        # anchor by (0, 1, 0): middle anchors must bend smoothly
        n = 10
        poses = np.zeros((n, 7), np.float32)
        poses[:, 0] = 1.0
        poses[:, 4] = np.arange(n) * 2.0
        m = make_map(poses)
        # snapshot BEFORE the loop correction (measurement source)
        snapshot = {i: m.kf_pose[i].copy() for i in range(n)}
        # loop closure: last anchor shifted
        m.kf_pose[n - 1][5] += 1.0

        pg = PoseGraph(graph_cap=16)
        sections = [Section(A=i, B=i, C=i + 1) for i in range(1, n - 1)]
        pg.optimize(m, sections, fixed_old_kf=0, fixed_start_kf=n - 1,
                    meas_poses=snapshot)

        ys = np.asarray([m.kf_pose[i][5] for i in range(n)])
        assert abs(ys[0]) < 1e-4 and abs(ys[-1] - 1.0) < 1e-4
        # middle must be monotone-ish between 0 and 1
        assert np.all(np.diff(ys) > -0.05), ys
        assert ys[n // 2] > 0.05, ys


class TestNavsat:
    def test_initialize_recovers_extrinsic(self):
        # kf trajectory in map frame; raw ENU = R^-1 (p - t)
        n = 40
        t = np.arange(n) * 0.2
        kf_p = np.stack([np.linspace(0, 30, n),
                         np.sin(np.linspace(0, 3, n)),
                         np.zeros(n)], 1)
        yaw = 0.6
        Rz = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                       [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
        off = np.array([5.0, -2.0, 0.3])
        raw = (kf_p - off) @ Rz  # = Rz^T... inverse mapping
        m = HostMap()
        nav = Navsat()
        for i in range(n):
            m.add_keyframe(t[i], np.concatenate(
                [[1, 0, 0, 0], kf_p[i]]).astype(np.float32))
            nav.add_point(t[i] - 0.01, raw[i])
            nav.add_point(t[i] + 0.01, raw[i])
        nav.attach_keyframes(m)
        assert len(nav.kf_fix) > 30
        assert nav.initialize(m)
        # fix points must land on kf positions
        errs = [np.linalg.norm(nav.get_point(i) - kf_p[i])
                for i in sorted(nav.kf_fix)]
        assert max(errs) < 0.05, max(errs)

    def test_bc_refinement_reduces_drift(self):
        n = 40
        t = np.arange(n) * 0.2
        gt = np.stack([np.linspace(0, 30, n), np.zeros(n), np.zeros(n)], 1)
        # drifted trajectory: grows sideways up to 1.5 m
        drift = np.stack([np.zeros(n), np.linspace(0, 1.5, n),
                          np.zeros(n)], 1)
        m = HostMap()
        nav = Navsat()
        for i in range(n):
            m.add_keyframe(t[i], np.concatenate(
                [[1, 0, 0, 0], gt[i] + drift[i]]).astype(np.float32))
            nav.add_point(t[i], gt[i])
        nav.attach_keyframes(m)
        nav.initialized = True  # identity extrinsic (raw already in map frame)

        pg = PoseGraph()
        err0 = np.linalg.norm(m.kf_pose[n - 1][4:] - gt[-1])
        nav.optimize_bc(m, pg, 0, n - 1, [True] * 6)
        err1 = np.linalg.norm(m.kf_pose[n - 1][4:] - gt[-1])
        print(f"end drift {err0:.3f} -> {err1:.3f}")
        assert err1 < 0.5 * err0
