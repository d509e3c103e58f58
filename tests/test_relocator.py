"""Loop closure: detection by revisit proximity, lidar relocation pulls a
drifted revisit back onto the old map, pose graph redistributes."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.core.hostmap import HostMap
from lvio_fusion_tpu.geometry.se3 import se3_apply, se3_inv
from lvio_fusion_tpu.lidar.mapping import LidarMapping
from lvio_fusion_tpu.loop.pose_graph import PoseGraph
from lvio_fusion_tpu.loop.relocator import Relocator
from test_lidar_mapping import world_scene


def body_cloud(pose_gt, g_w, s_w, cap=1024):
    inv = se3_inv(jnp.asarray(pose_gt))
    def tf(pts):
        out = np.zeros((cap, 3), np.float32)
        v = np.zeros(cap, bool)
        p = np.asarray(jax.vmap(lambda q: se3_apply(inv, q))(pts))
        n = min(len(p), cap)
        out[:n] = p[:n]
        v[:n] = True
        return out, v
    g, gv = tf(g_w)
    s, sv = tf(s_w)
    return {"ground": g, "ground_valid": gv, "surf": s, "surf_valid": sv}


def test_loop_correction():
    g_w, s_w = world_scene()
    # out-and-back along x: 0..20 then back to ~0; revisit at t > 30s
    n_out, n_back = 20, 20
    xs = np.concatenate([np.linspace(0, 20, n_out),
                         np.linspace(20, 0.5, n_back)])
    n = len(xs)
    times = np.arange(n) * 2.0  # 2s per kf => revisit after ~40s+
    gt = np.zeros((n, 7), np.float32)
    gt[:, 0] = 1.0
    gt[:, 4] = xs
    gt[:, 6] = 1.2  # above ground

    # drift: the return leg accumulates a y offset up to 1.5 m
    drift = np.zeros((n, 3), np.float32)
    drift[n_out:, 1] = np.linspace(0.1, 1.5, n_back)

    m = HostMap()
    mapping = LidarMapping(resolution=0.2, map_cap=4096)
    for i in range(n):
        est_pose = gt[i].copy()
        est_pose[4:] += drift[i]
        m.add_keyframe(times[i], est_pose)
        m.kf_lidar[i] = body_cloud(gt[i], g_w, s_w)
        if i < n_out:
            # old leg: world clouds rendered at (correct) poses
            m.kf_pose[i] = gt[i].copy()
            mapping.to_world(m, i)

    pg = PoseGraph()
    rel = Relocator(mapping, threshold=8.0, min_elapsed=30.0,
                    score_thresh=0.3)

    # detection on the final revisit kf
    old = rel.detect(m, n - 1)
    assert old is not None and old < 5, old

    err_before = np.linalg.norm(m.kf_pose[n - 1][4:] - gt[n - 1][4:])
    ok = rel.correct_loop(m, pg, old_idx=old, start_idx=n - 3,
                          end_idx=n - 1)
    assert ok, "loop correction rejected"
    err_after = np.linalg.norm(m.kf_pose[n - 1][4:] - gt[n - 1][4:])
    print(f"revisit error {err_before:.3f} -> {err_after:.3f}")
    assert err_after < 0.3 * err_before


def test_detect_y_up_plane():
    """On a raw camera-world map (y up, pre-gravity-alignment) loop
    proximity must be measured in the x-z plane: two keyframes at the same
    x-z but different HEIGHT (y) are a revisit; the same map read with the
    z-up convention would wrongly see the height gap as planar distance."""
    m = HostMap()
    n_old = 5
    for i in range(n_old):
        p = np.array([1, 0, 0, 0, float(i), 2.0, 0.0], np.float32)
        m.add_keyframe(i * 2.0, p)
    # revisit kf near old kf 1 in x-z, but y differs by 1.5 (height drift)
    p = np.array([1, 0, 0, 0, 1.2, 0.5, 0.3], np.float32)
    m.add_keyframe(40.0, p)

    rel_y = Relocator(None, threshold=3.0, min_elapsed=30.0, up_axis="y")
    old = rel_y.detect(m, m.num_kfs - 1)
    assert old is not None and old <= 2, old

    # with z-up the 'plane' includes the 1.5 m y gap but all old kfs are
    # still within 3 m -> detection is noisier but shouldn't crash
    rel_z = Relocator(None, threshold=0.8, min_elapsed=30.0, up_axis="z")
    assert rel_z.detect(m, m.num_kfs - 1) is None  # y gap breaks proximity

    # switching axis mid-run re-selects the plane
    rel_z.set_up_axis("y")
    rel_z.threshold = 3.0
    assert rel_z.detect(m, m.num_kfs - 1) is not None
