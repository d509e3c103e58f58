"""Scan-to-map refinement: a perturbed pose must be pulled back to truth
by ground (roll/pitch/z) + surf (yaw/x/y) point-to-plane alignment."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry.se3 import (
    se3_apply, se3_boxplus, se3_identity, se3_inv, se3_log, se3_mul,
)
from lvio_fusion_tpu.lidar.mapping import knn3_planes, make_scan_to_map
from test_lidar_ops import synth_scan


def world_scene(seed=0):
    """Feature clouds in world frame: ground plane + box walls, sampled."""
    rng = np.random.default_rng(seed)
    # ground: z=0 plane
    g = np.stack([rng.uniform(-20, 20, 1500), rng.uniform(-20, 20, 1500),
                  np.zeros(1500)], 1)
    # walls: two planes x=6 and y=-5 (z in 0..3)
    w1 = np.stack([np.full(800, 6.0), rng.uniform(-10, 10, 800),
                   rng.uniform(0, 3, 800)], 1)
    w2 = np.stack([rng.uniform(-10, 10, 800), np.full(800, -5.0),
                   rng.uniform(0, 3, 800)], 1)
    return (jnp.asarray(g, jnp.float32),
            jnp.asarray(np.concatenate([w1, w2]), jnp.float32))


def test_refine_recovers_pose():
    g_w, s_w = world_scene()
    pose_gt = jnp.asarray([1.0, 0, 0, 0, 2.0, 1.0, 1.5], jnp.float32)
    # body-frame observations of the scene from pose_gt
    inv = se3_inv(pose_gt)
    g_body = jax.vmap(lambda p: se3_apply(inv, p))(g_w)
    s_body = jax.vmap(lambda p: se3_apply(inv, p))(s_w)
    gv = jnp.ones(g_body.shape[0], bool)
    sv = jnp.ones(s_body.shape[0], bool)

    # perturb all 6 dof
    xi = jnp.asarray([0.03, -0.02, 0.04, 0.2, -0.15, 0.3], jnp.float32)
    pose0 = se3_boxplus(pose_gt, xi)

    refine = make_scan_to_map(iters=6, resolution=0.2)
    pose = refine(pose0, g_body, gv, s_body, sv,
                  g_w, jnp.ones(g_w.shape[0], bool),
                  s_w, jnp.ones(s_w.shape[0], bool),
                  jnp.float32(1.0), jnp.float32(1.0), jnp.float32(0.0))

    err = se3_log(se3_mul(se3_inv(pose_gt), pose))
    err0 = se3_log(se3_mul(se3_inv(pose_gt), pose0))
    print("init err:", np.round(np.asarray(err0), 4))
    print("final err:", np.round(np.asarray(err), 4))
    assert float(jnp.abs(err).max()) < 0.02, err


def test_knn_planes():
    g_w, _ = world_scene()
    q = jnp.asarray([[0.0, 0.0, 0.1], [5.0, 5.0, -0.1]], jnp.float32)
    pt, n, ok = knn3_planes(q, jnp.ones(2, bool), g_w,
                            jnp.ones(g_w.shape[0], bool), 100.0)
    assert bool(ok.all())
    # normals must be +-z for the ground plane
    assert float(jnp.abs(jnp.abs(n[:, 2]) - 1.0).max()) < 1e-3


def test_global_map_export(tmp_path):
    """Mapping::GetGlobalMap parity: merged, voxel-deduped world cloud
    + PLY export (mapping.cpp:231-249)."""
    import numpy as np
    from lvio_fusion_tpu.core.hostmap import HostMap
    from lvio_fusion_tpu.lidar.mapping import LidarMapping

    m = HostMap()
    mapping = LidarMapping(resolution=0.2)
    rng = np.random.default_rng(0)
    for i in range(3):
        pose = np.array([1, 0, 0, 0, i * 1.0, 0, 0], np.float32)
        m.add_keyframe(float(i), pose)
        pts = rng.uniform(-2, 2, (128, 3)).astype(np.float32)
        v = np.ones(128, bool)
        v[100:] = False
        m.kf_lidar[i] = {"ground": pts, "ground_valid": v,
                         "surf": pts + 5.0, "surf_valid": v}
        mapping.to_world(m, i)

    g = mapping.global_map()
    assert g.ndim == 2 and g.shape[1] == 3
    assert 0 < len(g) <= 3 * 2 * 100  # dedup never grows the set
    # duplicated points collapse: render kf0 twice -> same size
    n1 = len(g)
    mapping.to_world(m, 0)
    assert len(mapping.global_map()) == n1

    out = tmp_path / "map.ply"
    n = mapping.save_global_map(str(out))
    head = out.read_text().splitlines()
    assert head[0] == "ply" and f"element vertex {n}" in head[2]
    assert len(head) == 10 + n  # 3 extra RGB property lines
    # class colors (mapping.cpp:14-38): ground magenta, surf green
    body = np.array([ln.split() for ln in head[10:]], np.float32)
    cols = {tuple(r.astype(int)) for r in body[:, 3:6]}
    assert cols <= {(255, 0, 255), (0, 255, 0)} and len(cols) == 2
    # color survives the dedup aligned with its point
    pts_c, col_c = mapping.global_map(with_color=True)
    assert len(pts_c) == n and col_c.shape == (n, 3)
