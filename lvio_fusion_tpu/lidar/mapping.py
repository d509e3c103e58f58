"""Lidar scan-to-map refinement + world-frame feature map maintenance.

Functional equivalent of the reference Mapping + FeatureAssociation
scan-to-map stage (mapping.cpp:114-229, association.cpp:270-384):

  * local map = merged world-frame ground/surf clouds of the last 3 lidar
    keyframes (BuildMapFrame)
  * per keyframe, two DoF-split refinements of the frame pose:
    ground points -> {roll, pitch, z}, surf points -> {yaw, x, y}
    (LidarPlaneErrorRPZ / YXY), each with a soft prior holding the
    optimized DoF near the BA pose, weighted by the visual feature count
  * correspondences: 3-NN by brute-force distance matrix (an MXU matmul)
    instead of a kd-tree; plane normal from the 3 neighbors
  * DoF restriction via a mask on the left-multiplicative se3 tangent
    (world axes; equivalent to the reference's relative-rpyxyz split for
    near-upright vehicle motion)

All stages are fixed-shape jitted programs; the host side only merges
numpy clouds and updates the map store.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry.se3 import se3_apply, se3_boxplus, se3_mul
from lvio_fusion_tpu.ops.lidar import voxel_downsample
from lvio_fusion_tpu.utils.memo import builder_memo

def dof_masks(up_axis: str = "z"):
    """(ground_mask, surf_mask) over the se3 tangent [phi(3), rho(3)].

    The reference's RPZ/YXY split (lidar_error.hpp:42-110) assumes a
    gravity-aligned z-up world: ground constrains {roll, pitch, height},
    obstacles constrain {yaw, horizontal translation}. ``up_axis`` selects
    which world axis is vertical (pre-gravity-alignment camera worlds have
    y as the vertical axis).
    """
    i = {"x": 0, "y": 1, "z": 2}[up_axis]
    phi_g = [1.0, 1.0, 1.0]
    phi_g[i] = 0.0  # ground: rotations about horizontal axes only
    rho_g = [0.0, 0.0, 0.0]
    rho_g[i] = 1.0  # ground: vertical translation only
    ground = tuple(phi_g + rho_g)
    surf = tuple(1.0 - v for v in ground)  # pure python: jit-safe
    return ground, surf


RPZ_MASK, YXY_MASK = dof_masks("z")  # roll,pitch,z / yaw,x,y


def knn3_planes(query_w, query_valid, map_pts, map_valid, dist_thresh):
    """3-NN plane fit: returns (plane_pt (N,3), normal (N,3), ok (N,)).
    Association runs through the Pallas kNN kernel on TPU
    (ops/pallas/knn.py), XLA matmul+top_k elsewhere."""
    from lvio_fusion_tpu.ops.pallas.knn import knn3
    dists, idx = knn3(query_w, map_pts, map_valid)
    pts = map_pts[idx]  # (N, 3, 3)
    a, b, c = pts[:, 0], pts[:, 1], pts[:, 2]
    n = jnp.cross(b - a, c - a)
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    normal = n / jnp.maximum(nn, 1e-9)
    ok = (query_valid & jnp.all(dists < dist_thresh, axis=-1)
          & (nn[:, 0] > 1e-6) & jnp.all(jnp.isfinite(dists), axis=-1))
    return a, normal, ok


def _masked_gn(pose, pose_prior, pts_body, pts_valid, map_pts, map_valid,
               dof_mask, dist_thresh, w_point, w_prior, iters: int):
    """DoF-masked Gauss-Newton point-to-plane alignment.

    Solver matmuls (jacfwd, J^T J, the 6x6 solve) run at full f32
    multiply precision — TPU's default bf16 multiplies corrupt stiff
    normal equations (see core/imu_init.py); the system here is tiny,
    so the extra passes are free."""
    with jax.default_matmul_precision("highest"):
        return _masked_gn_impl(pose, pose_prior, pts_body, pts_valid,
                               map_pts, map_valid, dof_mask, dist_thresh,
                               w_point, w_prior, iters)


def _masked_gn_impl(pose, pose_prior, pts_body, pts_valid, map_pts,
                    map_valid, dof_mask, dist_thresh, w_point, w_prior,
                    iters: int):
    mask = jnp.asarray(dof_mask, pose.dtype)

    def body(pose, _):
        pw = jax.vmap(lambda p: se3_apply(pose, p))(pts_body)
        plane_pt, normal, ok = knn3_planes(pw, pts_valid, map_pts,
                                           map_valid, dist_thresh)
        w = ok.astype(pose.dtype) * w_point

        def residual(xi):
            T = se3_boxplus(pose, xi * mask)
            pw2 = jax.vmap(lambda p: se3_apply(T, p))(pts_body)
            r_pt = jnp.sum((pw2 - plane_pt) * normal, -1) * w
            # soft prior on the masked DoF toward the BA pose
            from lvio_fusion_tpu.geometry.se3 import se3_inv, se3_log
            dx = se3_log(se3_mul(T, se3_inv(pose_prior))) * mask
            return jnp.concatenate([r_pt, w_prior * dx])

        z = jnp.zeros(6, pose.dtype)
        r = residual(z)
        J = jax.jacfwd(residual)(z)
        H = J.T @ J + jnp.diag(1.0 - mask) + 1e-5 * jnp.eye(6)
        g = -J.T @ r
        d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-10))
        dx = jnp.linalg.solve(H / d[:, None] / d[None, :], g / d) / d
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0) * mask
        return se3_boxplus(pose, dx), jnp.sum(r * r)

    pose, costs = jax.lax.scan(body, pose, None, length=iters)
    return pose, costs


@builder_memo
def make_scan_to_map(iters: int = 4, resolution: float = 0.2,
                     up_axis: str = "z"):
    """Build the jitted two-stage refine:
    refine(pose0, ground, gv, surf, sv, map_g, mgv, map_s, msv,
           w_ground, w_surf, prior_w) -> pose."""
    g_mask, s_mask = dof_masks(up_axis)

    @jax.jit
    def refine(pose0, ground, gv, surf, sv, map_g, mgv, map_s, msv,
               w_ground, w_surf, prior_w, dist_scale=1.0):
        # dist_scale loosens the correspondence gate (coarse-to-fine
        # relocation rounds pass >1)
        thr_g = (resolution ** 2) * 100.0 * dist_scale
        thr_s = (resolution ** 2) * 25.0 * dist_scale
        pose, _ = _masked_gn(pose0, pose0, ground, gv, map_g, mgv,
                             g_mask, thr_g, w_ground, prior_w, iters)
        pose, _ = _masked_gn(pose, pose0, surf, sv, map_s, msv,
                             s_mask, thr_s, w_surf, prior_w, iters)
        return pose

    return refine


def merge_clouds(store, ids, cap, resolution):
    """Concatenate world clouds + voxel-dedup (duplicated points across
    overlapping keyframes make 3-NN plane fits degenerate)."""
    pts = np.concatenate([store[i][0] for i in ids])
    val = np.concatenate([store[i][1] for i in ids])
    out = np.zeros((cap, 3), np.float32)
    ov = np.zeros(cap, bool)
    n = min(len(pts), cap)
    out[:n] = pts[:n]
    ov[:n] = val[:n]
    p, v = voxel_downsample(jnp.asarray(out), jnp.asarray(ov),
                            resolution * 0.5, cap)
    return p, v


class LidarMapping:
    """Host-side coordinator: per-kf world clouds + local-map refinement."""

    def __init__(self, resolution: float = 0.2, iters: int = 4,
                 map_cap: int = 6144, num_map_kfs: int = 3,
                 up_axis: str = "z"):
        self.resolution = resolution
        self.num_map_kfs = num_map_kfs
        self.map_cap = map_cap
        self.iters = iters
        self.up_axis = up_axis
        self.refine_fn = make_scan_to_map(iters, resolution, up_axis)
        # world-frame feature clouds per keyframe index
        self.world_ground = {}
        self.world_surf = {}

    def set_up_axis(self, up_axis: str):
        """Switch the DoF-split vertical axis (e.g. 'y' -> 'z' after the
        VI initializer gravity-aligns the map). Recompiles once."""
        if up_axis != self.up_axis:
            self.up_axis = up_axis
            self.refine_fn = make_scan_to_map(self.iters, self.resolution,
                                              up_axis)

    def to_world(self, m, kf_idx):
        """(Re-)render this kf's feature clouds into world frame
        (Mapping::ToWorld)."""
        f = m.kf_lidar[kf_idx]
        if f is None:
            return
        pose = jnp.asarray(m.kf_pose[kf_idx])
        for name, store in (("ground", self.world_ground),
                            ("surf", self.world_surf)):
            pts = jnp.asarray(f[name])
            pw = np.asarray(jax.vmap(lambda p: se3_apply(pose, p))(pts))
            store[kf_idx] = (pw.astype(np.float32), f[name + "_valid"])

    # per-class point colors, matching Mapping::Color exactly
    # (mapping.cpp:14-38: ground = magenta 255/0/255, surf = green 0/255/0)
    _COLORS = {"ground": (255, 0, 255), "surf": (0, 255, 0)}

    def global_map(self, resolution: float = None, with_color: bool = False):
        """Merge ALL keyframes' world clouds into one voxel-downsampled
        point set (Mapping::GetGlobalMap, mapping.cpp:231-249). With
        ``with_color`` also returns per-point RGB uint8 class colors
        (Mapping::Color, mapping.cpp:14-38). Pure numpy: the global map
        is unbounded, so this stays off the fixed-shape device path."""
        res = self.resolution if resolution is None else resolution
        pts, cols = [], []
        for name, store in (("ground", self.world_ground),
                            ("surf", self.world_surf)):
            for p, v in store.values():
                pts.append(p[v])
                cols.append(np.broadcast_to(
                    np.asarray(self._COLORS[name], np.uint8),
                    (int(v.sum()), 3)))
        if not pts:
            empty = np.zeros((0, 3), np.float32)
            return (empty, np.zeros((0, 3), np.uint8)) if with_color \
                else empty
        allp = np.concatenate(pts).astype(np.float32)
        allc = np.concatenate(cols)
        # hash-grid voxel dedup (keep one point per res-cell)
        cell = np.floor(allp / max(res, 1e-6)).astype(np.int64)
        _, keep = np.unique(cell, axis=0, return_index=True)
        keep = np.sort(keep)
        return (allp[keep], allc[keep]) if with_color else allp[keep]

    def save_global_map(self, path: str, resolution: float = None):
        """Write the merged global map as an ASCII PLY point cloud with
        the reference's per-class RGB colors."""
        pts, cols = self.global_map(resolution, with_color=True)
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n"
                    f"element vertex {len(pts)}\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "property uchar red\nproperty uchar green\n"
                    "property uchar blue\nend_header\n")
            for p, c in zip(pts, cols):
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                        f"{c[0]} {c[1]} {c[2]}\n")
        return len(pts)

    def _local_map(self, kf_idx):
        """Merge the last num_map_kfs world clouds before kf_idx."""
        prev = [i for i in sorted(self.world_ground) if i < kf_idx]
        take = prev[-self.num_map_kfs:]
        if not take:
            return None

        return (merge_clouds(self.world_ground, take, self.map_cap,
                             self.resolution),
                merge_clouds(self.world_surf, take, self.map_cap,
                             self.resolution))

    def refine(self, m, kf_idx) -> bool:
        """Scan-to-map refine kf pose in place; returns True if it ran."""
        f = m.kf_lidar[kf_idx]
        local = self._local_map(kf_idx)
        if f is None or local is None:
            self.to_world(m, kf_idx)
            return False
        (map_g, mgv), (map_s, msv) = local
        w = m.kf_weights[kf_idx]
        n_vis = max(1, len(m.obs_lm[kf_idx]))
        pose = self.refine_fn(
            jnp.asarray(m.kf_pose[kf_idx]),
            jnp.asarray(f["ground"]), jnp.asarray(f["ground_valid"]),
            jnp.asarray(f["surf"]), jnp.asarray(f["surf_valid"]),
            map_g, mgv, map_s, msv,
            jnp.float32(w[1]), jnp.float32(w[2]),
            jnp.float32(n_vis * w[0] * 0.01))
        m.kf_pose[kf_idx] = np.asarray(pose)
        self.to_world(m, kf_idx)
        return True
