"""Debug visualization: tracking overlays and trajectory plots.

Replaces the reference's live OpenCV ``imshow("tracking")`` feature overlay
(frontend.cpp:229-252) and RViz path view with offline PNG dumps — the
estimator runs headless on a TPU host, so frames are written to disk
instead of a window.
"""

from __future__ import annotations

import os

import numpy as np


def draw_features(img_u8, pts, valid, radius: int = 2):
    """Return an RGB uint8 copy of a grayscale frame with tracked features
    stamped as green squares (plain numpy; no cv2 dependency)."""
    img = np.asarray(img_u8)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    H, W = img.shape
    rgb = np.stack([img, img, img], -1).copy()
    for p in np.asarray(pts)[np.asarray(valid, bool)]:
        x, y = int(round(float(p[0]))), int(round(float(p[1])))
        if 0 <= x < W and 0 <= y < H:
            x0, x1 = max(0, x - radius), min(W, x + radius + 1)
            y0, y1 = max(0, y - radius), min(H, y + radius + 1)
            rgb[y0:y1, x0:x1] = (40, 220, 40)
    return rgb


def save_overlay(path: str, img_u8, pts, valid):
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(draw_features(img_u8, pts, valid)).save(path)


def _ground_axes(up_axis: str):
    """Index pair of the ground-plane coordinates for a given up axis."""
    return (0, 2) if up_axis == "y" else (0, 1)


def save_run_overview(path: str, m, pose_graph=None, navsat=None,
                      up_axis: str = "z", max_landmarks: int = 4000,
                      title: str = ""):
    """One offline figure per run with every RViz view the reference node
    publishes (visualization.cpp:33-163): keyframe path, local-landmark
    cloud, pose-graph section boundaries, loop-closure edges, and the
    navsat track in the map frame. Written as PNG (or any matplotlib-
    supported extension)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ix, iy = _ground_axes(up_axis)
    fig, ax = plt.subplots(figsize=(10, 10))

    # landmark cloud (visualization.cpp publishes the local map points)
    if m.num_landmarks:
        alive = np.asarray(m.lm_alive, bool)
        pw = np.stack(m.lm_world)[alive]
        if len(pw) > max_landmarks:
            pw = pw[:: len(pw) // max_landmarks + 1]
        if len(pw):
            ax.scatter(pw[:, ix], pw[:, iy], s=1.5, c="#b9b9b9",
                       label=f"landmarks ({int(alive.sum())})", zorder=1)

    # keyframe path
    if m.num_kfs:
        P = m.poses_array()[:, 4:]
        ax.plot(P[:, ix], P[:, iy], "-", c="#1f5fbf", lw=1.6,
                label=f"keyframe path ({m.num_kfs})", zorder=3)

        # navsat track, mapped ENU -> map frame through the fitted
        # extrinsic (publisher: navsat path, visualization.cpp:96-115)
        if navsat is not None and len(navsat.raw_p):
            from lvio_fusion_tpu.utils import np_se3
            raw = np.stack(navsat.raw_p)
            trk = np_se3.se3_apply_batch(
                np.asarray(navsat.extrinsic, np.float64), raw)
            ax.plot(trk[:, ix], trk[:, iy], ".", c="#2ca02c", ms=2.0,
                    label=f"navsat track ({len(raw)})", zorder=2)

        # pose-graph section boundaries (turn segmentation markers,
        # visualization.cpp section markers)
        if pose_graph is not None and pose_graph.sections:
            first = True
            for a, sec in sorted(pose_graph.sections.items()):
                for k, mk in ((sec.A, "^"), (sec.B, "s")):
                    if 0 <= k < m.num_kfs:
                        ax.plot(P[k, ix], P[k, iy], mk, c="#e69f00",
                                ms=7, mew=1.2, mfc="none", zorder=4,
                                label="section A/B" if first else None)
                        first = False

        # loop-closure edges (Frame::loop_closure anchors)
        first = True
        for i in range(m.num_kfs):
            if m.kf_loop[i] is None:
                continue
            old_idx, _ = m.kf_loop[i]
            ax.plot([P[i, ix], P[old_idx, ix]],
                    [P[i, iy], P[old_idx, iy]], "-", c="#d62728",
                    lw=0.9, alpha=0.8, zorder=5,
                    label="loop edge" if first else None)
            first = False

    ax.set_xlabel("xyz"[ix] + " [m]")
    ax.set_ylabel("xyz"[iy] + " [m]")
    ax.axis("equal")
    ax.grid(True, alpha=0.25)
    ax.legend(loc="best", fontsize=9)
    if title:
        ax.set_title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)
    return path


def save_frusta_ply(path: str, m, cam, height: int, width: int,
                    depth: float = 0.5, stride: int = 1):
    """Camera-frustum wireframes + car pose as a PLY line set.

    The 3D-export analogue of the reference's live RViz camera markers
    (camera_pose.cpp:1-206 CameraPoseVisualization: per-keyframe frustum
    wireframes; visualization.cpp car TF/mesh): one 8-edge frustum per
    (strided) keyframe in map frame, the latest keyframe highlighted,
    plus an RGB axis triad marking the current car pose. Loads alongside
    the global lidar map PLY (same coordinate frame) in any viewer.
    """
    from lvio_fusion_tpu.utils import np_se3

    ext = np.asarray(cam.extrinsic, np.float64)
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    # frustum template in SENSOR frame: optical center + 4 image corners
    corners_px = np.array([[0.0, 0.0], [width, 0.0],
                           [width, height], [0.0, height]])
    sens = np.concatenate([
        np.zeros((1, 3)),
        np.stack([(corners_px[:, 0] - cx) / fx * depth,
                  (corners_px[:, 1] - cy) / fy * depth,
                  np.full(4, depth)], axis=1)])
    # 8 edges: center->corner x4 + corner ring x4
    tmpl_edges = [(0, 1), (0, 2), (0, 3), (0, 4),
                  (1, 2), (2, 3), (3, 4), (4, 1)]

    verts, edges, vcols = [], [], []
    kfs = list(range(0, m.num_kfs, max(stride, 1)))
    if m.num_kfs and kfs[-1] != m.num_kfs - 1:
        kfs.append(m.num_kfs - 1)
    for k in kfs:
        Twc = np_se3.se3_mul(np.asarray(m.kf_pose[k], np.float64), ext)
        pts = np_se3.se3_apply_batch(Twc, sens)
        base = len(verts)
        col = ((214, 39, 40) if k == m.num_kfs - 1 else (31, 95, 191))
        verts.extend(pts)
        vcols.extend([col] * len(pts))
        edges.extend([(base + a, base + b) for a, b in tmpl_edges])

    # car pose: axis triad at the latest keyframe (x fwd red, y green,
    # z blue in the BODY frame — the reference's car TF)
    if m.num_kfs:
        Twb = np.asarray(m.kf_pose[m.num_kfs - 1], np.float64)
        o = Twb[4:]
        axes = np_se3.se3_apply_batch(
            Twb, np.eye(3) * 2.0 * depth) - o
        for ax_i, col in enumerate(((255, 0, 0), (0, 255, 0),
                                    (0, 0, 255))):
            base = len(verts)
            verts.extend([o, o + axes[ax_i]])
            vcols.extend([col, col])
            edges.append((base, base + 1))

    verts = np.asarray(verts, np.float64)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(verts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\n"
                f"element edge {len(edges)}\n"
                "property int vertex1\nproperty int vertex2\n"
                "end_header\n")
        for p, c in zip(verts, vcols):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                    f"{c[0]} {c[1]} {c[2]}\n")
        for a, b in edges:
            f.write(f"{a} {b}\n")
    return len(edges)
