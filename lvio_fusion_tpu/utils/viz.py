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
