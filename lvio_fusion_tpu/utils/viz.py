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
