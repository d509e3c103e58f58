"""Corner detection: Shi-Tomasi (GFTT) scoring + cell-balanced top-k.

TPU-native replacement for the reference's quadtree-balanced FAST/ORB
extractor (extractor.cpp:160-417). The quadtree's goal — spatially uniform
keypoints, best-response-per-region — maps to a fixed grid: score every
pixel, 3x3 NMS, then keep the best corner per cell and the global top-N
among cell winners. Fixed shapes throughout; existing features suppress
their neighborhoods via an occupancy mask (the cv mask in
local_map.cpp GetFeaturePyramid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lvio_fusion_tpu.ops.image import box_filter, sobel_gradients


def shi_tomasi_score(img, window: int = 5):
    """Min-eigenvalue of the structure tensor at every pixel."""
    ix, iy = sobel_gradients(img)
    ixx = box_filter(ix * ix, window)
    iyy = box_filter(iy * iy, window)
    ixy = box_filter(ix * iy, window)
    tr = ixx + iyy
    det_disc = jnp.sqrt(jnp.maximum((ixx - iyy) ** 2 + 4.0 * ixy * ixy, 0.0))
    return 0.5 * (tr - det_disc)


def nms3(score):
    """Keep only 3x3 local maxima."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return jnp.where(score >= m, score, 0.0)


def occupancy_mask(shape, pts, valid, radius: int):
    """Boolean (H, W): True where detection is allowed (no existing feature
    within ``radius``). Built by stamping + max-pooling (fixed shapes)."""
    H, W = shape
    occ = jnp.zeros((H, W), dtype=jnp.float32)
    xi = jnp.clip(jnp.round(pts[:, 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(pts[:, 1]).astype(jnp.int32), 0, H - 1)
    occ = occ.at[yi, xi].max(valid.astype(jnp.float32))
    k = 2 * radius + 1
    occ = jax.lax.reduce_window(occ, 0.0, jax.lax.max, (k, k), (1, 1), "SAME")
    return occ < 0.5


def pyramid_score(pyr, levels_used: int = 3):
    """Combined multi-scale corner score at level-0 resolution: per-level
    Shi-Tomasi + NMS, nearest-neighbor upsampled, elementwise max.

    The reference detects FAST corners on every pyramid level
    (extractor.cpp ComputeKeyPointsQuadTree over nlevels=4); here the
    per-level responses compete in one level-0 score map so the
    cell-balanced top-N picks the strongest scale per region. Coarse
    levels respond to large-scale structure that level 0 misses (blur
    attenuates fine texture), giving the same scale-coverage goal without
    per-level keypoint lists."""
    H, W = pyr[0].shape
    combined = nms3(shi_tomasi_score(pyr[0]))
    for l in range(1, min(levels_used, len(pyr))):
        s = nms3(shi_tomasi_score(pyr[l]))
        up = jnp.repeat(jnp.repeat(s, 2 ** l, axis=0), 2 ** l, axis=1)
        combined = jnp.maximum(combined, up[:H, :W])
    return combined


def detect_grid(img, num_features: int, cell: int = 30, mask=None,
                min_score: float = 1e-4, border: int = 8, score=None):
    """Detect up to num_features corners, at most one per cell.

    ``score``: optional precomputed response map (e.g. pyramid_score);
    defaults to single-scale Shi-Tomasi + NMS of ``img``.
    Returns (pts (N,2) float32 [x,y], score (N,), valid (N,) bool),
    N = num_features, sorted by score descending.
    """
    H, W = img.shape
    if score is None:
        score = nms3(shi_tomasi_score(img))
    if mask is not None:
        score = jnp.where(mask, score, 0.0)
    # suppress borders
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = ((xx >= border) & (xx < W - border)
           & (yy >= border) & (yy < H - border))
    score = jnp.where(inb, score, 0.0)

    # pad to multiples of cell, then best-per-cell
    ph, pw = (-H) % cell, (-W) % cell
    score_p = jnp.pad(score, ((0, ph), (0, pw)))
    Hc, Wc = (H + ph) // cell, (W + pw) // cell
    cells = score_p.reshape(Hc, cell, Wc, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(Hc * Wc, cell * cell)
    best = jnp.argmax(cells, axis=1)
    best_score = jnp.take_along_axis(cells, best[:, None], axis=1)[:, 0]
    cy = best // cell + jnp.arange(Hc * Wc) // Wc * cell
    cx = best % cell + (jnp.arange(Hc * Wc) % Wc) * cell

    # global top-N among cell winners
    k = min(num_features, Hc * Wc)
    top_score, top_idx = jax.lax.top_k(best_score, k)
    pts = jnp.stack([cx[top_idx].astype(jnp.float32),
                     cy[top_idx].astype(jnp.float32)], axis=-1)
    valid = top_score > min_score
    if k < num_features:
        pad_n = num_features - k
        pts = jnp.concatenate([pts, jnp.zeros((pad_n, 2), pts.dtype)])
        top_score = jnp.concatenate([top_score, jnp.zeros((pad_n,))])
        valid = jnp.concatenate([valid, jnp.zeros((pad_n,), bool)])
    return pts, top_score, valid
