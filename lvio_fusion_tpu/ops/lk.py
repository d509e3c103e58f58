"""Pyramidal Lucas-Kanade optical flow, batched over keypoints.

TPU-native replacement for the reference's bidirectional
cv::calcOpticalFlowPyrLK wrapper (utility.cpp:55-89: 21x21 forward window
with OPTFLOW_USE_INITIAL_FLOW seeding, 3x3 reverse window, 0.5 px
round-trip gate). Inverse-compositional formulation: the 2x2 normal matrix
comes from the template patch so it is computed once per level; fixed
iteration counts keep everything jit-static. vmap over N keypoints turns
patch sampling into batched gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lvio_fusion_tpu.ops.image import (
    extract_patch,
    in_bounds,
    scharr_gradients,
)


def _lk_level(img0, img1, p0, p1_init, win: int, iters: int, grads0=None):
    """Single-level IC-LK for one point. p0: template center in img0;
    p1_init: initial estimate in img1. Returns (p1, converged)."""
    t = extract_patch(img0, p0, win)
    if grads0 is None:
        raise ValueError("grads0 required")
    gx = extract_patch(grads0[0], p0, win)
    gy = extract_patch(grads0[1], p0, win)
    # 2x2 normal matrix from template gradients
    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    ok = det > 1e-6
    det_safe = jnp.where(ok, det, 1.0)
    inv = jnp.array([[gyy, -gxy], [-gxy, gxx]]) / det_safe

    def body(_, p):
        w = extract_patch(img1, p, win)
        diff = w - t
        b = jnp.stack([jnp.sum(gx * diff), jnp.sum(gy * diff)])
        # inverse-compositional translation update: p <- p - inv @ b ... sign:
        # template-gradient forward-additive approximation uses p + (-inv b)
        return p - inv @ b

    p1 = jax.lax.fori_loop(0, iters, body, p1_init)
    return p1, ok


def lk_pyramid(pyr0, pyr1, grads0, pts0, pts_init, win: int = 21,
               iters: int = 8):
    """Track pts0 (N,2) from pyramid pyr0 to pyr1, seeded at pts_init.

    pyr*: list of (H,W) arrays, level 0 full-res. grads0: list of (gx, gy)
    per level of pyr0. Returns (pts1 (N,2), status (N,) bool).
    """
    levels = len(pyr0)
    scale = 2.0 ** (levels - 1)
    p = pts_init / scale
    ok = jnp.ones(pts0.shape[0], dtype=bool)
    H0, W0 = pyr0[0].shape
    # edge-pad each level once so border patches stay aligned —
    # extract_patch's dynamic_slice clamps the START index, which would
    # silently SHIFT patches near borders (consistently wrong tracks that
    # survive the bidirectional check)
    P = win // 2 + 2
    for lvl in range(levels - 1, -1, -1):
        s = 2.0 ** lvl
        p0l = pts0 / s + P
        i0p = jnp.pad(pyr0[lvl], P, mode="edge")
        i1p = jnp.pad(pyr1[lvl], P, mode="edge")
        gxp = jnp.pad(grads0[lvl][0], P, mode="edge")
        gyp = jnp.pad(grads0[lvl][1], P, mode="edge")
        track = jax.vmap(partial(_lk_level, i0p, i1p, win=win,
                                 iters=iters, grads0=(gxp, gyp)))
        p, ok_l = track(p0l, p + P)
        p = p - P
        ok = ok & ok_l
        if lvl > 0:
            p = p * 2.0
    Hc, Wc = pyr1[0].shape
    ok = ok & in_bounds(p, Hc, Wc, margin=float(win // 2))
    return p, ok


def track_bidirectional(pyr0, pyr1, pts0, pts_init=None, win: int = 21,
                        iters: int = 8, back_win: int = 9,
                        max_dev: float = 0.5):
    """Forward LK + reverse check (reference utility.cpp:55-89 semantics).

    Returns (pts1, status): status True where forward track converged AND
    the reverse track lands within ``max_dev`` px of the start.
    """
    grads0 = [scharr_gradients(l) for l in pyr0]
    grads1 = [scharr_gradients(l) for l in pyr1]
    if pts_init is None:
        pts_init = pts0
    pts1, ok_f = lk_pyramid(pyr0, pyr1, grads0, pts0, pts_init, win, iters)
    # reverse: seed at pts0, small window
    back, ok_b = lk_pyramid(pyr1, pyr0, grads1, pts1, pts0, back_win, iters)
    dev = jnp.linalg.norm(back - pts0, axis=-1)
    H, W = pyr0[0].shape
    status = ok_f & ok_b & (dev < max_dev) & in_bounds(pts1, H, W, 1.0)
    return pts1, status
