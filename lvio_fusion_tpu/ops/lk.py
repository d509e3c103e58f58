"""Pyramidal Lucas-Kanade optical flow, batched over keypoints.

TPU-native replacement for the reference's bidirectional
cv::calcOpticalFlowPyrLK wrapper (utility.cpp:55-89: 21x21 forward window
with OPTFLOW_USE_INITIAL_FLOW seeding, 3x3 reverse window, 0.5 px
round-trip gate). Inverse-compositional formulation: the 2x2 normal matrix
comes from the template patch so it is computed once per level; fixed
iteration counts keep everything jit-static.

Kernel design (the per-frame hot loop — see CLAUDE.md): the naive
formulation (vmapped image-wide ``dynamic_slice`` per GN iteration plus
full-image Scharr on every pyramid level of both frames) costs ~26 ms of
device time per frame. Instead each point fetches TWO fixed-size blocks
from HBM once per level — a template block around p0 and a search block
around the seed — and every subsequent subpixel window sample is a pair of
small banded "tent" matmuls on the in-register block (bilinear
interpolation expressed as W_y @ block @ W_x^T), batched MXU/VPU work with
zero inner-loop gathers. Template gradients come from Scharr shifts inside
the fetched block, eliminating full-image gradient passes entirely.
Border handling needs no image padding: ``dynamic_slice`` clamps the
block corner and the fractional window offset is measured from the
CLAMPED corner, so any window fully inside the image resamples exactly;
windows that leave the image produce clamped tracks that the
bidirectional/in-bounds gates reject. ~4x faster end to end.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from lvio_fusion_tpu.ops.image import in_bounds

# search-block margin: per-level corrections beyond this are clamped and
# left to the bidirectional check to reject (pyramid seeding keeps genuine
# tracks within a few px per level)
_MARGIN = 11


def _tent_weights(start, out_n: int, in_n: int, dtype):
    """(out_n, in_n) bilinear resampling matrix: row j samples position
    ``start + j`` of the input axis (2 nonzero taps per row)."""
    j = jnp.arange(out_n, dtype=dtype)[:, None]
    i = jnp.arange(in_n, dtype=dtype)[None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(start + j - i))


def _resample(blk, start_y, start_x, out_n: int):
    """Sample an (out_n, out_n) window from blk (S, S) with its top-left
    corner at fractional position (start_y, start_x).

    Two mathematically identical formulations (tent weights ARE bilinear
    taps), dispatched by backend at trace time:
    - TPU: banded tent MATMULS — per-point dynamic slices inside a vmap
      lower to gathers, which are the slow path on TPU; the MXU is idle
      anyway.
    - CPU (the test mesh): ONE (out_n+1)^2 dynamic slice + a 4-tap lerp —
      ~8x faster than the matmuls (measured), and gathers are cheap
      there. Callers clamp start <= S - out_n, so the slice start
      clamps at most 1 row/col down with the fraction hitting exactly
      1.0 — still exact bilinear.
    """
    S = blk.shape[0]
    if jax.default_backend() in ("tpu", "axon"):
        wy = _tent_weights(start_y, out_n, S, blk.dtype)
        wx = _tent_weights(start_x, out_n, S, blk.dtype)
        return wy @ blk @ wx.T
    iy = jnp.clip(jnp.floor(start_y), 0.0, S - out_n - 1).astype(jnp.int32)
    ix = jnp.clip(jnp.floor(start_x), 0.0, S - out_n - 1).astype(jnp.int32)
    fy = start_y - iy.astype(blk.dtype)
    fx = start_x - ix.astype(blk.dtype)
    big = jax.lax.dynamic_slice(blk, (iy, ix), (out_n + 1, out_n + 1))
    a, b = big[:-1, :-1], big[:-1, 1:]
    c, d = big[1:, :-1], big[1:, 1:]
    return ((1.0 - fy) * (1.0 - fx) * a + (1.0 - fy) * fx * b
            + fy * (1.0 - fx) * c + fy * fx * d)


def _scharr_patch(tc):
    """Scharr x/y gradients (1/32 normalized) of the interior of a patch;
    tc (n, n) -> (n-2, n-2) each."""
    d0, d2 = -1.0 / 32, 1.0 / 32
    s0, s1, s2 = 3.0, 10.0, 3.0
    # smooth vertically, differentiate horizontally (gx)
    sm_v = s0 * tc[:-2, :] + s1 * tc[1:-1, :] + s2 * tc[2:, :]
    gx = d0 * sm_v[:, :-2] + d2 * sm_v[:, 2:]
    sm_h = s0 * tc[:, :-2] + s1 * tc[:, 1:-1] + s2 * tc[:, 2:]
    gy = d0 * sm_h[:-2, :] + d2 * sm_h[2:, :]
    return gx, gy


def _fetch_block(img, corner_xy, S: int):
    """Clamped (S, S) block fetch; returns (block, clamped corner)."""
    H, W = img.shape
    cx = jnp.clip(corner_xy[0], 0.0, W - S)
    cy = jnp.clip(corner_xy[1], 0.0, H - S)
    blk = jax.lax.dynamic_slice(
        img, (cy.astype(jnp.int32), cx.astype(jnp.int32)), (S, S))
    return blk, jnp.stack([cx, cy])


def _fetch_blocks(img, corners_xy, S: int, mode=None):
    """Batched clamped (S, S) block fetch for N points: blocks (N, S, S)
    + clamped corners (N, 2), equal to vmapping ``_fetch_block``.
    ``mode``: None = dispatch by backend; "mm"/"slice" force a path
    (tests assert both produce identical blocks).

    Backend-dispatched at trace time like ``_resample``:
    - TPU: TWO one-hot selection MATMULS (rows then columns). The
      vmapped 2-D ``dynamic_slice`` lowers to per-point HBM gathers
      costing ~0.75 ms per pyramid level for 400 points REGARDLESS of
      level size — the r6-profiled "per-level fixed overhead" that made
      LK the biggest on-chip stage. Expressing the same selection as
      one-hot matmuls puts it on the MXU: 3.08 -> 0.71 ms over 4 levels
      (misc/prof_lk.py, on-chip). Exact — each output element is one
      1.0*x plus zeros, no arithmetic on values.
    - CPU (the test mesh): the original vmapped dynamic_slice; gathers
      are cheap there and the one-hot construction is not. Both paths
      select identical elements, so results are bit-identical.
    """
    H, W = img.shape
    cx = jnp.clip(corners_xy[:, 0], 0.0, W - S)
    cy = jnp.clip(corners_xy[:, 1], 0.0, H - S)
    if mode is None:
        # LVIO_LK_FETCH=mm|slice forces a path (on-chip A/B knob)
        mode = os.environ.get("LVIO_LK_FETCH") or (
            "mm" if jax.default_backend() in ("tpu", "axon")
            else "slice")
    if mode == "mm":
        iy = cy.astype(jnp.int32)
        ix = cx.astype(jnp.int32)
        rsel = (iy[:, None, None] + jnp.arange(S)[None, :, None]
                == jnp.arange(H)[None, None, :]).astype(img.dtype)
        strips = jnp.einsum("nsh,hw->nsw", rsel, img)
        csel = (ix[:, None, None] + jnp.arange(S)[None, :, None]
                == jnp.arange(W)[None, None, :]).astype(img.dtype)
        blocks = jnp.einsum("nsw,ntw->nst", strips, csel)
    else:
        blocks = jax.vmap(lambda x, y: jax.lax.dynamic_slice(
            img, (y.astype(jnp.int32), x.astype(jnp.int32)),
            (S, S)))(cx, cy)
    return blocks, jnp.stack([cx, cy], axis=-1)


def _lk_level_pt(img0, img1, p0, p1_init, win: int, iters: int):
    """Single-level IC-LK for one point. p0: template center in img0;
    p1_init: initial estimate in img1. Returns (p1, ok)."""
    h = (win - 1) / 2.0
    S = win + _MARGIN
    TB = win + 4
    blk0, c0 = _fetch_block(img0, jnp.floor(p0 - (h + 1.0)), TB)
    blk1, c1 = _fetch_block(img1, jnp.floor(p1_init) - (S // 2), S)
    return _lk_level_blocks(blk0, c0, blk1, c1, p0, p1_init, win, iters)


def _lk_level_blocks(blk0, c0, blk1, c1, p0, p1_init, win: int,
                     iters: int):
    """IC-LK on pre-fetched blocks (the post-fetch math of the level,
    shared by the per-point and batched-fetch formulations)."""
    h = (win - 1) / 2.0
    S = blk1.shape[0]
    TB = blk0.shape[0]

    # --- template: subpixel shift + in-block Scharr (local_map/frontend
    # tracking both go through here) ---
    o0 = jnp.clip(p0 - (h + 1.0) - c0, 0.0, float(TB - win - 2))
    tc = _resample(blk0, o0[1], o0[0], win + 2)
    t = tc[1:-1, 1:-1]
    gx, gy = _scharr_patch(tc)

    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    ok = det > 1e-6
    det_safe = jnp.where(ok, det, 1.0)
    inv = jnp.array([[gyy, -gxy], [-gxy, gxx]]) / det_safe

    lim = jnp.asarray(S - win - 1, blk0.dtype)

    def body(_, p):
        # window start within the block, clamped to stay in-block
        l = jnp.clip(p - h - c1, 0.0, lim)
        w = _resample(blk1, l[1], l[0], win)
        diff = w - t
        b = jnp.stack([jnp.sum(gx * diff), jnp.sum(gy * diff)])
        return (l - inv @ b) + h + c1

    p1 = jax.lax.fori_loop(0, iters, body, p1_init)
    # a track pinned to the block edge did not converge locally
    l_fin = p1 - h - c1
    inside = ((l_fin[0] > 0.5) & (l_fin[0] < lim - 0.5)
              & (l_fin[1] > 0.5) & (l_fin[1] < lim - 0.5))
    l_fin = jnp.clip(l_fin, 0.0, lim)
    return l_fin + h + c1, ok & inside


def _track_level(i0, i1, pts, seeds, win: int, iters: int,
                 use_pallas: bool):
    """One pyramid level over all points: Pallas kernel (VMEM-resident
    images, zero HBM gathers — ops/pallas/lk.py) or the vmapped XLA
    block-fetch formulation."""
    if use_pallas:
        from lvio_fusion_tpu.ops.pallas.lk import lk_level_pallas
        interp = jax.default_backend() not in ("tpu", "axon")
        return lk_level_pallas(i0, i1, pts, seeds, win, iters,
                               interpret=interp)
    h = (win - 1) / 2.0
    S = win + _MARGIN
    TB = win + 4
    blk0, c0 = _fetch_blocks(i0, jnp.floor(pts - (h + 1.0)), TB)
    blk1, c1 = _fetch_blocks(i1, jnp.floor(seeds) - (S // 2), S)
    return jax.vmap(partial(_lk_level_blocks, win=win,
                            iters=iters))(blk0, c0, blk1, c1, pts, seeds)


def lk_level_shim(i0, i1, pts, seeds, win: int, iters: int,
                  use_pallas: bool = False):
    """Public single-level entry (exactness tests / external callers)."""
    return _track_level(i0, i1, pts, seeds, win, iters, use_pallas)


def lk_pyramid(pyr0, pyr1, pts0, pts_init, win: int = 21, iters: int = 8,
               use_pallas: bool = False):
    """Track pts0 (N,2) from pyramid pyr0 to pyr1, seeded at pts_init.

    pyr*: list of (H,W) arrays, level 0 full-res.
    Returns (pts1 (N,2), status (N,) bool).
    """
    levels = len(pyr0)
    scale = 2.0 ** (levels - 1)
    p = pts_init / scale
    ok = jnp.ones(pts0.shape[0], dtype=bool)
    for lvl in range(levels - 1, -1, -1):
        s = 2.0 ** lvl
        if lvl == 0:
            # the full-res level stays pad-free (it is the big copy);
            # near-border windows get clamped blocks and are gated below
            i0, i1, off = pyr0[0], pyr1[0], 0.0
        else:
            # coarse levels are small: edge-pad so windows that overhang
            # the image see replicated borders (a window spanning 10 px
            # off-image at level 3 is 80 px of valid features at level 0)
            P = win // 2 + 8
            i0 = jnp.pad(pyr0[lvl], P, mode="edge")
            i1 = jnp.pad(pyr1[lvl], P, mode="edge")
            off = float(P)
        p, ok_l = _track_level(i0, i1, pts0 / s + off, p + off,
                               win, iters, use_pallas)
        p = p - off
        if lvl == 0:
            ok = ok & ok_l
        if lvl > 0:
            p = p * 2.0
    H0, W0 = pyr1[0].shape
    ok = ok & in_bounds(p, H0, W0, margin=1.0)
    return p, ok


def track_bidirectional(pyr0, pyr1, pts0, pts_init=None, win: int = 21,
                        iters: int = 8, back_win: int = 9,
                        max_dev: float = 0.5, use_pallas: bool = False):
    """Forward LK + reverse check (reference utility.cpp:55-89 semantics).

    Returns (pts1, status): status True where forward track converged AND
    the reverse track lands within ``max_dev`` px of the start.
    """
    if pts_init is None:
        pts_init = pts0
    pts1, ok_f = lk_pyramid(pyr0, pyr1, pts0, pts_init, win, iters,
                            use_pallas)
    # reverse check runs at full resolution only: it is seeded at the
    # expected answer (pts0), so coarse levels add cost, not convergence
    back, ok_b = lk_pyramid(pyr1[:1], pyr0[:1], pts1, pts0, back_win, iters,
                            use_pallas)
    dev = jnp.linalg.norm(back - pts0, axis=-1)
    H, W = pyr0[0].shape
    status = ok_f & ok_b & (dev < max_dev) & in_bounds(pts1, H, W, 1.0)
    return pts1, status
