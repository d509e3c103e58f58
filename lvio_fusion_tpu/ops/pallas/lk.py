"""Pallas TPU kernel: single-level inverse-compositional Lucas-Kanade.

The per-frame tracking hot op (ops/lk.py `_lk_level_pt`, the TPU-native
replacement for the reference's cv::calcOpticalFlowPyrLK,
utility.cpp:55-89). The XLA formulation vmaps a per-point
``dynamic_slice`` block fetch over N points, which lowers to strided HBM
gathers — the one part of the frame program XLA cannot fuse or tile
well. This kernel keeps BOTH pyramid levels resident in VMEM (a padded
KITTI level-0 pair is ~3.7 MB, well under the ~16 MB budget) so every
block fetch is an on-chip dynamic slice, and the whole GN iteration
loop runs on in-register data.

Math is kept IDENTICAL to `_lk_level_pt` (same tent-matmul bilinear
resampling, same Scharr template gradients, same clamping) so the kernel
is exactness-testable against the XLA path (tests/test_pallas_lk.py) and
drop-in switchable per config flag (`EstimatorConfig.pallas_lk`).

Grid: one program per point chunk (C points); each program loops its C
points with unrolled per-point math. Points are cheap relative to the
image residency — the kernel's win is removing the gather traffic, not
MXU utilization of the tiny tent matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# keep in sync with ops/lk.py (search-block margin)
_MARGIN = 11


def _tent(start, out_n: int, in_n: int):
    """(out_n, in_n) bilinear resampling matrix (ops/lk.py _tent_weights),
    built with 2-D iotas (1-D iota is unsupported on TPU)."""
    # integer iota + cast: Mosaic's tpu.iota only produces integers
    j = jax.lax.broadcasted_iota(jnp.int32, (out_n, in_n), 0).astype(
        jnp.float32)
    i = jax.lax.broadcasted_iota(jnp.int32, (out_n, in_n), 1).astype(
        jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(start + j - i))


def _resample(blk, sy, sx, out_n: int):
    R, C = blk.shape
    wy = _tent(sy, out_n, R)
    wx = _tent(sx, out_n, C)
    t = jax.lax.dot_general(wy, blk, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jax.lax.dot_general(t, wx, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


# Mosaic vector loads need provably-aligned dynamic starts: multiples of
# 8 on the sublane (row) dim and 128 on the lane (col) dim for f32. So
# each block fetch loads an ALIGNED superblock and folds the residual
# offset into the tent resampling matrices (translation-covariant — the
# extra rows/cols get zero weight, so the math is unchanged).

def _superdim(n_img: int, size: int, al: int) -> int:
    """Superblock extent along one dim: size + al slack + however much
    keeps n_img ≡ extent (mod al), so the clamp limit n_img - extent is
    itself a multiple of al (provable alignment survives the clamp)."""
    n = size + al + ((n_img - size) % al)
    return n if n <= n_img else n_img


def _aligned_origin(c, lim_sup: int, al: int):
    """al-aligned superblock origin covering the clamped block origin
    ``c`` (float). ``lim_sup`` = img_extent - superblock_extent, a
    multiple of ``al`` by _superdim construction — Mosaic can prove
    (min(x, k*al) // al) * al is a multiple of al."""
    ci = c.astype(jnp.int32)
    return (jnp.minimum(ci, lim_sup) // al) * al


def _scharr(tc):
    d0, d2 = -1.0 / 32, 1.0 / 32
    s0, s1, s2 = 3.0, 10.0, 3.0
    sm_v = s0 * tc[:-2, :] + s1 * tc[1:-1, :] + s2 * tc[2:, :]
    gx = d0 * sm_v[:, :-2] + d2 * sm_v[:, 2:]
    sm_h = s0 * tc[:, :-2] + s1 * tc[:, 1:-1] + s2 * tc[:, 2:]
    gy = d0 * sm_h[:-2, :] + d2 * sm_h[2:, :]
    return gx, gy


def _make_kernel(H: int, W: int, win: int, iters: int, C: int):
    h = (win - 1) / 2.0
    S = win + _MARGIN
    TB = win + 4
    lim = float(S - win - 1)
    # aligned superblock extents + their (aligned) clamp limits
    RT, CT = _superdim(H, TB, 8), _superdim(W, TB, 128)
    RS, CS = _superdim(H, S, 8), _superdim(W, S, 128)
    LRT, LCT = H - RT, W - CT
    LRS, LCS = H - RS, W - CS

    def kernel(pts_ref, seed_ref, img0_ref, img1_ref, out_ref):
        # pts/seeds live in SMEM (scalar reads); results are built as
        # (1, 3) vectors per point — Mosaic cannot store scalars to VMEM
        for j in range(C):
            p0x = pts_ref[j, 0]
            p0y = pts_ref[j, 1]

            # --- template block fetch + subpixel shift + Scharr ---
            cx0 = jnp.clip(jnp.floor(p0x - (h + 1.0)), 0.0, float(W - TB))
            cy0 = jnp.clip(jnp.floor(p0y - (h + 1.0)), 0.0, float(H - TB))
            ax0 = _aligned_origin(cx0, LCT, 128)
            ay0 = _aligned_origin(cy0, LRT, 8)
            blk0 = img0_ref[pl.ds(ay0, RT), pl.ds(ax0, CT)]
            dx0 = cx0 - ax0.astype(jnp.float32)
            dy0 = cy0 - ay0.astype(jnp.float32)
            o0x = jnp.clip(p0x - (h + 1.0) - cx0, 0.0, float(TB - win - 2))
            o0y = jnp.clip(p0y - (h + 1.0) - cy0, 0.0, float(TB - win - 2))
            tc = _resample(blk0, o0y + dy0, o0x + dx0, win + 2)
            t = tc[1:-1, 1:-1]
            gx, gy = _scharr(tc)

            gxx = jnp.sum(gx * gx)
            gxy = jnp.sum(gx * gy)
            gyy = jnp.sum(gy * gy)
            det = gxx * gyy - gxy * gxy
            ok = det > 1e-6
            det_safe = jnp.where(ok, det, 1.0)
            ixx = gyy / det_safe
            ixy = -gxy / det_safe
            iyy = gxx / det_safe

            # --- search block around the seed ---
            p1x = seed_ref[j, 0]
            p1y = seed_ref[j, 1]
            cx1 = jnp.clip(jnp.floor(p1x) - (S // 2), 0.0, float(W - S))
            cy1 = jnp.clip(jnp.floor(p1y) - (S // 2), 0.0, float(H - S))
            ax1 = _aligned_origin(cx1, LCS, 128)
            ay1 = _aligned_origin(cy1, LRS, 8)
            blk1 = img1_ref[pl.ds(ay1, RS), pl.ds(ax1, CS)]
            dx1 = cx1 - ax1.astype(jnp.float32)
            dy1 = cy1 - ay1.astype(jnp.float32)

            def body(_, p):
                px, py = p
                lx = jnp.clip(px - h - cx1, 0.0, lim)
                ly = jnp.clip(py - h - cy1, 0.0, lim)
                w = _resample(blk1, ly + dy1, lx + dx1, win)
                diff = w - t
                bx = jnp.sum(gx * diff)
                by = jnp.sum(gy * diff)
                nx = (lx - (ixx * bx + ixy * by)) + h + cx1
                ny = (ly - (ixy * bx + iyy * by)) + h + cy1
                return (nx, ny)

            p1x, p1y = jax.lax.fori_loop(0, iters, body, (p1x, p1y))
            lx = p1x - h - cx1
            ly = p1y - h - cy1
            inside = ((lx > 0.5) & (lx < lim - 0.5)
                      & (ly > 0.5) & (ly < lim - 0.5))
            lx = jnp.clip(lx, 0.0, lim)
            ly = jnp.clip(ly, 0.0, lim)
            row = jnp.concatenate(
                [(lx + h + cx1).reshape(1, 1),
                 (ly + h + cy1).reshape(1, 1),
                 (ok & inside).astype(jnp.float32).reshape(1, 1)], axis=1)
            out_ref[pl.ds(j, 1), :] = row

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("win", "iters", "interpret", "chunk"))
def lk_level_pallas(img0, img1, pts0, seeds, win: int, iters: int,
                    interpret: bool = False, chunk: int = 8):
    """Track N points one pyramid level: (pts1 (N, 2), ok (N,) bool).

    Drop-in for ``jax.vmap(partial(ops.lk._lk_level_pt, img0, img1,
    win=win, iters=iters))(pts0, seeds)`` — same math, same outputs.
    """
    H, W = img0.shape
    N = pts0.shape[0]
    Np = ((N + chunk - 1) // chunk) * chunk
    if Np != N:
        pad = ((0, Np - N), (0, 0))
        # pad with safely-interior points; rows are discarded below
        pts0 = jnp.pad(pts0, pad, constant_values=float(win))
        seeds = jnp.pad(seeds, pad, constant_values=float(win))

    out = pl.pallas_call(
        _make_kernel(H, W, win, iters, chunk),
        grid=(Np // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((H, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 3), jnp.float32),
        interpret=interpret,
    )(pts0.astype(jnp.float32), seeds.astype(jnp.float32), img0, img1)
    return out[:N, :2], out[:N, 2] > 0.5
