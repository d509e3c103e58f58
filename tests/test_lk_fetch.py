"""Exactness of the batched MXU block-fetch vs the gather formulation.

The TPU path of ops/lk.py `_fetch_blocks` expresses the per-point block
fetch as two one-hot selection matmuls (the vmapped dynamic_slice lowers
to per-point HBM gathers — the r6-profiled per-level fixed overhead);
one-hot selection does no arithmetic on pixel values, so the two paths
must produce bit-identical blocks, and the whole LK level built on them
must produce bit-identical tracks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.ops.lk import (
    _fetch_blocks, _lk_level_blocks, _lk_level_pt, _MARGIN,
)


def _fixture(H=64, W=96, N=37, seed=3):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random((H, W), np.float32))
    pts = rng.uniform([2, 2], [W - 2, H - 2], (N, 2)).astype(np.float32)
    return img, jnp.asarray(pts)


def test_fetch_blocks_mm_matches_slice():
    img, pts = _fixture()
    # corners chosen to exercise the clamps on every edge
    corners = jnp.concatenate([
        jnp.floor(pts - 7.0),
        jnp.array([[-5.0, -5.0], [200.0, 100.0], [0.0, 61.0]],
                  jnp.float32),
    ])
    for S in (13, 25, 32):
        b_mm, c_mm = _fetch_blocks(img, corners, S, mode="mm")
        b_sl, c_sl = _fetch_blocks(img, corners, S, mode="slice")
        np.testing.assert_array_equal(np.asarray(b_mm), np.asarray(b_sl))
        np.testing.assert_array_equal(np.asarray(c_mm), np.asarray(c_sl))


def test_lk_level_mm_matches_per_point():
    """Full level: batched mm-fetch + shared math == the per-point
    reference formulation, bitwise."""
    img0, pts = _fixture(seed=5)
    img1, _ = _fixture(seed=6)
    seeds = pts + jnp.asarray(
        np.random.default_rng(7).normal(0, 1.0, pts.shape)
        .astype(np.float32))
    win, iters = 15, 6
    h = (win - 1) / 2.0
    S = win + _MARGIN
    TB = win + 4
    blk0, c0 = _fetch_blocks(img0, jnp.floor(pts - (h + 1.0)), TB,
                             mode="mm")
    blk1, c1 = _fetch_blocks(img1, jnp.floor(seeds) - (S // 2), S,
                             mode="mm")
    from functools import partial
    p_mm, ok_mm = jax.vmap(partial(_lk_level_blocks, win=win,
                                   iters=iters))(blk0, c0, blk1, c1,
                                                 pts, seeds)
    p_ref, ok_ref = jax.vmap(partial(_lk_level_pt, img0, img1, win=win,
                                     iters=iters))(pts, seeds)
    np.testing.assert_array_equal(np.asarray(p_mm), np.asarray(p_ref))
    np.testing.assert_array_equal(np.asarray(ok_mm), np.asarray(ok_ref))
