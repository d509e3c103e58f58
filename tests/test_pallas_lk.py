"""Pallas LK kernel vs the XLA block-fetch path: same math, same answers.

The kernel (ops/pallas/lk.py) reimplements ops/lk.py `_lk_level_pt` with
VMEM-resident images; it must match the vmapped XLA formulation to float
roundoff on every point, and the full bidirectional tracker must produce
the same inlier sets end to end. Runs in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvio_fusion_tpu.ops.image import build_pyramid
from lvio_fusion_tpu.ops.lk import (
    _lk_level_pt, lk_level_shim, track_bidirectional,
)


def _render(H, W, pts, seed=0):
    """Smooth blob field with gradient-rich texture."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = 40.0 + 10.0 * np.sin(xx * 0.07) * np.cos(yy * 0.05)
    for px, py in pts:
        a = 120.0 * rng.uniform(0.5, 1.0)
        s = rng.uniform(2.0, 4.0)
        img += a * np.exp(-((xx - px) ** 2 + (yy - py) ** 2) / (2 * s * s))
    return np.clip(img, 0, 255).astype(np.float32) / 255.0


def _scene(H=120, W=160, n=24, shift=(3.2, -2.1), seed=1):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(20, W - 20, n),
                    rng.uniform(20, H - 20, n)], axis=1).astype(np.float32)
    img0 = _render(H, W, pts, seed=seed)
    img1 = _render(H, W, pts + np.asarray(shift, np.float32), seed=seed)
    return img0, img1, pts


def test_level_exactness_vs_xla():
    img0, img1, pts = _scene()
    seeds = pts + np.float32([1.5, -0.5])
    win, iters = 15, 6

    from functools import partial
    p_ref, ok_ref = jax.vmap(partial(_lk_level_pt, jnp.asarray(img0),
                                     jnp.asarray(img1), win=win,
                                     iters=iters))(jnp.asarray(pts),
                                                   jnp.asarray(seeds))
    p_k, ok_k = lk_level_shim(jnp.asarray(img0), jnp.asarray(img1),
                              jnp.asarray(pts), jnp.asarray(seeds),
                              win, iters, use_pallas=True)
    # identical formulas; only matmul association may differ
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_ref),
                               atol=5e-3)
    assert np.mean(np.asarray(ok_k) == np.asarray(ok_ref)) >= 0.95


def test_level_nonmultiple_chunk_padding():
    img0, img1, pts = _scene(n=13)  # not a multiple of the 8-point chunk
    p_k, ok_k = lk_level_shim(jnp.asarray(img0), jnp.asarray(img1),
                              jnp.asarray(pts), jnp.asarray(pts),
                              15, 6, use_pallas=True)
    assert p_k.shape == (13, 2) and ok_k.shape == (13,)
    assert bool(jnp.all(jnp.isfinite(p_k)))


@pytest.mark.parametrize("shift", [(3.2, -2.1), (9.5, 6.0)])
def test_bidirectional_end_to_end(shift):
    img0, img1, pts = _scene(shift=shift)
    pyr0 = build_pyramid(jnp.asarray(img0), 3)
    pyr1 = build_pyramid(jnp.asarray(img1), 3)
    p_ref, s_ref = track_bidirectional(pyr0, pyr1, jnp.asarray(pts),
                                       win=15, use_pallas=False)
    p_k, s_k = track_bidirectional(pyr0, pyr1, jnp.asarray(pts),
                                   win=15, use_pallas=True)
    s_ref = np.asarray(s_ref)
    s_k = np.asarray(s_k)
    assert s_ref.sum() > len(pts) * 0.6      # scene is trackable at all
    agree = np.mean(s_ref == s_k)
    assert agree >= 0.9
    both = s_ref & s_k
    np.testing.assert_allclose(np.asarray(p_k)[both],
                               np.asarray(p_ref)[both], atol=0.05)
    # tracked points actually moved by ~shift
    dev = np.asarray(p_k)[both] - pts[both] - np.asarray(shift, np.float32)
    assert np.median(np.linalg.norm(dev, axis=1)) < 0.5


def test_border_points_are_gated_not_nan():
    img0, img1, pts = _scene()
    edge = np.array([[2.0, 3.0], [157.0, 2.0], [1.0, 117.0]], np.float32)
    allp = np.concatenate([pts, edge]).astype(np.float32)
    p_k, ok_k = lk_level_shim(jnp.asarray(img0), jnp.asarray(img1),
                              jnp.asarray(allp), jnp.asarray(allp),
                              15, 6, use_pallas=True)
    assert bool(jnp.all(jnp.isfinite(p_k)))
