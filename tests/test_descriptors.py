"""BRIEF descriptors + Hamming matching on shifted synthetic texture."""

import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.ops.descriptors import (
    brief_descriptors, hamming_matrix, match,
)
from test_vision_ops import checker_texture


def test_descriptors_match_under_shift():
    H, W = 128, 192
    img0 = checker_texture(H + 16, W + 16, seed=3)
    from lvio_fusion_tpu.ops.image import bilinear_sample
    yy, xx = jnp.mgrid[0:H, 0:W]
    dx, dy = 2.0, -1.0
    img1 = bilinear_sample(img0, jnp.stack(
        [xx + 8 + dx, yy + 8 + dy], -1).astype(jnp.float32))
    img0c = img0[8:8 + H, 8:8 + W]

    # spaced grid: nearby random points would legitimately share texture
    gx, gy = np.meshgrid(np.arange(30, 150, 15), np.arange(30, 100, 15))
    pts0 = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], 1)[:40]
                       .astype(np.float32))
    pts1 = pts0 - jnp.asarray([dx, dy])  # same physical points in img1
    v = jnp.ones(40, bool)

    d0, ok0 = brief_descriptors(img0c, pts0, v)
    d1, ok1 = brief_descriptors(img1, pts1, v)
    assert bool(ok0.all()) and bool(ok1.all())

    # self-distance near zero, cross-distance large
    dist = hamming_matrix(d0, d1)
    diag = jnp.diagonal(dist)
    assert float(diag.mean()) < 25, diag
    off = dist + jnp.eye(40, dtype=jnp.int32) * 300
    # steering normalizes orientation, which makes rotational variants of
    # similar texture closer — 30 still leaves a wide margin over diag
    assert float(off.min()) > 30, "distinct points too similar"

    idx, good = match(d0, ok0, d1, ok1)
    correct = (np.asarray(idx) == np.arange(40)) & np.asarray(good)
    assert correct.mean() > 0.9, correct.mean()


def test_patch_bilinear_matches_full_image_gathers():
    """The patch fast path (_extract_patches + _patch_bilinear, the MXU
    replacement for full-image gathers) must reproduce bilinear_sample
    exactly (same 4 pixels, same tent weights) for every sample whose
    keypoint is >= _PR+1 inside the image."""
    from lvio_fusion_tpu.ops.descriptors import (
        _PR, _extract_patches, _patch_bilinear,
    )
    from lvio_fusion_tpu.ops.image import bilinear_sample

    H, W, N, S = 96, 160, 23, 57
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(
        [_PR + 1, _PR + 1], [W - _PR - 2, H - _PR - 2],
        (N, 2)).astype(np.float32))
    rel = jnp.asarray(rng.uniform(-22, 22, (N, S, 2)).astype(np.float32))

    patches, orig = _extract_patches(img, pts)
    got = _patch_bilinear(patches, (pts - orig)[:, None, :] + rel)
    want = bilinear_sample(img, pts[:, None, :] + rel)
    # same 4 pixels and tent weights; f32 association order differs
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


def test_descriptors_match_under_rotation():
    """Steered BRIEF (intensity-centroid orientation, extractor.cpp:66-93):
    the same physical points must still match after a 30-degree in-plane
    rotation — unsteered BRIEF fails this."""
    from lvio_fusion_tpu.ops.image import bilinear_sample

    H = W = 200
    img0 = checker_texture(H, W, seed=5)
    ang = np.radians(30.0)
    c, s = np.cos(ang), np.sin(ang)
    cx = cy = 100.0
    yy, xx = jnp.mgrid[0:H, 0:W]
    # img1(p) = img0(R^-1 (p - c) + c)
    xr = c * (xx - cx) + s * (yy - cy) + cx
    yr = -s * (xx - cx) + c * (yy - cy) + cy
    img1 = bilinear_sample(img0, jnp.stack([xr, yr], -1)
                           .astype(jnp.float32))

    gx, gy = np.meshgrid(np.arange(70, 135, 16), np.arange(70, 135, 16))
    pts0 = np.stack([gx.ravel(), gy.ravel()], 1).astype(np.float32)
    # forward-rotate the keypoints into img1
    px = c * (pts0[:, 0] - cx) - s * (pts0[:, 1] - cy) + cx
    py = s * (pts0[:, 0] - cx) + c * (pts0[:, 1] - cy) + cy
    pts1 = np.stack([px, py], 1).astype(np.float32)
    n = len(pts0)
    v = jnp.ones(n, bool)

    d0, ok0 = brief_descriptors(img0, jnp.asarray(pts0), v)
    d1, ok1 = brief_descriptors(img1, jnp.asarray(pts1), v)
    idx, good = match(d0, ok0, d1, ok1, max_dist=60)
    correct = (np.asarray(idx) == np.arange(n)) & np.asarray(good)
    print("rotation match rate:", correct.mean())
    assert correct.mean() > 0.6, correct.mean()
