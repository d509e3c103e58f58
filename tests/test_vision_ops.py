"""Vision kernels: detection finds synthetic corners, LK recovers known
shifts, triangulation inverts projection."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry.se3 import se3_identity, se3_make
from lvio_fusion_tpu.models.camera import Camera
from lvio_fusion_tpu.ops.detect import detect_grid, occupancy_mask
from lvio_fusion_tpu.ops.image import (
    bilinear_sample, build_pyramid, pad_to_multiple, sample_patch,
)
from lvio_fusion_tpu.ops.lk import track_bidirectional
from lvio_fusion_tpu.ops.stereo import pixel_to_norm, triangulate


def checker_texture(H, W, seed=0):
    """Random smooth texture with good gradients everywhere."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (H // 8 + 2, W // 8 + 2))
    img = np.kron(base, np.ones((8, 8)))[:H, :W]
    # smooth slightly
    from scipy.ndimage import gaussian_filter
    return jnp.asarray(gaussian_filter(img, 1.5), dtype=jnp.float32)


class TestBilinear:
    def test_integer_coords_exact(self):
        img = jnp.arange(25.0).reshape(5, 5)
        pts = jnp.array([[2.0, 3.0], [0.0, 0.0]])
        np.testing.assert_allclose(bilinear_sample(img, pts), [17.0, 0.0])

    def test_halfway(self):
        img = jnp.array([[0.0, 1.0], [2.0, 3.0]])
        assert abs(float(bilinear_sample(img, jnp.array([0.5, 0.5]))) - 1.5) < 1e-6


class TestDetect:
    def test_finds_synthetic_corners(self):
        H, W = 120, 160
        img = jnp.zeros((H, W))
        # white squares produce strong corners at their boundaries
        trues = [(30, 40), (30, 120), (90, 40), (90, 120)]
        for (y, x) in trues:
            img = img.at[y - 6:y + 6, x - 6:x + 6].set(1.0)
        pts, score, valid = detect_grid(img, num_features=16, cell=20)
        pts = np.asarray(pts[valid])
        # every true square must have >= 1 detection within 10 px
        for (y, x) in trues:
            d = np.linalg.norm(pts - np.array([x, y]), axis=-1)
            assert d.min() < 10.0, f"corner near {(x, y)} not found: {pts}"

    def test_occupancy_mask_suppresses(self):
        H, W = 64, 64
        existing = jnp.array([[32.0, 32.0]])
        mask = occupancy_mask((H, W), existing, jnp.array([True]), radius=10)
        assert not bool(mask[32, 32])
        assert not bool(mask[40, 40])
        assert bool(mask[50, 50])


class TestLK:
    def test_recovers_known_shift(self):
        H, W = 128, 192
        img0 = checker_texture(H + 16, W + 16)
        dx, dy = 3.0, -2.0
        # img1 = img0 shifted by (dx, dy): sample img0 at p + (dx, dy)
        yy, xx = jnp.mgrid[0:H, 0:W]
        img1 = bilinear_sample(img0, jnp.stack(
            [xx + 8 + dx, yy + 8 + dy], axis=-1).astype(jnp.float32))
        img0c = img0[8:8 + H, 8:8 + W]

        pyr0 = build_pyramid(img0c, 3)
        pyr1 = build_pyramid(img1, 3)
        pts0 = jnp.array([[60.0, 50.0], [100.0, 70.0], [140.0, 90.0],
                          [40.0, 30.0]])
        pts1, ok = track_bidirectional(pyr0, pyr1, pts0)
        # point at p in img1 shows content of img0 at p + (dx,dy):
        # feature at x0 in img0 appears at x0 - dx in img1
        expect = pts0 - jnp.array([dx, dy])
        assert bool(ok.all()), f"status: {ok}"
        np.testing.assert_allclose(np.asarray(pts1), np.asarray(expect),
                                   atol=0.35)

    def test_rejects_occluded(self):
        H, W = 96, 96
        img0 = checker_texture(H, W, seed=1)
        img1 = checker_texture(H, W, seed=2)  # unrelated content
        pyr0, pyr1 = build_pyramid(img0, 3), build_pyramid(img1, 3)
        pts0 = jnp.array([[48.0, 48.0], [30.0, 60.0]])
        _, ok = track_bidirectional(pyr0, pyr1, pts0)
        assert not bool(ok.any())


class TestTriangulate:
    def test_inverts_projection(self):
        cam0 = Camera.create(400.0, 400.0, 160.0, 120.0, se3_identity())
        cam1 = Camera.create(
            400.0, 400.0, 160.0, 120.0,
            se3_make(jnp.array([1.0, 0, 0, 0]), jnp.array([0.5, 0.0, 0.0])))
        rng = np.random.default_rng(0)
        pw = jnp.asarray(np.stack([
            rng.uniform(-3, 3, 32), rng.uniform(-2, 2, 32),
            rng.uniform(4, 30, 32)], 1), dtype=jnp.float32)
        Twb = se3_identity()
        px0 = jax.vmap(lambda p: cam0.world2pixel(p, Twb))(pw)
        px1 = jax.vmap(lambda p: cam1.world2pixel(p, Twb))(pw)
        uv0 = pixel_to_norm(px0, 400.0, 400.0, 160.0, 120.0)
        uv1 = pixel_to_norm(px1, 400.0, 400.0, 160.0, 120.0)
        T0 = jnp.broadcast_to(cam0.extrinsic, (32, 7))
        T1 = jnp.broadcast_to(cam1.extrinsic, (32, 7))
        est, good = triangulate(T0, T1, uv0, uv1)
        assert bool(good.all())
        np.testing.assert_allclose(np.asarray(est), np.asarray(pw), atol=1e-2)


class TestPyramidMatmul:
    def test_matches_separable_reference(self):
        """blur_downsample2's banded-matmul form is exactly the 5-tap
        separable Gaussian + 2x decimation it replaces (the matmuls are
        the MXU-native spelling; ops/image.py _pyr_mats)."""
        import numpy as np

        from lvio_fusion_tpu.ops.image import (
            blur_downsample2, downsample2, gaussian_blur5,
        )
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 1, (64, 96)).astype(np.float32))
        ref = downsample2(gaussian_blur5(img))
        got = blur_downsample2(img)
        assert ref.shape == got.shape
        assert float(jnp.abs(ref - got).max()) < 1e-6
