"""Undistortion remap: distorted projections of world points must land on
ideal pinhole pixels after remapping."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry.se3 import se3_identity
from lvio_fusion_tpu.models.camera import Camera
from lvio_fusion_tpu.ops.image import (
    bilinear_sample, make_undistort_map, undistort_image,
)


def test_undistort_map_inverts_distortion():
    cam = Camera.create(300.0, 300.0, 160.0, 120.0, se3_identity(),
                        k1=-0.2, k2=0.03, p1=0.001, p2=-0.001)
    H, W = 240, 320
    umap = make_undistort_map(cam, H, W)

    # undistorted pixel u samples raw at umap[u]; verify: for ideal pixel
    # coordinates of a 3D point, umap gives the distorted observation
    rng = np.random.default_rng(0)
    pw = np.stack([rng.uniform(-1, 1, 20), rng.uniform(-0.7, 0.7, 20),
                   np.ones(20) * 3.0], 1).astype(np.float32)
    ideal = np.asarray(jax.vmap(
        lambda p: cam.sensor2pixel(jnp.asarray(p)))(jnp.asarray(pw)))
    norm = (pw[:, :2] / pw[:, 2:3])
    distorted = np.asarray(cam.distort(jnp.asarray(norm))) \
        * np.array([300.0, 300.0]) + np.array([160.0, 120.0])

    inb = ((ideal[:, 0] > 5) & (ideal[:, 0] < W - 5)
           & (ideal[:, 1] > 5) & (ideal[:, 1] < H - 5))
    sampled = np.asarray(bilinear_sample(
        jnp.asarray(umap[..., 0]), jnp.asarray(ideal[inb])))
    np.testing.assert_allclose(sampled, distorted[inb, 0], atol=0.05)


def test_undistort_image_identity_when_no_distortion():
    cam = Camera.create(300.0, 300.0, 160.0, 120.0, se3_identity())
    H, W = 60, 80
    umap = make_undistort_map(cam, H, W)
    img = jnp.asarray(np.random.default_rng(1).uniform(
        0, 255, (H, W)).astype(np.float32))
    out = undistort_image(img, umap)
    # f32 (px-c)/f*f+c roundtrip jitters coords by ~1e-5 px; on a noise
    # image the bilinear mix moves values by up to ~0.3/255
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=0.5)
