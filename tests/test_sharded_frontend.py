"""Feature-parallel tracking (parallel/sharded_frontend.py) must match
the single-device in-program tracking step on the virtual 8-device CPU
mesh: same LK tracks, same pose, same inlier census (up to f32
reduction-order noise in the psum'd GN system)."""

import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.core.frontend import make_frontend
from lvio_fusion_tpu.geometry.se3 import se3_identity, se3_make
from lvio_fusion_tpu.models.camera import Camera
from lvio_fusion_tpu.parallel.mesh import make_mesh
from lvio_fusion_tpu.parallel.sharded_frontend import make_sharded_track


def _blob_image(H, W, centers, shift=(0.0, 0.0)):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.full((H, W), 40.0, np.float32)
    for cx, cy in centers:
        img += 140.0 * np.exp(-(((xx - cx - shift[0]) ** 2)
                               + ((yy - cy - shift[1]) ** 2)) / (2 * 2.5 ** 2))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_sharded_track_matches_single_device():
    H, W, N = 128, 256, 256
    rng = np.random.default_rng(0)
    centers = np.stack([rng.uniform(16, W - 16, N),
                        rng.uniform(16, H - 16, N)], 1).astype(np.float32)
    shift = (2.6, -1.8)
    img0 = _blob_image(H, W, centers)
    img1 = _blob_image(H, W, centers, shift)

    cam_l = Camera.create(200.0, 200.0, W / 2.0, H / 2.0, se3_identity())
    cam_r = Camera.create(
        200.0, 200.0, W / 2.0, H / 2.0,
        se3_make(jnp.array([1.0, 0, 0, 0]), jnp.array([0.5, 0.0, 0.0])))

    fns = make_frontend(cam_l, cam_r, H, W, N)
    pyr0 = fns.preprocess(jnp.asarray(img0))
    pyr1 = fns.preprocess(jnp.asarray(img1))

    # world landmarks whose projections at identity are the blob centers
    depth = rng.uniform(8.0, 25.0, N).astype(np.float32)
    import jax
    lm_world = np.asarray(jax.vmap(
        lambda px, d: cam_l.pixel2robot(px, d))(jnp.asarray(centers),
                                                jnp.asarray(depth)))
    feat_px = jnp.asarray(centers)
    feat_valid = jnp.asarray(np.arange(N) % 5 != 0)  # exercise masking
    pose_pred = se3_identity()

    r = fns.track_frame(pyr0, pyr1, feat_px, feat_valid,
                        jnp.asarray(lm_world), pose_pred)

    mesh = make_mesh(8)
    track = make_sharded_track(cam_l, cam_r, mesh)
    pts, inl, pose, n_inl = track(pyr0, pyr1, feat_px, feat_valid,
                                  jnp.asarray(lm_world), pose_pred)

    ok_both = np.asarray(r.ok) & np.asarray(inl)
    assert ok_both.sum() >= 0.6 * N, f"too few inliers: {ok_both.sum()}"
    np.testing.assert_allclose(np.asarray(pts)[ok_both],
                               np.asarray(r.pts)[ok_both],
                               atol=1e-3, rtol=0)
    # inlier census may flip on f32 reduction-order noise at the reject
    # threshold; require near-identity
    agree = (np.asarray(inl) == np.asarray(r.ok)).mean()
    assert agree > 0.98, f"inlier agreement {agree}"
    np.testing.assert_allclose(np.asarray(pose), np.asarray(r.pose),
                               atol=1e-4)
    assert abs(int(n_inl) - int(r.num_inliers)) <= 0.02 * N
