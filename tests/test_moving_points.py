"""Moving-point rejection (frontend.cpp:195-230): a tracked feature whose
position disagrees with its landmark's predicted projection (a point on a
moving object) must be dropped; consistent static features survive."""

import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.core.frontend import make_frontend
from lvio_fusion_tpu.models.camera import Camera

H, W = 240, 320


def _textured_image(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (H, W)).astype(np.float32)
    # smooth so LK has gradients it can follow
    k = np.ones(5) / 5
    for ax in (0, 1):
        img = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), ax, img)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_moving_point_rejected_static_kept():
    ident = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
    right_ext = np.array([1, 0, 0, 0, 0.5, 0, 0], np.float32)
    cam_l = Camera.create(200.0, 200.0, W / 2, H / 2, ident)
    cam_r = Camera.create(200.0, 200.0, W / 2, H / 2, right_ext)
    N = 16
    fns = make_frontend(cam_l, cam_r, H, W, N)

    img = _textured_image()
    pyr = fns.preprocess(jnp.asarray(img))

    # features on a grid; landmark worlds consistent with their pixels at
    # depth 10 m under the identity pose — except feature 0, whose cached
    # world projects 45 px away (a point that moved since the last frame)
    xs = np.linspace(60, W - 60, 4)
    ys = np.linspace(60, H - 60, 4)
    px = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2).astype(np.float32)
    valid = np.ones(N, bool)
    lm_world = np.asarray(
        [np.asarray(cam_l.pixel2world(jnp.asarray(p), jnp.asarray(ident),
                                      10.0)) for p in px], np.float32)
    bad_px = px[0] + np.array([45.0, 0.0], np.float32)
    lm_world[0] = np.asarray(cam_l.pixel2world(
        jnp.asarray(bad_px), jnp.asarray(ident), 10.0))

    r = fns.track_frame(pyr, pyr, jnp.asarray(px), jnp.asarray(valid),
                        jnp.asarray(lm_world), jnp.asarray(ident))
    ok = np.asarray(r.ok)
    assert not ok[0], "deviant (moving) feature must be rejected"
    assert ok[1:].sum() >= 12, f"static features over-rejected: {ok}"
