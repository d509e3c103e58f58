"""Fused on-device undistortion (frontend._pyramid, cfg.undistort): a
stereo sequence observed through a distorting lens must track to the
same trajectory the undistorted sequence gives — with zero standalone
undistortion dispatches (the old path cost 2 round trips + 2 image
downloads per frame)."""

import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.models.camera import Camera
from lvio_fusion_tpu.ops.image import bilinear_sample

K1, K2 = -0.15, 0.02


def _distort_image(img_u8, cam_d):
    """Render what a distorting lens sees: the distorted image at pixel v
    shows the ideal (pinhole) image at u = undistort(v), so undistorting
    the result recovers the ideal image. ``undistort_points`` maps
    distorted PIXELS to ideal PIXELS (iterative inversion)."""
    img = np.asarray(img_u8)
    if img.dtype != np.uint8:  # synthetic frames are float ~[0, 1]
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    H, W = img.shape
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    grid_px = np.stack([xx, yy], -1).reshape(-1, 2)
    und_px = np.asarray(cam_d.undistort_points(jnp.asarray(grid_px),
                                               iters=8))
    out = np.asarray(bilinear_sample(jnp.asarray(img, jnp.float32),
                                     jnp.asarray(und_px.reshape(H, W, 2))))
    return np.clip(out, 0, 255).astype(np.uint8)


def _cfg(undistort):
    return EstimatorConfig(
        height=120, width=160, num_features=60, num_features_init=20,
        num_features_tracking_bad=8, num_features_needed_for_keyframe=30,
        window_kfs=4, landmark_slots=96, obs_slots=256, po_slots=128,
        ba_iters=3, cell=20, occupy_radius=8, frame_batch=2,
        undistort=undistort)


def test_distorted_sequence_tracks_through_fused_undistortion():
    seq = make_sequence(num_frames=10, H=120, W=160, num_points=200,
                        seed=4)

    # reference: ideal images, ideal cameras
    est = Estimator(seq.cam_left, seq.cam_right, _cfg(False))
    for fr in seq.frames:
        est.input_image(fr.time, fr.left, fr.right)
    est.finalize()
    t_ref, p_ref = est.trajectory()

    # distorting lens: same intrinsics/extrinsics plus k1/k2
    def with_dist(cam):
        return Camera.create(float(cam.fx), float(cam.fy), float(cam.cx),
                             float(cam.cy), cam.extrinsic, k1=K1, k2=K2)

    cam_l = with_dist(seq.cam_left)
    cam_r = with_dist(seq.cam_right)
    est_d = Estimator(cam_l, cam_r, _cfg(True))
    for fr in seq.frames:
        est_d.input_image(fr.time, _distort_image(fr.left, cam_l),
                          _distort_image(fr.right, cam_r))
    est_d.finalize()
    t_d, p_d = est_d.trajectory()

    assert len(t_d) == len(t_ref), (len(t_d), len(t_ref))
    # resampling blur costs some accuracy; the trajectory must still
    # match the ideal run to sub-decimeter on this ~5 m path
    err = np.linalg.norm(p_d[:, 4:] - p_ref[:, 4:], axis=1)
    assert np.max(err) < 0.1, f"trajectory diverged: {err}"


def test_undistort_off_is_unchanged():
    # guard: the refactor must not touch the undistort=False path
    seq = make_sequence(num_frames=6, H=120, W=160, num_points=200, seed=4)
    est = Estimator(seq.cam_left, seq.cam_right, _cfg(False))
    for fr in seq.frames:
        est.input_image(fr.time, fr.left, fr.right)
    est.finalize()
    t, p = est.trajectory()
    assert np.all(np.isfinite(p)) and len(t) >= 2
