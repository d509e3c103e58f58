"""Forward multi-keyframe update after global corrections.

Backend::UpdateFrontend (reference backend.cpp:248-293) re-optimizes the
keyframes forward of a corrected region with a 1-iteration solve — a
rigid shift alone leaves them linearized against pre-correction
geometry. Here:

  * `reworld_landmarks` must rebuild the cached landmark worlds exactly
    from anchor pose + right-cam pixel + inverse depth after anchors
    move (the reference recomputes on access, visual/landmark.cpp).
  * `Estimator._update_forward_keyframes` must pull rigid-only tail
    keyframes measurably closer to the ground truth than the rigid
    treatment left them.
"""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.core.estimator import Estimator
from lvio_fusion_tpu.core.hostmap import HostMap, reworld_landmarks
from lvio_fusion_tpu.models.camera import Camera
from lvio_fusion_tpu.utils import np_se3


def _quat(rotvec):
    from scipy.spatial.transform import Rotation
    return Rotation.from_rotvec(rotvec).as_quat(scalar_first=True)


def _pose(rotvec, t):
    return np.concatenate([_quat(rotvec), t]).astype(np.float32)


def _project(cam_ext, fx, fy, cx, cy, T, pw):
    """world -> pixel through the camera at robot pose T (f64)."""
    Tcw = np_se3.se3_mul(np_se3.se3_inv(np.asarray(cam_ext, np.float64)),
                         np_se3.se3_inv(np.asarray(T, np.float64)))
    pc = np_se3.se3_apply_batch(Tcw, np.asarray(pw, np.float64))
    return (np.stack([pc[:, 0] / pc[:, 2] * fx + cx,
                      pc[:, 1] / pc[:, 2] * fy + cy], -1), pc[:, 2])


def _make_world(rng, n_kfs=12, n_anchor_kfs=6, lms_per_kf=24):
    fx, fy, cx, cy = 320.0, 320.0, 320.0, 240.0
    ext_l = _pose(np.zeros(3), np.array([0.0, 0.05, 0.1]))
    ext_r = _pose(np.zeros(3), np.array([0.54, 0.05, 0.1]))
    cam_l = Camera.create(fx, fy, cx, cy, jnp.asarray(ext_l))
    cam_r = Camera.create(fx, fy, cx, cy, jnp.asarray(ext_r))

    # ground-truth keyframe poses: forward motion + gentle yaw
    gt = [_pose(np.array([0, 0.02 * k, 0.0]),
                np.array([1.1 * k, 0.05 * k, 0.0])) for k in range(n_kfs)]

    m = HostMap()
    for k in range(n_kfs):
        m.add_keyframe(float(k), gt[k])

    # landmarks anchored at the first n_anchor_kfs keyframes, placed in
    # front of the anchor's right camera
    for k in range(n_anchor_kfs):
        body = np.stack([rng.uniform(-3, 3, lms_per_kf),
                         rng.uniform(-2, 2, lms_per_kf),
                         rng.uniform(6, 18, lms_per_kf)], -1)
        pw = np_se3.se3_apply_batch(
            np_se3.se3_mul(np.asarray(gt[k], np.float64),
                           np.asarray(ext_r, np.float64)), body)
        first_ob, depth = _project(ext_r, fx, fy, cx, cy, gt[k], pw)
        m.add_landmarks(k, first_ob, first_ob, 1.0 / depth, pw)

    # tail keyframes observe a mix of landmarks from every anchor
    lm_ids = np.arange(m.num_landmarks)
    for k in range(n_anchor_kfs, n_kfs):
        obs = rng.choice(lm_ids, size=48, replace=False)
        pw = np.stack([m.lm_world[i] for i in obs])
        px, _ = _project(ext_l, fx, fy, cx, cy, gt[k], pw)
        m.add_observations(k, obs, px)
    return m, gt, cam_l, cam_r


def test_reworld_landmarks_rebuilds_exact_worlds():
    rng = np.random.default_rng(3)
    m, gt, cam_l, cam_r = _make_world(rng)
    truth = np.stack(m.lm_world).copy()

    # corrupt every cached world, then refresh from (unchanged) anchors
    for i in range(m.num_landmarks):
        m.lm_world[i] = m.lm_world[i] + rng.normal(0, 5, 3).astype(np.float32)
    n = reworld_landmarks(m, cam_r, np.ones(m.num_kfs, bool))
    assert n == m.num_landmarks
    np.testing.assert_allclose(np.stack(m.lm_world), truth, atol=2e-3)

    # masked refresh touches only landmarks anchored at flagged kfs
    for i in range(m.num_landmarks):
        m.lm_world[i] = m.lm_world[i] + np.float32(1.0)
    mask = np.zeros(m.num_kfs, bool)
    mask[0] = True
    n0 = int((np.asarray(m.lm_anchor) == 0).sum())
    assert reworld_landmarks(m, cam_r, mask) == n0


def test_forward_resolve_beats_rigid_only():
    rng = np.random.default_rng(11)
    m, gt, cam_l, cam_r = _make_world(rng)
    n_kfs, n_anchor = 12, 6

    # simulate a loop correction: before it, the whole map had drifted by
    # a rigid transform D; the correction restored kfs [0, n_anchor) to
    # truth and gave the tail ONLY the rigid shift — leaving per-kf
    # residual drift the rigid treatment cannot remove
    poses0 = m.poses_array().copy()
    poses0[:n_anchor] = [np_se3.se3_mul(
        _pose(np.array([0, 0, 0.01]), np.array([0.3, -0.2, 0.1])),
        p).astype(np.float32) for p in poses0[:n_anchor]]
    # stale world caches from the drifted anchors
    for i in range(m.num_landmarks):
        m.lm_world[i] = m.lm_world[i] + rng.normal(0, 0.15, 3).astype(
            np.float32)
    # tail poses carry leftover non-rigid drift (grows along the tail)
    for k in range(n_anchor, n_kfs):
        s = (k - n_anchor + 1) / (n_kfs - n_anchor)
        err = _pose(rng.normal(0, 0.004, 3) * s,
                    rng.normal(0, 0.08, 3) * s)
        m.kf_pose[k] = np_se3.se3_mul(err, m.kf_pose[k]).astype(np.float32)

    before = np.array([np.linalg.norm(m.kf_pose[k][4:] - gt[k][4:])
                       for k in range(n_anchor, n_kfs)])

    est = SimpleNamespace(map=m, cam_left=cam_l, cam_right=cam_r,
                          cfg=SimpleNamespace(forward_resolve=True,
                                              visual_weight=1.0))
    Estimator._update_forward_keyframes(est, poses0, n_anchor)

    after = np.array([np.linalg.norm(m.kf_pose[k][4:] - gt[k][4:])
                      for k in range(n_anchor, n_kfs)])
    # the 1-iteration forward re-solve must measurably beat rigid-only
    assert after.sum() < 0.35 * before.sum(), (before, after)
    # and the stale world caches were refreshed back to the true worlds
    # (anchors sit at gt again after the simulated correction)
    first_anchor0 = np.asarray(m.lm_anchor) == 0
    pw0 = np.stack(m.lm_world)[first_anchor0]
    assert np.all(np.isfinite(pw0)) and pw0.std() > 0.1


def test_forward_resolve_noop_when_nothing_changed():
    rng = np.random.default_rng(5)
    m, gt, cam_l, cam_r = _make_world(rng)
    poses0 = m.poses_array().copy()
    worlds0 = np.stack(m.lm_world).copy()
    est = SimpleNamespace(map=m, cam_left=cam_l, cam_right=cam_r,
                          cfg=SimpleNamespace(forward_resolve=True,
                                              visual_weight=1.0))
    Estimator._update_forward_keyframes(est, poses0, 0)
    np.testing.assert_array_equal(m.poses_array(), poses0)
    np.testing.assert_array_equal(np.stack(m.lm_world), worlds0)
