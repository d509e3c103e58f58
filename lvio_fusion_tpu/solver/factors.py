"""Typed factor residual functions for the batched LM solver.

Each factor is a pure per-factor function of *tangent increments* around the
current linearization point; the assembler (`solver/ba.py`) vmaps
`jax.jacfwd` through these to get exact block Jacobians — no hand-derived
Jacobians anywhere.

Math parity targets (independent implementations):
  * visual factors — reference ceres/visual_error.hpp:10-137
    (PoseOnly / TwoFrame / TwoCamera reprojection; inverse depth lives in the
    RIGHT camera of the landmark's first observation, landmark.cpp:15-19)
  * pose factors — reference ceres/pose_error.hpp (PoseGraphError: 6-dof
    relative rpyxyz residual with per-axis weights; PoseError/RError/TError)
  * navsat factors — reference ceres/navsat_error.hpp
  * imu factor — reference ceres/imu_error.hpp:12-122 (15-dim residual
    against preintegrated deltas, see solver/imu_factor.py)

Every factor carries a scalar weight multiplying the residual directly
(reference ceres/base.hpp:152-157) — this is what the RL agent modulates.
"""

from __future__ import annotations

import jax.numpy as jnp

from lvio_fusion_tpu.geometry.se3 import (
    se3_apply,
    se3_boxplus,
    se3_inv,
    se3_log,
    se3_mul,
    se3_to_rpyxyz,
)


def reproj_pose_only(xi_i, pose_i, pw, pixel, cam, weight):
    """Landmark world position frozen; only the observing pose varies.

    (visual_error.hpp:48-76 — used for landmarks older than the window.)
    """
    T_i = se3_boxplus(pose_i, xi_i)
    pred = cam.world2pixel(pw, T_i)
    return weight * (pred - pixel)


def reproj_two_frame(xi_i, xi_a, d_inv, pose_i, pose_a, inv_depth, first_ob,
                     pixel, cam_left, cam_right, weight):
    """Landmark = inverse depth along the anchor frame's RIGHT-camera ray,
    re-projected into the LEFT camera of the observing frame i.

    (visual_error.hpp:78-107.)
    """
    T_i = se3_boxplus(pose_i, xi_i)
    T_a = se3_boxplus(pose_a, xi_a)
    inv_d = inv_depth + d_inv
    pb = cam_right.pixel2robot(first_ob, 1.0 / inv_d)  # anchor robot frame
    pw = se3_apply(T_a, pb)
    pred = cam_left.world2pixel(pw, T_i)
    return weight * (pred - pixel)


def reproj_two_camera(d_inv, inv_depth, first_ob, left_ob, cam_left,
                      cam_right, weight):
    """Stereo constraint inside the anchor frame: right-ray point projected
    into the left camera. Touches only the inverse depth.

    (visual_error.hpp:109-137.)
    """
    inv_d = inv_depth + d_inv
    pb = cam_right.pixel2robot(first_ob, 1.0 / inv_d)
    pred = cam_left.robot2pixel(pb)
    return weight * (pred - left_ob)


def pose_prior(xi_i, pose_i, prior_pose, weight):
    """6-dof anchor of a pose to a prior value (reference PoseError).

    Residual in rpyxyz coordinates of the relative transform, matching the
    reference's rpyxyz parameterization (pose_error.hpp).
    """
    T_i = se3_boxplus(pose_i, xi_i)
    rel = se3_mul(se3_inv(prior_pose), T_i)
    return weight * se3_to_rpyxyz(rel)


def relative_pose(xi_i, xi_j, pose_i, pose_j, meas_rel, weight, axis_weights):
    """Relative-pose factor between frames i, j with measured T_i^{-1} T_j.

    Residual = rpyxyz(meas^{-1} * (T_i^{-1} T_j)) with per-axis weighting
    (reference PoseGraphError weights y/z translation x10,
    pose_error.hpp:10-53).
    """
    T_i = se3_boxplus(pose_i, xi_i)
    T_j = se3_boxplus(pose_j, xi_j)
    rel = se3_mul(se3_inv(T_i), T_j)
    err = se3_mul(se3_inv(meas_rel), rel)
    return weight * axis_weights * se3_to_rpyxyz(err)


def position_prior(xi_i, pose_i, target_p, weight):
    """3-dof position anchor (reference TError / navsat point residual)."""
    T_i = se3_boxplus(pose_i, xi_i)
    return weight * (T_i[4:] - target_p)


def rotation_prior(xi_i, pose_i, target_pose, weight):
    """3-dof rotation anchor (reference RError, pose_error.hpp)."""
    T_i = se3_boxplus(pose_i, xi_i)
    rel_q = se3_mul(se3_inv(target_pose), T_i)[:4]
    from lvio_fusion_tpu.geometry.so3 import log_so3
    return weight * log_so3(rel_q)


def lidar_plane(xi_i, pose_i, point_body, plane_pt, plane_normal, weight,
                dof_mask):
    """Point-to-plane residual: body-frame feature point transformed by the
    (possibly DoF-restricted) pose must lie on the local map plane.

    The reference splits this over scalar rpyxyz DoF subsets
    (LidarPlaneErrorRPZ: pitch/roll/z; LidarPlaneErrorYXY: yaw/x/y —
    lidar_error.hpp:42-110). We express the same restriction with a 6-dim
    ``dof_mask`` over the rpyxyz tangent: masked dims take no update.
    """
    xi = xi_i * dof_mask
    T_i = se3_boxplus(pose_i, xi)
    pw = se3_apply(T_i, point_body)
    return weight * jnp.sum((pw - plane_pt) * plane_normal, axis=-1, keepdims=True)


def huber_scale(r, delta):
    """Triggs-style robust reweighting: scale factor for residual & Jacobian
    implementing a Huber loss of parameter ``delta``."""
    s = jnp.sqrt(jnp.sum(r * r, axis=-1, keepdims=True) + 1e-12)
    return jnp.sqrt(jnp.minimum(1.0, delta / s))
