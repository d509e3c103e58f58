"""Synthetic stereo(-inertial) sequence generator for tests and benches.

Renders a moving stereo rig through a field of gaussian-blob landmarks
(blob centers are trackable, triangulable 3-D points). Ground-truth poses
follow a smooth arc. Also synthesizes consistent IMU samples (specific
force + angular rate) for the VIO stages. Stands in for KITTI/KAIST when
no dataset is mounted; the KITTI reader (datasets/kitti.py) produces the
same Sequence interface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry.se3 import (
    se3_apply, se3_exp, se3_identity, se3_inv, se3_make, se3_mul,
)
from lvio_fusion_tpu.geometry.so3 import quat_rotate
from lvio_fusion_tpu.models.camera import Camera


@dataclass
class StereoFrame:
    time: float
    left: np.ndarray
    right: np.ndarray


@dataclass
class Sequence:
    frames: List[StereoFrame]
    gt_times: np.ndarray
    gt_poses: np.ndarray  # (N, 7)
    cam_left: Camera
    cam_right: Camera
    imu_times: Optional[np.ndarray] = None
    imu_acc: Optional[np.ndarray] = None
    imu_gyr: Optional[np.ndarray] = None


def _render(px, valid, H, W, brightness, sigma=1.3, rad=4):
    """Splat gaussian blobs at pixel locations (vectorized scatter-add)."""
    n = px.shape[0]
    oy, ox = jnp.mgrid[-rad:rad + 1, -rad:rad + 1]
    cx = jnp.round(px[:, 0]).astype(jnp.int32)
    cy = jnp.round(px[:, 1]).astype(jnp.int32)
    xs = cx[:, None, None] + ox[None]
    ys = cy[:, None, None] + oy[None]
    dx = xs.astype(jnp.float32) - px[:, 0, None, None]
    dy = ys.astype(jnp.float32) - px[:, 1, None, None]
    vals = brightness[:, None, None] * jnp.exp(
        -(dx * dx + dy * dy) / (2 * sigma * sigma))
    vals = vals * valid[:, None, None]
    inb = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    vals = jnp.where(inb, vals, 0.0)
    xs = jnp.clip(xs, 0, W - 1)
    ys = jnp.clip(ys, 0, H - 1)
    img = jnp.zeros((H, W), jnp.float32)
    return img.at[ys, xs].add(vals)


def make_sequence(num_frames=40, H=240, W=360, num_points=400, fps=10.0,
                  speed=1.2, yaw_rate=0.02, seed=0, with_imu=False,
                  imu_rate=200.0, g_norm=9.81007) -> Sequence:
    rng = np.random.default_rng(seed)
    fx = fy = 0.9 * W
    cx, cy = W / 2.0, H / 2.0
    baseline = 0.5
    cam_left = Camera.create(fx, fy, cx, cy, se3_identity())
    cam_right = Camera.create(
        fx, fy, cx, cy,
        se3_make(jnp.array([1.0, 0, 0, 0]), jnp.array([baseline, 0.0, 0.0])))

    # trajectory: forward z, slight arc + bob
    dt = 1.0 / fps
    poses = [se3_identity()]
    for _ in range(num_frames - 1):
        step = se3_exp(jnp.asarray(
            [0.0, yaw_rate * dt, 0.0, 0.0, 0.0, speed * dt],
            dtype=jnp.float32))
        poses.append(se3_mul(poses[-1], step))
    poses = jnp.stack(poses)
    times = np.arange(num_frames) * dt

    # landmark field distributed along the corridor
    total_len = speed * num_frames * dt
    pw = np.stack([
        rng.uniform(-8, 8 + baseline, num_points),
        rng.uniform(-5, 5, num_points),
        rng.uniform(2.0, total_len + 25.0, num_points),
    ], axis=1).astype(np.float32)
    brightness = rng.uniform(0.6, 1.0, num_points).astype(np.float32)

    pwj = jnp.asarray(pw)
    bj = jnp.asarray(brightness)

    @jax.jit
    def render_pair(pose):
        def one(cam):
            pc = jax.vmap(lambda p: cam.world2sensor(p, pose))(pwj)
            px = jax.vmap(cam.sensor2pixel)(pc)
            valid = (pc[:, 2] > 0.8).astype(jnp.float32)
            return _render(px, valid, H, W, bj)
        return one(cam_left), one(cam_right)

    frames = []
    for i in range(num_frames):
        l, r = render_pair(poses[i])
        frames.append(StereoFrame(float(times[i]), np.asarray(l),
                                  np.asarray(r)))

    imu_times = imu_acc = imu_gyr = None
    if with_imu:
        # constant body twist per frame-step => exact closed-form IMU:
        # omega_b = phi/dt, v_b = V(phi) rho/dt (body-frame velocity of the
        # screw), world accel a_w = R [omega]x v_w_b. The sequence's world
        # frame is the first CAMERA frame (z forward, y down), so gravity
        # acceleration is +g_norm * y_world; the VI initializer must find
        # that tilt (nothing is gravity-aligned here by construction).
        twist = np.array([0.0, yaw_rate * dt, 0.0, 0.0, 0.0, speed * dt],
                         np.float32)
        omega_b = twist[:3] / dt
        # body-frame velocity: from T(t)=T0 exp(t xi), dp/dt at body = V rho
        # for small yaw_rate V ~ I; compute numerically instead for safety
        g_w = np.array([0.0, g_norm, 0.0], np.float32)  # 'down' = +y

        n_sub = max(1, int(round(imu_rate * dt)))
        imu_times_l, acc_l, gyr_l = [], [], []
        posesd = np.asarray(poses, np.float64)
        # dense pose sampling via fractional twist exponentials
        from lvio_fusion_tpu.geometry.se3 import se3_exp as _se3_exp
        h = dt / n_sub
        for i in range(num_frames - 1):
            for k in range(n_sub):
                t_abs = times[i] + k * h
                frac = k / n_sub
                T = np.asarray(se3_mul(poses[i], _se3_exp(
                    jnp.asarray(twist * frac, jnp.float32))))
                q = T[:4]
                # world velocity: R(t) v_b ; v_b from twist rate
                # numerical: v_w = (p(t+e)-p(t-e))/2e
                e = 1e-3
                Tp = np.asarray(se3_mul(poses[i], _se3_exp(
                    jnp.asarray(twist * (frac + e / dt), jnp.float32))))
                Tm = np.asarray(se3_mul(poses[i], _se3_exp(
                    jnp.asarray(twist * (frac - e / dt), jnp.float32))))
                v_w = (Tp[4:] - Tm[4:]) / (2 * e)
                a_w = np.asarray(quat_rotate(jnp.asarray(q), jnp.asarray(
                    np.cross(omega_b, np.asarray(
                        quat_rotate(jnp.asarray([q[0], -q[1], -q[2], -q[3]]),
                                    jnp.asarray(v_w, jnp.float32)))))))
                f_b = np.asarray(quat_rotate(
                    jnp.asarray([q[0], -q[1], -q[2], -q[3]]),
                    jnp.asarray(a_w - g_w, jnp.float32)))
                imu_times_l.append(t_abs)
                acc_l.append(f_b)
                gyr_l.append(omega_b.copy())
        imu_times = np.asarray(imu_times_l)
        imu_acc = np.asarray(acc_l, np.float32)
        imu_gyr = np.asarray(gyr_l, np.float32)

    return Sequence(frames=frames, gt_times=times,
                    gt_poses=np.asarray(poses),
                    cam_left=cam_left, cam_right=cam_right,
                    imu_times=imu_times, imu_acc=imu_acc, imu_gyr=imu_gyr)
