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

from functools import partial

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
    scan_times: Optional[np.ndarray] = None
    scans: Optional[List[np.ndarray]] = None   # lidar-frame points per scan
    lidar_extrinsic: Optional[np.ndarray] = None  # SE3 lidar->robot


# lidar (x fwd, y left, z up) -> camera/robot (x right, y down, z fwd)
LIDAR_TO_CAM = np.array([[0.0, -1.0, 0.0],
                         [0.0, 0.0, -1.0],
                         [1.0, 0.0, 0.0]])


def raycast_scene(origin_w, dirs_w, ground_y, boxes):
    """Vectorized ray casting against a ground plane (y = ground_y, +y is
    'down' in the camera world) and axis-aligned boxes.

    dirs_w: (N, 3) unit rays in world frame. Returns (t (N,), hit (N,))."""
    N = dirs_w.shape[0]
    t_best = np.full(N, np.inf)
    # ground plane
    dy = dirs_w[:, 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t_g = (ground_y - origin_w[1]) / dy
    ok = (dy > 1e-6) & (t_g > 0.5) & (t_g < 60.0)
    t_best = np.where(ok, np.minimum(t_best, t_g), t_best)
    # boxes: (cx, cz, half, height): vertical sides at x,z; top at
    # y = ground_y - height
    for (bx, bz, half, hgt) in boxes:
        lo = np.array([bx - half, ground_y - hgt, bz - half])
        hi = np.array([bx + half, ground_y, bz + half])
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (lo - origin_w) / dirs_w
            t2 = (hi - origin_w) / dirs_w
        tmin = np.minimum(t1, t2).max(1)
        tmax = np.maximum(t1, t2).min(1)
        hit = (tmax > tmin) & (tmin > 0.3)
        t_best = np.where(hit, np.minimum(t_best, tmin), t_best)
    return t_best, np.isfinite(t_best)


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


@partial(jax.jit, static_argnames=("H", "W"))
def _render_all(cam_left, cam_right, poses, pwj, bj, H, W):
    """Render the WHOLE stereo sequence in one program: (F, H, W) x 2.

    Module-level so the trace is shared across make_sequence calls (a
    per-call @jax.jit closure re-traced every time; utils/memo.py
    rationale) and one dispatch replaces F of them."""
    def pair(pose):
        def one(cam):
            pc = jax.vmap(lambda p: cam.world2sensor(p, pose))(pwj)
            px = jax.vmap(cam.sensor2pixel)(pc)
            valid = (pc[:, 2] > 0.8).astype(jnp.float32)
            return _render(px, valid, H, W, bj)
        return one(cam_left), one(cam_right)
    return jax.vmap(pair)(poses)


_SEQ_CACHE = {}


def make_sequence(*args, **kwargs) -> Sequence:
    """Synthetic stereo(/imu/lidar) sequence; see ``_make_sequence_impl``
    for the knobs. All rendering runs pinned to the host CPU backend:
    the sequence is host data, and fetching hundreds of MB of rendered
    frames from a tunneled TPU both wastes its wire and permanently
    degrades the relay's dispatch latency (any device->host fetch of a
    computed result switches it into a ~ms-per-call slow mode — the
    pipeline should enter that mode on its own terms, not during data
    generation).

    Memoized per (args, kwargs): the generator is deterministic, several
    test/bench entry points ask for the identical sequence, and a render
    costs ~7 s of the single host core. Treat the result as read-only."""
    key = (args, tuple(sorted(kwargs.items())))
    try:
        if key in _SEQ_CACHE:
            return _SEQ_CACHE[key]
        cacheable = True
    except TypeError:  # unhashable custom arg
        cacheable = False
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        seq = _make_sequence_impl(*args, **kwargs)
    # cameras leave as uncommitted numpy-leaved structs so downstream
    # TPU programs are free to place them
    seq.cam_left = jax.device_get(seq.cam_left)
    seq.cam_right = jax.device_get(seq.cam_right)
    if seq.lidar_extrinsic is not None:
        seq.lidar_extrinsic = np.asarray(seq.lidar_extrinsic)
    if cacheable:
        _SEQ_CACHE[key] = seq
    return seq


def _make_sequence_impl(num_frames=40, H=240, W=360, num_points=400,
                        fps=10.0,
                  speed=1.2, yaw_rate=0.02, seed=0, with_imu=False,
                  imu_rate=200.0, g_norm=9.81007, with_lidar=False,
                  lidar_rows=16, lidar_cols=360, ground_y=1.8,
                  closed_loop=False, loop_turns=1.0, exposure_drift=0.0,
                  pixel_noise=0.0, num_occluders=0, fx=None, cx=None,
                  cy=None, baseline=0.5, lidar_noise=0.0,
                  lidar_dropout=0.0, lidar_range_scale=1.0,
                  lidar_scale_drift=0.0) -> Sequence:
    """``closed_loop=True`` sets yaw_rate so the constant-twist trajectory
    traces ``loop_turns`` revolutions of a circle (revisiting covered
    ground — loop-closure testable; use >1 turn so revisits happen while
    the stream is still running); the landmark/lidar layout follows the
    ring. Hostile-imaging knobs
    (all off by default): ``exposure_drift`` — sinusoidal per-frame gain in
    [1-d, 1+d]; ``pixel_noise`` — additive Gaussian image noise (in [0,1]
    units); ``num_occluders`` — moving dark rectangles pasted per frame.
    """
    rng = np.random.default_rng(seed)
    # default intrinsics scale with the frame; callers can pin the exact
    # calibration of a real rig (e.g. KITTI fx=718.856, baseline=0.5372)
    fx = fy = (0.9 * W if fx is None else float(fx))
    cx = W / 2.0 if cx is None else float(cx)
    cy = H / 2.0 if cy is None else float(cy)
    cam_left = Camera.create(fx, fy, cx, cy, se3_identity())
    cam_right = Camera.create(
        fx, fy, cx, cy,
        se3_make(jnp.array([1.0, 0, 0, 0]), jnp.array([baseline, 0.0, 0.0])))

    # trajectory: forward z, slight arc + bob; closed_loop drives a full
    # circle back to the start (constant twist => all IMU/lidar closed
    # forms below remain exact)
    dt = 1.0 / fps
    if closed_loop:
        yaw_rate = (2.0 * np.pi * loop_turns / (num_frames * dt)
                    * (1.0 + 2.0 / num_frames))
    poses = [se3_identity()]
    for _ in range(num_frames - 1):
        step = se3_exp(jnp.asarray(
            [0.0, yaw_rate * dt, 0.0, 0.0, 0.0, speed * dt],
            dtype=jnp.float32))
        poses.append(se3_mul(poses[-1], step))
    poses = jnp.stack(poses)
    times = np.arange(num_frames) * dt

    # landmark field distributed along the path
    total_len = speed * num_frames * dt
    if closed_loop:
        # landmarks sampled in the forward frustums of the ACTUAL
        # trajectory poses (same guarantee the straight corridor field
        # gives: every frame has trackable points ahead of it)
        posesd = np.asarray(poses)
        anchors = rng.integers(0, num_frames, num_points)
        local = np.stack([
            rng.uniform(-8, 8 + baseline, num_points),
            rng.uniform(-5, 5, num_points),
            rng.uniform(3.0, 22.0, num_points),  # ahead along the tangent
        ], axis=1).astype(np.float32)
        pw = np.asarray(jax.vmap(se3_apply)(
            jnp.asarray(posesd[anchors]),
            jnp.asarray(local))).astype(np.float32)
    else:
        pw = np.stack([
            rng.uniform(-8, 8 + baseline, num_points),
            rng.uniform(-5, 5, num_points),
            rng.uniform(2.0, total_len + 25.0, num_points),
        ], axis=1).astype(np.float32)
    brightness = rng.uniform(0.6, 1.0, num_points).astype(np.float32)

    pwj = jnp.asarray(pw)
    bj = jnp.asarray(brightness)

    def hostile(img, i):
        """Exposure drift + sensor noise + moving occluders (in-place on
        the [0,1]-float render)."""
        if exposure_drift:
            gain = 1.0 + exposure_drift * np.sin(
                2 * np.pi * i / max(num_frames / 3.0, 1.0))
            img = img * gain
        if num_occluders:
            occ_rng = np.random.default_rng(seed * 7919 + i)
            for _ in range(num_occluders):
                h = occ_rng.integers(H // 10, H // 4)
                w = occ_rng.integers(W // 10, W // 4)
                y0 = occ_rng.integers(0, H - h)
                x0 = occ_rng.integers(0, W - w)
                img[y0:y0 + h, x0:x0 + w] = float(occ_rng.uniform(0, 0.15))
        if pixel_noise:
            noise_rng = np.random.default_rng(seed * 104729 + i)
            img = img + noise_rng.normal(0, pixel_noise, img.shape)
        return np.clip(img, 0.0, 1.5).astype(np.float32)

    corrupt = exposure_drift or pixel_noise or num_occluders
    left_all, right_all = _render_all(cam_left, cam_right, poses,
                                      pwj, bj, H, W)
    left_all, right_all = np.asarray(left_all), np.asarray(right_all)
    frames = []
    for i in range(num_frames):
        l, r = left_all[i], right_all[i]
        if corrupt:
            l, r = hostile(l.copy(), i), hostile(r.copy(), i)
        frames.append(StereoFrame(float(times[i]), l, r))

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
        # dense pose sampling via fractional twist exponentials — fully
        # batched (the per-sample loop was thousands of eager dispatches)
        from lvio_fusion_tpu.geometry.se3 import se3_exp as _se3_exp
        h = dt / n_sub
        e = 1e-3
        I = num_frames - 1
        fr = np.arange(n_sub) / n_sub
        twd = np.asarray(twist, np.float64)
        base = poses[:-1]

        def _poses_at(fracs):
            steps = jax.vmap(_se3_exp)(jnp.asarray(
                (twd[None, :] * fracs[:, None]).astype(np.float32)))
            return np.asarray(jax.vmap(lambda T0: jax.vmap(
                lambda S: se3_mul(T0, S))(steps))(base))   # (I, K, 7)

        T = _poses_at(fr)
        Tp = _poses_at(fr + e / dt)
        Tm = _poses_at(fr - e / dt)
        # world velocity: numerical derivative of the translation
        v_w = (Tp[..., 4:] - Tm[..., 4:]) / (2 * e)
        q = T[..., :4]
        qc = q * np.array([1.0, -1.0, -1.0, -1.0], np.float32)

        def _rot(Q, V):
            return np.asarray(jax.vmap(jax.vmap(quat_rotate))(
                jnp.asarray(Q), jnp.asarray(V, jnp.float32)))

        v_b = _rot(qc, v_w)
        a_w = _rot(q, np.cross(np.broadcast_to(omega_b, v_b.shape), v_b))
        f_b = _rot(qc, a_w - g_w)
        imu_times = (times[:I, None] + fr[None, :] * dt).reshape(-1)
        imu_acc = f_b.reshape(-1, 3).astype(np.float32)
        imu_gyr = np.broadcast_to(
            omega_b, (I * n_sub, 3)).copy().astype(np.float32)

    scan_times = scans = lidar_ext = None
    if with_lidar:
        # world layout: ground plane at y=+ground_y (camera y is 'down'),
        # boxes along the corridor the rig drives through
        total_len = speed * num_frames * dt
        boxes = []
        if closed_loop:
            # boxes on both sides of the circular path
            pos = np.asarray(poses)[:, 4:]
            center = pos.mean(0)
            r = float(np.linalg.norm(pos - center, axis=1).mean())
            for k, th in enumerate(np.arange(0.0, 2 * np.pi, 0.5)):
                rad = r + (5.0 if k % 2 == 0 else -5.0)
                boxes.append((center[0] + rad * np.cos(th),
                              center[2] + rad * np.sin(th), 1.2, 2.5))
        else:
            zs = np.arange(4.0, total_len + 20.0, 6.0)
            for i, bz in enumerate(zs):
                bx = 5.0 if i % 2 == 0 else -5.0
                boxes.append((bx, bz, 1.2, 2.5))

        # lidar ray table in lidar frame (x fwd, z up)
        rows = np.arange(lidar_rows)
        cols = np.arange(lidar_cols)
        vert = np.radians(rows * 2.0 - 15.0)          # ang_res_y=2, bottom=15
        az = np.radians(90.0 - (cols - lidar_cols / 2) * (360.0 / lidar_cols))
        vv, aa = np.meshgrid(vert, az, indexing="ij")
        dirs_l = np.stack([np.cos(vv) * np.sin(aa),
                           np.cos(vv) * np.cos(aa),
                           np.sin(vv)], -1).reshape(-1, 3)

        from lvio_fusion_tpu.geometry.so3 import mat_to_quat
        q_lc = np.asarray(mat_to_quat(jnp.asarray(LIDAR_TO_CAM,
                                                  jnp.float32)))
        lidar_ext = np.concatenate([q_lc, np.zeros(3)]).astype(np.float32)

        scan_times = times.copy()
        scans = []
        for i in range(num_frames):
            T = np.asarray(poses[i])
            Rwb = np.asarray(jax.vmap(quat_rotate, (None, 0))(
                jnp.asarray(T[:4]), jnp.eye(3))).T
            Rwl = Rwb @ LIDAR_TO_CAM
            dirs_w = dirs_l @ Rwl.T
            origin = T[4:]
            t_hit, hit = raycast_scene(origin, dirs_w, ground_y, boxes)
            if lidar_range_scale != 1.0 or lidar_scale_drift:
                # SYSTEMATIC range miscalibration. A CONSTANT scale is
                # self-consistent (scan-to-map matches biased scans to a
                # map built from the same biased scans — measured e2e
                # neutral, misc/rl_degraded_probe.py v3); a time-VARYING
                # scale (thermal drift) makes each scan disagree with
                # the map built at other phases — the regime where
                # per-frame lidar weighting has end-to-end leverage
                s = lidar_range_scale
                if lidar_scale_drift:
                    s = s * (1.0 + lidar_scale_drift
                             * np.sin(2 * np.pi * i / 20.0))
                t_hit = t_hit * np.float32(s)
            if lidar_noise or lidar_dropout:
                # degraded-lidar regime (rain/dust/range jitter): additive
                # range noise in meters + random returns dropped — the
                # scene family where lidar factors mislead and adaptive
                # DOWN-weighting of lidar must help (paper regime B)
                nrng = np.random.default_rng(seed * 31337 + i)
                if lidar_noise:
                    t_hit = t_hit + nrng.normal(
                        0, lidar_noise, t_hit.shape).astype(t_hit.dtype)
                if lidar_dropout:
                    hit = hit & (nrng.uniform(size=hit.shape)
                                 >= lidar_dropout)
            d_hit = dirs_w[hit] * t_hit[hit][:, None]
            # world -> lidar (rotation only; lidar co-located with camera)
            p_l = d_hit @ Rwl
            scans.append(p_l.astype(np.float32))

    return Sequence(frames=frames, gt_times=times,
                    gt_poses=np.asarray(poses),
                    cam_left=cam_left, cam_right=cam_right,
                    imu_times=imu_times, imu_acc=imu_acc, imu_gyr=imu_gyr,
                    scan_times=scan_times, scans=scans,
                    lidar_extrinsic=lidar_ext)
