"""Visual frontend: jitted per-frame tracking + keyframe creation stages.

Functional equivalent of the reference Frontend state machine
(frontend.cpp:19-303): landmark-projection-seeded LK tracking from the last
frame, constant-velocity pose extrapolation, keyframe decision by inlier
count / elapsed time, and (at keyframes) masked re-detection + stereo
matching + triangulation into new inverse-depth landmarks
(local_map.cpp:73-269).

One deliberate upgrade over the reference: a per-frame pose-only
Gauss-Newton refine on the tracked landmarks (the reference builds the PnP
arrays but never solves them — frontend.cpp:183 'Solve PnP' is dead code;
poses there come only from extrapolation + backend BA). A 6x6 GN solve is
nearly free on TPU and tightens inter-keyframe odometry.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry.se3 import (
    se3_apply, se3_boxplus, se3_inv, se3_mul,
)
from lvio_fusion_tpu.ops.detect import detect_grid, occupancy_mask
from lvio_fusion_tpu.ops.image import build_pyramid, pad_to_multiple
from lvio_fusion_tpu.ops.lk import track_bidirectional
from lvio_fusion_tpu.ops.stereo import pixel_to_norm, triangulate
from lvio_fusion_tpu.utils.memo import builder_memo


class TrackResult(NamedTuple):
    pts: jnp.ndarray       # (N, 2) tracked pixel positions
    ok: jnp.ndarray        # (N,) bool inliers
    pose: jnp.ndarray      # (7,) refined pose
    num_inliers: jnp.ndarray  # scalar int32


class KeyframeResult(NamedTuple):
    new_px_left: jnp.ndarray   # (M, 2)
    new_px_right: jnp.ndarray  # (M, 2)
    inv_depth: jnp.ndarray     # (M,)
    world: jnp.ndarray         # (M, 3) initial world positions
    valid: jnp.ndarray         # (M,) bool


def unpack_keyframe_result(packed):
    """Host-side unpack of a packed (M, 29) keyframe result:
    [px_l(2) | px_r(2) | inv_d | world(3) | valid | pb_robot(3) |
     brief desc as uint16 halves (8 lo + 8 hi) | desc_ok]."""
    packed = np.asarray(packed)
    return KeyframeResult(
        new_px_left=packed[:, 0:2], new_px_right=packed[:, 2:4],
        inv_depth=packed[:, 4], world=packed[:, 5:8],
        valid=packed[:, 8] > 0.5)


def unpack_keyframe_desc(packed):
    """BRIEF descriptors of the new detections from a packed keyframe
    result: (desc (M, 8) uint32, ok (M,) bool)."""
    packed = np.asarray(packed)
    lo = packed[:, 12:20].astype(np.uint32)
    hi = packed[:, 20:28].astype(np.uint32)
    return lo | (hi << np.uint32(16)), packed[:, 28] > 0.5


def unpack_keyframe_robot(packed):
    """Robot-frame triangulated points (M, 3) (pose-independent; lets the
    host re-world detections under a corrected pose)."""
    return np.asarray(packed)[:, 9:12]


def unpack_track_result(packed, n_features: int):
    """Host-side unpack of frame_step's packed result (numpy)."""
    packed = np.asarray(packed)
    N = n_features
    pts = packed[:N * 2].reshape(N, 2)
    ok = packed[N * 2:N * 3] > 0.5
    pose = packed[N * 3:N * 3 + 7]
    n_inliers = int(packed[N * 3 + 7])
    return pts, ok, pose.astype(np.float32), n_inliers


class FrontendFns(NamedTuple):
    preprocess: object
    track_frame: object
    make_keyframe: object
    landmark_world: object
    frame_step: object     # fused: pyramid + track + refine (1 dispatch)
    keyframe_step: object  # fused: right pyramid + detect + triangulate
    frame_step_chained: object  # device-resident state chaining
    level0: object         # unpadded full-res level of a chained pyramid
    make_batch_kf_step: object  # B frames + speculative kf stage, 1 dispatch
    make_pipe_step: object  # device-autonomous B-frame step (lag-1 pipe)


def pose_only_refine(pose0, lm_world, obs_px, ok, cam, iters: int = 6,
                     huber_px: float = 3.0, reject_px: float = 8.0,
                     axis_name: str = None):
    """Small dense GN on the 6-dof pose from fixed world landmarks.

    With ``axis_name`` (inside a shard_map over the feature axis) the
    6x6 normal equations are psum-reduced across devices, so each shard
    contributes only its features and every device solves the identical
    replicated system (parallel/sharded_frontend.py).

    Solver matmuls run at full f32 multiply precision (TPU defaults to
    bf16 multiplies — see core/imu_init.py for the measured failure);
    the (N,6) jacobian work is negligible next to the LK stage."""
    with jax.default_matmul_precision("highest"):
        return _pose_only_refine_impl(pose0, lm_world, obs_px, ok, cam,
                                      iters, huber_px, reject_px,
                                      axis_name)


def _pose_only_refine_impl(pose0, lm_world, obs_px, ok, cam, iters,
                           huber_px, reject_px, axis_name):
    w = ok.astype(pose0.dtype)
    # sanitize masked rows: their world points may be garbage (0,0,0)
    safe = jnp.array([0.0, 0.0, 10.0], dtype=pose0.dtype)
    lm_world = jnp.where(ok[:, None], lm_world, safe)

    def residual(xi, pose, weights):
        """IRLS residual: ``weights`` (validity x Huber) are constants per
        GN step — differentiating through the robust scale stalls GN."""
        T = se3_boxplus(pose, xi)
        pred = jax.vmap(lambda p: cam.world2pixel(p, T))(lm_world)
        r = (pred - obs_px) * weights[:, None]
        return r.reshape(-1)

    def gn_step(pose, base_w):
        z = jnp.zeros(6, pose.dtype)
        # robust weights from the current residuals (held constant)
        pred = jax.vmap(lambda p: cam.world2pixel(p, pose))(lm_world)
        n = jnp.sqrt(jnp.sum((pred - obs_px) ** 2, -1) + 1e-9)
        weights = base_w * jnp.sqrt(jnp.minimum(1.0, huber_px / n))
        r = residual(z, pose, weights)
        J = jax.jacfwd(residual)(z, pose, weights)
        H = J.T @ J
        b = J.T @ r
        if axis_name is not None:
            H = jax.lax.psum(H, axis_name)
            b = jax.lax.psum(b, axis_name)
        H = H + 1e-4 * jnp.eye(6, dtype=pose.dtype)
        dx = jnp.linalg.solve(H, -b)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return se3_boxplus(pose, dx)

    # fori_loop, not an unrolled python loop: the GN body (jacfwd included)
    # is traced and compiled ONCE — the unrolled form multiplied trace and
    # compile time of every frame program by ``iters`` for zero runtime
    # benefit (the iterations are strictly sequential on TPU anyway)
    pose = jax.lax.fori_loop(0, iters, lambda _, p: gn_step(p, w), pose0)
    # final inlier classification
    pred = jax.vmap(lambda p: cam.world2pixel(p, pose))(lm_world)
    err = jnp.linalg.norm(pred - obs_px, axis=-1)
    inliers = ok & (err < reject_px)
    return pose, inliers


@builder_memo
def make_frontend(cam_left, cam_right, H: int, W: int, num_features: int,
                  levels: int = 4, win: int = 15, max_depth: float = 150.0,
                  min_depth: float = 0.5, cell: int = 30,
                  occupy_radius: int = 15, lk_iters: int = 6,
                  remove_moving: bool = True, moving_px: float = 30.0,
                  equalize: bool = False, dct_k: int = 0,
                  dct_quality: int = 92, dct_bits: int = 8,
                  pallas_lk: bool = False, undistort: bool = False):
    """Build the jitted frontend stage functions for a fixed image size.

    The per-frame path (pyramid build + LK + pose refine) is ONE jitted
    program (``frame_step``) taking the raw uint8 image — a single device
    dispatch and a 1-byte-per-pixel upload per frame (the TPU can sit
    behind a high-latency link; dispatch count dominates wall time).

    With ``dct_k`` > 0 every image argument instead arrives as the
    (nb, K+2) int8 DCT payload from :mod:`lvio_fusion_tpu.ops.dct` —
    ~4x fewer upload bytes over bandwidth-limited links — and the decode
    (two batched 8x8 matmuls) fuses into the same programs.
    """

    pad_mult = 2 ** (levels - 1)
    if dct_k:
        from lvio_fusion_tpu.ops.dct import make_decoder
        _dct_decode = make_decoder(H, W, dct_k, dct_quality, dct_bits)
    if undistort:
        # undistortion fused INTO the frame programs (zero extra
        # dispatches; the old standalone path cost two device round
        # trips + two image downloads per frame through the tunnel).
        # Maps are per-camera trace-time constants (estimator.cpp
        # undistort semantics; reference 'undistort' yaml flag).
        from lvio_fusion_tpu.ops.image import make_undistort_map
        _umaps = (make_undistort_map(cam_left, H, W),
                  make_undistort_map(cam_right, H, W))

    def _pyramid(img, right: bool = False):
        if dct_k:
            img = _dct_decode(img)  # f32 in [0, 255]
        if undistort:
            from lvio_fusion_tpu.ops.image import undistort_image
            img = undistort_image(img.astype(jnp.float32),
                                  _umaps[1 if right else 0])
            img = jnp.clip(img, 0.0, 255.0)
        if equalize:
            # reference lvio_fusion_node.cpp:94 — every incoming frame is
            # histogram-equalized before tracking (low-contrast imagery)
            from lvio_fusion_tpu.ops.image import equalize_hist
            if dct_k or undistort:
                img = jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)
            img = equalize_hist(img)
        img = pad_to_multiple(img.astype(jnp.float32) * (1.0 / 255.0),
                              pad_mult)
        return build_pyramid(img, levels)

    def _level0(pyr):
        """Full-resolution level of a chained pyramid."""
        return pyr[0]

    @jax.jit
    def preprocess(img_u8):
        return _pyramid(img_u8)

    from lvio_fusion_tpu.models.camera import stereo_baseline
    baseline = stereo_baseline(cam_left, cam_right)

    def _track(pyr_last, pyr_cur, feat_px, feat_valid, lm_world, pose_pred):
        # seed each feature at the projection of its cached world position
        # under the extrapolated pose (frontend.cpp:166-171)
        proj = jax.vmap(lambda p: cam_left.world2pixel(p, pose_pred))(lm_world)
        seed = jnp.where(feat_valid[:, None], proj, feat_px)
        # clamp wild seeds back to the previous location
        wild = jnp.linalg.norm(seed - feat_px, axis=-1) > 100.0
        seed = jnp.where(wild[:, None], feat_px, seed)
        pts, ok = track_bidirectional(pyr_last, pyr_cur, feat_px, seed,
                                      win=win, iters=lk_iters,
                                      use_pallas=pallas_lk)
        ok = ok & feat_valid
        if remove_moving:
            # moving-point rejection (frontend.cpp:195-230): deviation =
            # predicted - tracked, centered by the MEAN over inliers (the
            # shared prediction bias), reject near points whose centered
            # deviation exceeds moving_px; FAR landmarks are exempt (their
            # projection barely moves, Camera::Far)
            dev = proj - pts
            okf = ok.astype(dev.dtype)
            avg = jnp.sum(dev * okf[:, None], 0) / jnp.maximum(
                jnp.sum(okf), 1.0)
            cd = jnp.linalg.norm(dev - avg, axis=-1)
            depth = jax.vmap(
                lambda p: cam_left.world2sensor(p, pose_pred)[2])(lm_world)
            far_lm = depth > 50.0 * baseline
            ok = ok & (far_lm | (cd < moving_px))
        pose, inliers = pose_only_refine(pose_pred, lm_world, pts, ok,
                                         cam_left)
        return TrackResult(pts, inliers, pose,
                           jnp.sum(inliers.astype(jnp.int32)))

    @jax.jit
    def track_frame(pyr_last, pyr_cur, feat_px, feat_valid, lm_world,
                    pose_pred):
        return _track(pyr_last, pyr_cur, feat_px, feat_valid, lm_world,
                      pose_pred)

    @jax.jit
    def frame_step_chained(img_u8, pyr_last, feat_px, feat_valid, lm_world,
                           pose, relative, ext_pose_pred, use_ext):
        """Device-chained per-frame step: ALL tracking state stays on
        device between frames (uploads over a tunneled TPU cost a full
        RTT each). Prediction = pose * relative unless an external (IMU)
        prediction is supplied (use_ext).

        Returns (pyr_cur, feat_px', feat_valid', pose', relative',
        packed) — only ``packed`` is fetched by the host.
        """
        pyr_cur = _pyramid(img_u8)
        pose_pred = jnp.where(use_ext, ext_pose_pred,
                              se3_mul(pose, relative))
        r = _track(pyr_last, pyr_cur, feat_px, feat_valid, lm_world,
                   pose_pred)
        new_rel = se3_mul(se3_inv(pose), r.pose)
        packed = jnp.concatenate([
            r.pts.reshape(-1), r.ok.astype(jnp.float32), r.pose,
            r.num_inliers.astype(jnp.float32)[None]])
        return pyr_cur, r.pts, r.ok, r.pose, new_rel, packed

    @jax.jit
    def frame_step(img_u8, pyr_last, feat_px, feat_valid, lm_world,
                   pose_pred):
        """Fused per-frame step: pyramid + LK + pose refine, one dispatch.

        Returns (new_pyramid, packed) where packed is ONE f32 vector
        [pts (N*2) | ok (N) | pose (7) | num_inliers (1)] — a single
        device->host transfer instead of four (each costs a full RTT on
        tunneled TPUs). Unpack with ``unpack_track_result``.
        """
        pyr_cur = _pyramid(img_u8)
        r = _track(pyr_last, pyr_cur, feat_px, feat_valid, lm_world,
                   pose_pred)
        packed = jnp.concatenate([
            r.pts.reshape(-1), r.ok.astype(jnp.float32), r.pose,
            r.num_inliers.astype(jnp.float32)[None]])
        return pyr_cur, packed

    def _make_keyframe(pyr_left, pyr_right, cur_px, cur_valid, kf_pose):
        """Detect fresh corners where no feature lives, stereo-match them
        left->right, triangulate, return inverse-depth landmarks (plus the
        robot-frame triangulated points for host-side re-worlding)."""
        img = _level0(pyr_left)
        mask = occupancy_mask(img.shape, cur_px, cur_valid, occupy_radius)
        # multi-scale response (extractor.cpp detects on all pyramid levels)
        from lvio_fusion_tpu.ops.detect import pyramid_score
        score = pyramid_score(list(pyr_left), levels_used=min(3, levels))
        new_px, _, det_valid = detect_grid(img, num_features, cell, mask,
                                           score=score)

        # seed the right-image search at a far-depth projection
        # (local_map.cpp triangulation seeding trick)
        pb = jax.vmap(lambda p: cam_left.pixel2robot(p, max_depth))(new_px)
        seed = jax.vmap(cam_right.robot2pixel)(pb)
        right_px, ok = track_bidirectional(pyr_left, pyr_right, new_px, seed,
                                           win=win, use_pallas=pallas_lk)

        uv_l = pixel_to_norm(new_px, cam_left.fx, cam_left.fy, cam_left.cx,
                             cam_left.cy)
        uv_r = pixel_to_norm(right_px, cam_right.fx, cam_right.fy,
                             cam_right.cx, cam_right.cy)
        n = new_px.shape[0]
        Tl = jnp.broadcast_to(cam_left.extrinsic, (n, 7))
        Tr = jnp.broadcast_to(cam_right.extrinsic, (n, 7))
        pb_tri, good = triangulate(Tl, Tr, uv_l, uv_r)  # robot frame @ kf

        pc_r = jax.vmap(cam_right.robot2sensor)(pb_tri)
        depth_r = pc_r[:, 2]
        valid = (det_valid & ok & good
                 & (depth_r > min_depth) & (depth_r < max_depth))
        inv_depth = 1.0 / jnp.clip(depth_r, min_depth, max_depth)
        world = jax.vmap(lambda p: se3_apply(kf_pose, p))(pb_tri)

        # BRIEF descriptors for covisibility re-association / relocation
        # (local_map.cpp mat2brief on the new keyframe's features)
        from lvio_fusion_tpu.ops.descriptors import brief_descriptors
        desc, desc_ok = brief_descriptors(img, new_px, det_valid)

        return (KeyframeResult(new_px, right_px, inv_depth, world, valid),
                pb_tri, desc, desc_ok)

    def _pack_keyframe(r, pb_tri, desc, desc_ok):
        # descriptors ride the f32 packed array as uint16 halves (exact in
        # f32; a bitcast could be NaN-canonicalized in transit)
        lo = (desc & jnp.uint32(0xFFFF)).astype(jnp.float32)
        hi = (desc >> jnp.uint32(16)).astype(jnp.float32)
        return jnp.concatenate([
            r.new_px_left, r.new_px_right, r.inv_depth[:, None], r.world,
            r.valid.astype(jnp.float32)[:, None], pb_tri, lo, hi,
            desc_ok.astype(jnp.float32)[:, None]], axis=1)

    def make_keyframe(pyr_left, pyr_right, cur_px, cur_valid, kf_pose):
        r, _, _, _ = _make_keyframe(pyr_left, pyr_right, cur_px, cur_valid,
                                    kf_pose)
        return r

    @jax.jit
    def keyframe_step(img_right_u8, pyr_left, cur_px, cur_valid, kf_pose):
        """Fused keyframe stage: right pyramid + detect + stereo +
        triangulate + BRIEF, one dispatch + ONE packed (M, 29) transfer
        (unpack with ``unpack_keyframe_result`` / ``..._desc`` /
        ``..._robot``)."""
        pyr_right = _pyramid(img_right_u8, right=True)
        r, pb, desc, desc_ok = _make_keyframe(pyr_left, pyr_right, cur_px,
                                              cur_valid, kf_pose)
        return _pack_keyframe(r, pb, desc, desc_ok)

    _batch_steps = {}

    def make_batch_kf_step(B: int, imu_cap: int = 0,
                           g_norm: float = 9.81007, kf_thresh=None,
                           unroll: int = 1):
        """Jitted B-frame tracking step with a SPECULATIVE keyframe stage:
        ONE stacked image upload, ONE dispatch, ONE packed fetch for B
        consecutive frames. Host-side transfers through the TPU tunnel
        carry a large fixed cost per call (~30-45 ms regardless of
        payload), so amortizing it over B frames is the single biggest
        throughput lever. Keyframe decisions lag by at most B-1 frames —
        the same tolerance the reference's never-blocking async backend
        exhibits (backend.cpp:28-40).

        The keyframe stage (detect + stereo-match + triangulate on the
        batch's FINAL frame) runs inside the same program: it costs
        on-device FLOPs but zero extra round trips. With ``kf_thresh``
        set, the stage is wrapped in a ``lax.cond`` that reproduces the
        host's keyframe decision EXACTLY (min batch inliers < thresh, or
        the time trigger passed in as ``force_kf``) — XLA executes only
        the taken branch, so no-keyframe batches skip the detection
        FLOPs entirely; kf_packed is zeros then, and the host never
        reads it (its own decision matches by construction; a LOST batch
        implies min_inliers <= tracking_bad < kf_thresh, so recovery
        always has a live detection). kf_packed rows carry the
        triangulated point in the ROBOT frame (pose-independent) so the
        host can re-world them under a corrected pose after LOST
        recovery or BA.

        Returns (pyr_last, feat_px', feat_valid', pose', relative',
        packed (B, N*3+8), kf_packed (M, 29)).
        """
        key = (B, imu_cap, kf_thresh, unroll)
        if key in _batch_steps:
            return _batch_steps[key]

        from lvio_fusion_tpu.ops.imu_preint import (
            predict_from_delta, preintegrate_light,
        )

        def _body(imgs_u8, xs_extra, img_right_u8, pyr_last, feat_px,
                  feat_valid, lm_world, pose, relative, vel0, pred_fn,
                  force_kf, unroll=1):
            """Shared B-frame loop as ONE ``lax.scan``: the per-frame body
            (pyramid + LK + pose refine) is traced and compiled once
            instead of B times — the unrolled form cost minutes of remote
            TPU compile at frame_batch 12 and ~1 min of XLA:CPU compile
            per test signature, while execution on TPU is strictly
            sequential either way (one program, no concurrent kernels).
            ``pred_fn(extra, pose, relative, vel) -> (pose_pred, vel')``
            supplies the per-frame warp seed from the scanned ``extra``."""

            def body(carry, x):
                pyr_last, feat_px, feat_valid, pose, relative, vel = carry
                img, extra = x
                pyr_cur = _pyramid(img)
                pose_pred, vel = pred_fn(extra, pose, relative, vel)
                r = _track(pyr_last, pyr_cur, feat_px, feat_valid,
                           lm_world, pose_pred)
                relative = se3_mul(se3_inv(pose), r.pose)
                packed = jnp.concatenate([
                    r.pts.reshape(-1), r.ok.astype(jnp.float32), r.pose,
                    r.num_inliers.astype(jnp.float32)[None]])
                return ((pyr_cur, r.pts, r.ok, r.pose, relative, vel),
                        (packed, r.num_inliers))

            carry, (packed_rows, inls) = jax.lax.scan(
                body, (pyr_last, feat_px, feat_valid, pose, relative, vel0),
                (imgs_u8, xs_extra), unroll=unroll)
            pyr_last, feat_px, feat_valid, pose, relative, vel = carry

            def _kf_stage(_):
                pyr_right = _pyramid(img_right_u8, right=True)
                kf, pb_tri, desc, desc_ok = _make_keyframe(
                    pyr_last, pyr_right, feat_px, feat_valid, pose)
                return _pack_keyframe(kf, pb_tri, desc, desc_ok)

            if kf_thresh is None:
                kf_packed = _kf_stage(None)
            else:
                need = force_kf | (jnp.min(inls) < kf_thresh)
                kf_packed = jax.lax.cond(
                    need, _kf_stage,
                    lambda _: jnp.zeros((num_features, 29), jnp.float32),
                    None)
            return (pyr_last, feat_px, feat_valid, pose, relative,
                    packed_rows, kf_packed, vel)

        if imu_cap == 0:
            @jax.jit
            def batch_kf_step(imgs_u8, img_right_u8, pyr_last, feat_px,
                              feat_valid, lm_world, pose, relative,
                              ext_preds, use_ext, force_kf):
                def pred(extra, pose, relative, vel):
                    ep, ue = extra
                    return jnp.where(ue, ep, se3_mul(pose, relative)), vel
                z3 = jnp.zeros(3, jnp.float32)
                return _body(imgs_u8, (ext_preds, use_ext), img_right_u8,
                             pyr_last, feat_px, feat_valid, lm_world, pose,
                             relative, z3, pred, force_kf,
                             unroll=unroll)[:-1]
        else:
            # IMU-seeded variant: per-frame raw sample windows ride along
            # in the SAME dispatch; a light (no-covariance) preintegration
            # scan per frame chains pose/velocity prediction on-device
            # (frontend.cpp PredictState per frame, with zero extra RTTs)
            @jax.jit
            def batch_kf_step(imgs_u8, img_right_u8, pyr_last, feat_px,
                              feat_valid, lm_world, pose, relative,
                              imu_acc, imu_gyr, imu_dt, imu_on, vel0,
                              bias, force_kf):
                def pred(extra, pose, relative, vel):
                    acc, gyr, dt, on = extra
                    dp, dq, dv, sdt = preintegrate_light(
                        acc, gyr, dt, bias[:3], bias[3:])
                    pp, pv = predict_from_delta(pose, vel, dp, dq,
                                                dv, sdt, g_norm)
                    return (jnp.where(on, pp, se3_mul(pose, relative)),
                            jnp.where(on, pv, vel))

                return _body(imgs_u8, (imu_acc, imu_gyr, imu_dt, imu_on),
                             img_right_u8, pyr_last, feat_px, feat_valid,
                             lm_world, pose, relative, vel0, pred,
                             force_kf, unroll=unroll)

        _batch_steps[key] = batch_kf_step
        return batch_kf_step

    _pipe_steps = {}

    def make_pipe_step(B: int, kf_thresh: int, max_kf_interval: float,
                       imu_cap: int = 0, g_norm: float = 9.81007,
                       unroll: int = 1):
        """Device-AUTONOMOUS B-frame step for the lag-1 pipelined
        frontend: the keyframe decision AND the feature merge happen
        on-device, so the tracking chain never blocks on host processing
        (the host mirrors results one batch later, while the device
        computes the next batch — the reference's frontend thread never
        waits for the backend either, backend.cpp:28-40).

        Chain state (all device-resident): pyramid, feat_px, feat_valid,
        feat_gen (the batch id that assigned each slot — guards stale
        host refreshes), lm_world, pose, relative, vel, t_since_kf.

        Host->chain injections, applied BEFORE tracking:
          * corr (7,) + use_corr: rigid left-multiply of pose + lm_world
            (BA writeback / gravity alignment / global-stage tail
            corrections, accumulated host-side since the last dispatch)
          * lm_refresh (N,3) + refresh_gen (N,): canonical (BA-refined)
            world positions, applied only where refresh_gen ==
            feat_gen (slots re-assigned by an in-flight keyframe keep
            their fresher on-device triangulation)

        Returns (chain', packed (B, N*3+8), kf_packed (M, 29),
        extras (N+4,): [assigned_det (N) | need_kf | min_inl |
        final_inl | t_since_kf']).
        """
        key = (B, kf_thresh, round(max_kf_interval, 6), imu_cap, unroll)
        if key in _pipe_steps:
            return _pipe_steps[key]

        from lvio_fusion_tpu.ops.imu_preint import (
            predict_from_delta, preintegrate_light,
        )

        @jax.jit
        def pipe_step(imgs_u8, img_right_u8, pyr_last, feat_px, feat_valid,
                      feat_gen, lm_world, pose, relative, vel, t_since_kf,
                      aux_f32, aux_i32):
            N = feat_px.shape[0]
            C = imu_cap
            # ---- unpack the two flat host uploads (every separate
            # device_put is a 1-4 ms relay enqueue in the tunnel's slow
            # mode, so the host packs ALL small per-flush args into one
            # f32 + one i32 buffer; slicing here is free after fusion) ----
            corr = aux_f32[0:7]
            use_corr = aux_f32[7] > 0.5
            frame_dts = aux_f32[8:8 + B]
            _o = 8 + B
            lm_refresh = aux_f32[_o:_o + 3 * N].reshape(N, 3)
            _o += 3 * N
            if imu_cap:
                bias = aux_f32[_o:_o + 6]
                _o += 6
                imu_on = aux_f32[_o:_o + B] > 0.5
                _o += B
                imu_acc = aux_f32[_o:_o + B * C * 3].reshape(B, C, 3)
                _o += B * C * 3
                imu_gyr = aux_f32[_o:_o + B * C * 3].reshape(B, C, 3)
                _o += B * C * 3
                imu_dt = aux_f32[_o:_o + B * C].reshape(B, C)
            refresh_gen = aux_i32[:N]
            kill_gen = aux_i32[N:2 * N]
            batch_gen = aux_i32[2 * N]
            # ---- injections ----
            pose = jnp.where(use_corr, se3_mul(corr, pose), pose)
            lm_world = jnp.where(
                use_corr,
                jax.vmap(lambda p: se3_apply(corr, p))(lm_world), lm_world)
            from lvio_fusion_tpu.geometry.so3 import quat_rotate as _qr
            vel = jnp.where(use_corr, _qr(corr[:4], vel), vel)
            lm_world = jnp.where((refresh_gen == feat_gen)[:, None]
                                 & (refresh_gen >= 0)[:, None],
                                 lm_refresh, lm_world)
            # retire slots whose landmark died host-side (outlier
            # lifecycle), generation-guarded like the refresh
            feat_valid = feat_valid & ~((kill_gen == feat_gen)
                                        & (kill_gen >= 0))

            # ---- track B frames (ONE lax.scan — see _body above) ----
            # pipe payloads arrive as a python tuple of per-frame images
            # (pre-staged device arrays); stacking them INSIDE the program
            # is an on-device copy, not a host transfer
            imgs = jnp.stack(list(imgs_u8))
            if imu_cap:
                xs = (imgs, imu_acc, imu_gyr, imu_dt, imu_on)
            else:
                xs = (imgs,)

            def body(carry, x):
                pyr_last, feat_px, feat_valid, pose, relative, vel = carry
                img = x[0]
                pyr_cur = _pyramid(img)
                if imu_cap:
                    acc, gyr, dt, on = x[1:]
                    dp, dq, dv, sdt = preintegrate_light(
                        acc, gyr, dt, bias[:3], bias[3:])
                    pp, pv = predict_from_delta(pose, vel, dp, dq, dv,
                                                sdt, g_norm)
                    vel = jnp.where(on, pv, vel)
                    pose_pred = jnp.where(on, pp, se3_mul(pose, relative))
                else:
                    pose_pred = se3_mul(pose, relative)
                r = _track(pyr_last, pyr_cur, feat_px, feat_valid,
                           lm_world, pose_pred)
                relative = se3_mul(se3_inv(pose), r.pose)
                packed = jnp.concatenate([
                    r.pts.reshape(-1), r.ok.astype(jnp.float32), r.pose,
                    r.num_inliers.astype(jnp.float32)[None]])
                return ((pyr_cur, r.pts, r.ok, r.pose, relative, vel),
                        (packed, r.num_inliers))

            carry, (packed_rows, inls) = jax.lax.scan(
                body, (pyr_last, feat_px, feat_valid, pose, relative, vel),
                xs, unroll=unroll)
            pyr_last, feat_px, feat_valid, pose, relative, vel = carry

            # ---- device-side keyframe decision (before the stage so a
            # lax.cond can skip the detection FLOPs on no-kf batches) ----
            min_inl = jnp.min(inls)
            t_since_kf = t_since_kf + jnp.sum(frame_dts)
            need_kf = (min_inl < kf_thresh) \
                | (t_since_kf >= max_kf_interval)

            # ---- speculative keyframe stage on the final frame ----
            M = num_features

            def _kf_stage(_):
                pyr_right = _pyramid(img_right_u8, right=True)
                kf, pb_tri, desc, desc_ok = _make_keyframe(
                    pyr_last, pyr_right, feat_px, feat_valid, pose)
                return (_pack_keyframe(kf, pb_tri, desc, desc_ok),
                        kf.new_px_left, kf.world, kf.valid)

            kf_packed, kf_px, kf_world, kf_valid = jax.lax.cond(
                need_kf, _kf_stage,
                lambda _: (jnp.zeros((M, 29), jnp.float32),
                           jnp.zeros((M, 2), jnp.float32),
                           jnp.zeros((M, 3), jnp.float32),
                           jnp.zeros((M,), bool)), None)

            # ---- feature merge ----
            free_slots = jnp.nonzero(~feat_valid, size=N, fill_value=N)[0]
            det_ids = jnp.nonzero(kf_valid, size=M, fill_value=M)[0]
            take = min(N, M)
            tgt = jnp.where(need_kf, free_slots[:take],
                            jnp.full(take, N))  # N = dropped
            src = det_ids[:take]
            src_ok = src < M
            tgt = jnp.where(src_ok, tgt, N)
            safe_src = jnp.minimum(src, M - 1)
            feat_px = feat_px.at[tgt].set(kf_px[safe_src],
                                          mode="drop")
            lm_world = lm_world.at[tgt].set(kf_world[safe_src],
                                            mode="drop")
            feat_valid = feat_valid.at[tgt].set(True, mode="drop")
            feat_gen = feat_gen.at[tgt].set(batch_gen, mode="drop")
            # slot -> detection-row assignment for the host mirror
            assigned = jnp.full(N + 1, -1, jnp.int32).at[tgt].set(
                src.astype(jnp.int32), mode="drop")[:N]
            t_since_kf = jnp.where(need_kf, 0.0, t_since_kf)

            extras = jnp.concatenate([
                assigned.astype(jnp.float32),
                jnp.stack([need_kf.astype(jnp.float32),
                           min_inl.astype(jnp.float32),
                           inls[-1].astype(jnp.float32), t_since_kf])])
            return (pyr_last, feat_px, feat_valid, feat_gen, lm_world,
                    pose, relative, vel, t_since_kf, packed_rows,
                    kf_packed, extras)

        _pipe_steps[key] = pipe_step
        return pipe_step

    @jax.jit
    def landmark_world(anchor_poses, first_obs, inv_depths):
        """Recompute world positions: right-camera ray at the anchor
        (landmark.cpp:15-19 ToWorld)."""
        pb = jax.vmap(lambda ob, d: cam_right.pixel2robot(ob, 1.0 / d))(
            first_obs, inv_depths)
        return jax.vmap(se3_apply)(anchor_poses, pb)

    return FrontendFns(preprocess, track_frame, make_keyframe,
                       landmark_world, frame_step, keyframe_step,
                       frame_step_chained, jax.jit(_level0),
                       make_batch_kf_step, make_pipe_step)
