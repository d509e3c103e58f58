"""Estimator facade: wires frontend, backend, (later) lidar/navsat/loop.

Functional equivalent of the reference Estimator (estimator.cpp:17-206):
``input_image`` drives the per-frame pipeline; keyframe boundaries trigger
the backend window BA. Unlike the reference's 7 concurrent threads, stages
run on a deterministic schedule (frontend every frame; backend + mapping +
navsat + loop as ordered sub-steps at keyframe boundaries) — same outputs,
no data races, and every dense stage is a fixed-shape jitted program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.core.backend import Backend, WindowCaps
from lvio_fusion_tpu.core.frontend import make_frontend
from lvio_fusion_tpu.core.hostmap import HostMap
from lvio_fusion_tpu.geometry.se3 import (
    se3_identity, se3_inv, se3_mul, se3_slerp,
)


@dataclass
class EstimatorConfig:
    height: int = 376
    width: int = 1241
    num_features: int = 400
    num_features_init: int = 50
    num_features_tracking_bad: int = 20
    num_features_needed_for_keyframe: int = 120
    max_keyframe_interval: float = 1.0  # force kf at >= 1 Hz
    levels: int = 4
    lk_window: int = 21
    cell: int = 30
    occupy_radius: int = 15
    window_kfs: int = 8
    window_seconds: float = 3.0
    landmark_slots: int = 512
    obs_slots: int = 2048
    po_slots: int = 1024
    ba_iters: int = 6
    visual_weight: float = 1.0  # per-pixel residual weight (RL-modulated)
    use_imu: bool = False


class Estimator:
    BUILDING, TRACKING, LOST = 0, 1, 2

    def __init__(self, cam_left, cam_right, config: EstimatorConfig):
        self.cfg = config
        self.cam_left = cam_left
        self.cam_right = cam_right
        c = config
        (self.preprocess, self.track_frame, self.make_keyframe,
         self.landmark_world) = make_frontend(
            cam_left, cam_right, c.height, c.width, c.num_features,
            levels=c.levels, win=c.lk_window, cell=c.cell,
            occupy_radius=c.occupy_radius)
        self.backend = Backend(
            cam_left, cam_right,
            caps=WindowCaps(K=c.window_kfs, L=c.landmark_slots,
                            F=c.obs_slots, G=c.po_slots),
            num_iters=c.ba_iters, use_imu=c.use_imu,
            window_seconds=c.window_seconds)
        self.map = HostMap()

        # frontend state
        self.status = self.BUILDING
        self.last_pyr = None
        self.last_pose = np.asarray(se3_identity())
        self.relative = np.asarray(se3_identity())  # constant-velocity model
        self.last_time: Optional[float] = None
        self.last_kf_time: Optional[float] = None
        # current tracked features: fixed capacity num_features
        N = c.num_features
        self.feat_px = np.zeros((N, 2), np.float32)
        self.feat_lm = np.full(N, -1, np.int64)   # global landmark ids
        self.feat_valid = np.zeros(N, bool)

    # ------------------------------------------------------------------

    def input_image(self, time: float, img_left, img_right,
                    init_pose=None) -> np.ndarray:
        """Process one stereo pair; returns the current pose estimate."""
        pyr_left = self.preprocess(jnp.asarray(img_left))
        pyr_right = None

        if self.status == self.BUILDING:
            pose = (np.asarray(se3_identity()) if init_pose is None
                    else np.asarray(init_pose, np.float32))
            pyr_right = self.preprocess(jnp.asarray(img_right))
            ok = self._init_map(time, pyr_left, pyr_right, pose)
            if ok:
                self.status = self.TRACKING
            self.last_pyr = pyr_left
            self.last_pose = pose
            self.last_time = time
            return self.last_pose

        # ---- per-frame tracking ----
        pose_pred = np.asarray(se3_mul(jnp.asarray(self.last_pose),
                                       jnp.asarray(self.relative)))
        lm_world = np.zeros((len(self.feat_lm), 3), np.float32)
        sel = self.feat_valid
        if sel.any():
            lm_world[sel] = np.stack(
                [self.map.lm_world[i] for i in self.feat_lm[sel]])
        res = self.track_frame(self.last_pyr, pyr_left,
                               jnp.asarray(self.feat_px),
                               jnp.asarray(self.feat_valid),
                               jnp.asarray(lm_world),
                               jnp.asarray(pose_pred))
        n_inliers = int(res.num_inliers)
        pose = np.asarray(res.pose)
        self.feat_px = np.array(res.pts)      # copy: jax buffers are read-only
        self.feat_valid = np.array(res.ok)

        if n_inliers <= self.cfg.num_features_tracking_bad:
            # tracking lost: re-init map in place, keep extrapolated pose
            # (frontend.cpp:129-137)
            self.status = self.LOST
            pose = pose_pred
            pyr_right = self.preprocess(jnp.asarray(img_right))
            self.feat_valid[:] = False
            if self._init_map(time, pyr_left, pyr_right, pose):
                self.status = self.TRACKING
        else:
            dt = time - self.last_time
            need_kf = (n_inliers < self.cfg.num_features_needed_for_keyframe
                       or time - self.last_kf_time
                       >= self.cfg.max_keyframe_interval)
            if need_kf:
                pyr_right = self.preprocess(jnp.asarray(img_right))
                pose = self._create_keyframe(time, pyr_left, pyr_right, pose)

        # update constant-velocity model with the (refined) relative motion,
        # normalized per unit time like relative_i_j in the reference
        if self.last_time is not None and time > self.last_time:
            rel = np.asarray(se3_mul(se3_inv(jnp.asarray(self.last_pose)),
                                     jnp.asarray(pose)))
            self.relative = rel
        self.last_pose = pose
        self.last_pyr = pyr_left
        self.last_time = time
        return pose

    # ------------------------------------------------------------------

    def _init_map(self, time, pyr_left, pyr_right, pose) -> bool:
        """BUILDING/LOST -> detect + triangulate a fresh landmark set
        (frontend.cpp InitMap)."""
        kf = self.make_keyframe(pyr_left, pyr_right,
                                jnp.asarray(self.feat_px),
                                jnp.asarray(self.feat_valid),
                                jnp.asarray(pose, dtype=jnp.float32))
        valid = np.asarray(kf.valid)
        if valid.sum() < self.cfg.num_features_init:
            return False
        kf_idx = self.map.add_keyframe(
            time, pose, weights=np.array(
                [self.cfg.visual_weight, 1.0, 0.01], np.float32))
        self._insert_new_landmarks(kf_idx, kf, valid)
        self.last_kf_time = time
        return True

    def _create_keyframe(self, time, pyr_left, pyr_right, pose) -> np.ndarray:
        """Persist tracked observations, detect new landmarks, run BA."""
        kf_idx = self.map.add_keyframe(
            time, pose, weights=np.array(
                [self.cfg.visual_weight, 1.0, 0.01], np.float32))
        sel = self.feat_valid
        if sel.any():
            self.map.add_observations(kf_idx, self.feat_lm[sel],
                                      self.feat_px[sel])
        kf = self.make_keyframe(pyr_left, pyr_right,
                                jnp.asarray(self.feat_px),
                                jnp.asarray(self.feat_valid),
                                jnp.asarray(pose, dtype=jnp.float32))
        self._insert_new_landmarks(kf_idx, kf, np.asarray(kf.valid))
        self.last_kf_time = time

        correction = self.backend.optimize(self.map)
        if correction is not None:
            new_pose = self.map.kf_pose[kf_idx]
            return np.asarray(new_pose)
        return pose

    def _insert_new_landmarks(self, kf_idx, kf, valid):
        """Append triangulated landmarks + claim free feature slots."""
        n_new = int(valid.sum())
        if n_new == 0:
            return
        left_px = np.asarray(kf.new_px_left)[valid]
        right_px = np.asarray(kf.new_px_right)[valid]
        inv_d = np.asarray(kf.inv_depth)[valid]
        world = np.asarray(kf.world)[valid]
        ids = self.map.add_landmarks(kf_idx, right_px, left_px, inv_d, world)
        # the anchor's left-camera pixel is also an observation of this kf
        self.map.add_observations(kf_idx, ids, left_px)

        free = np.where(~self.feat_valid)[0]
        take = min(len(free), n_new)
        slots = free[:take]
        self.feat_px[slots] = left_px[:take]
        self.feat_lm[slots] = ids[:take]
        self.feat_valid[slots] = True

    # ------------------------------------------------------------------

    def trajectory(self):
        return self.map.trajectory()
