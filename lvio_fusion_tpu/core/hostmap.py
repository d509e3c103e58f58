"""Host-side global map store (keyframes, landmarks, observations).

The reference keeps a mutex-guarded singleton ``Map`` mutated by 7 threads
(map.h:16-58). Here the global map is plain append-only numpy on the host —
the TPU never sees it directly; the backend extracts fixed-shape *windows*
(device tables) from it, solves on-device, and writes results back. All
device compute stays pure/functional; all bookkeeping is sequential host
code, which removes the reference's data races by construction.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class HostMap:
    def __init__(self):
        # keyframes
        self.kf_time: List[float] = []
        self.kf_pose: List[np.ndarray] = []   # (7,) [qw qx qy qz t]
        self.kf_vel: List[np.ndarray] = []    # (3,)
        self.kf_bias: List[np.ndarray] = []   # (6,) [ba, bg]
        self.kf_weights: List[np.ndarray] = []  # (3,) visual/ground/surf (RL)
        self.kf_good_imu: List[bool] = []
        self.kf_preint: List[object] = []  # Preintegration from prev kf (or None)
        self.kf_lidar: List[object] = []   # body-frame feature clouds (or None)
        self.kf_desc: List[object] = []    # BRIEF descriptors (or None)
        # loop closure anchor: (old_kf_idx, relative SE3 old->this) set by
        # the relocator after a correction (Frame::loop_closure); navsat
        # prefers the loop-implied position over the raw GPS fix
        self.kf_loop: List[object] = []

        # landmarks (anchored at a keyframe's right camera)
        self.lm_anchor: List[int] = []        # kf index
        self.lm_first_ob: List[np.ndarray] = []  # (2,) right-cam px
        self.lm_left_ob: List[np.ndarray] = []   # (2,) left-cam px @ anchor
        self.lm_inv_depth: List[float] = []
        self.lm_world: List[np.ndarray] = []  # (3,) cached world position
        self.lm_alive: List[bool] = []
        self.lm_num_obs: List[int] = []
        self.lm_desc: List[Optional[np.ndarray]] = []  # (8,) uint32 BRIEF
        # (creation-time descriptor, used by covisibility re-association)

        # observations grouped per keyframe (left camera)
        self.obs_lm: List[np.ndarray] = []    # per kf: (n,) int64 landmark ids
        self.obs_px: List[np.ndarray] = []    # per kf: (n, 2)
        self.obs_ok: List[np.ndarray] = []    # per kf: (n,) bool (outlier mask)

    # ---- keyframes ----

    @property
    def num_kfs(self) -> int:
        return len(self.kf_time)

    def add_keyframe(self, time, pose, vel=None, bias=None, weights=None,
                     good_imu=False) -> int:
        self.kf_time.append(float(time))
        self.kf_pose.append(np.asarray(pose, dtype=np.float32))
        self.kf_vel.append(np.zeros(3, np.float32) if vel is None
                           else np.asarray(vel, np.float32))
        self.kf_bias.append(np.zeros(6, np.float32) if bias is None
                            else np.asarray(bias, np.float32))
        # defaults: visual=fx/10-style scale set by caller; ground=1, surf=.01
        self.kf_weights.append(np.array([1.0, 1.0, 0.01], np.float32)
                               if weights is None
                               else np.asarray(weights, np.float32))
        self.kf_good_imu.append(bool(good_imu))
        self.kf_preint.append(None)
        self.kf_lidar.append(None)
        self.kf_desc.append(None)
        self.kf_loop.append(None)
        self.obs_lm.append(np.zeros(0, np.int64))
        self.obs_px.append(np.zeros((0, 2), np.float32))
        self.obs_ok.append(np.zeros(0, bool))
        return self.num_kfs - 1

    # ---- landmarks ----

    @property
    def num_landmarks(self) -> int:
        return len(self.lm_anchor)

    def add_landmarks(self, anchor_kf: int, first_obs, left_obs, inv_depths,
                      worlds, descs=None) -> np.ndarray:
        """Append a batch; returns the new global landmark ids.
        ``descs``: optional sequence of (8,) uint32 BRIEF descriptors
        (None entries mean 'no descriptor')."""
        n = len(inv_depths)
        start = self.num_landmarks
        self.lm_anchor.extend([anchor_kf] * n)
        self.lm_first_ob.extend(np.asarray(first_obs, np.float32))
        self.lm_left_ob.extend(np.asarray(left_obs, np.float32))
        self.lm_inv_depth.extend(np.asarray(inv_depths, np.float32).tolist())
        self.lm_world.extend(np.asarray(worlds, np.float32))
        self.lm_alive.extend([True] * n)
        self.lm_num_obs.extend([0] * n)
        if descs is None:
            self.lm_desc.extend([None] * n)
        else:
            self.lm_desc.extend(
                None if d is None else np.asarray(d, np.uint32)
                for d in descs)
        return np.arange(start, start + n, dtype=np.int64)

    def add_observations(self, kf_idx: int, lm_ids, pixels):
        lm_ids = np.asarray(lm_ids, np.int64)
        pixels = np.asarray(pixels, np.float32)
        self.obs_lm[kf_idx] = np.concatenate([self.obs_lm[kf_idx], lm_ids])
        self.obs_px[kf_idx] = np.concatenate([self.obs_px[kf_idx], pixels])
        self.obs_ok[kf_idx] = np.concatenate(
            [self.obs_ok[kf_idx], np.ones(len(lm_ids), bool)])
        for i in lm_ids:
            self.lm_num_obs[i] += 1

    # ---- queries ----

    def window_kf_indices(self, max_kfs: int) -> np.ndarray:
        n = self.num_kfs
        return np.arange(max(0, n - max_kfs), n)

    def poses_array(self) -> np.ndarray:
        return np.stack(self.kf_pose) if self.kf_pose else np.zeros((0, 7))

    def trajectory(self):
        """(times, poses) for all keyframes."""
        return (np.asarray(self.kf_time),
                self.poses_array())

    # ---- persistence (additive; the reference Map has no save/load) ----

    def save(self, path: str):
        """Write the whole map store to one pickle file (all leaves are
        numpy arrays / plain containers)."""
        import pickle
        with open(path, "wb") as f:
            pickle.dump(dict(self.__dict__), f,
                        protocol=pickle.HIGHEST_PROTOCOL)

    @classmethod
    def load(cls, path: str) -> "HostMap":
        import pickle
        with open(path, "rb") as f:
            d = pickle.load(f)
        m = cls()
        m.__dict__.update(d)
        return m


def reworld_landmarks(m: HostMap, cam_right, changed_kf: np.ndarray) -> int:
    """Recompute cached landmark world positions from their anchor poses.

    ``lm_world`` is derived state: anchor right-cam pixel + inverse depth
    (the reference recomputes it on every access, visual/landmark.cpp
    Position()). Pose-graph / navsat / loop corrections move the anchor
    keyframes, so the cache must follow — otherwise the next window BA's
    pose-only factors and the covisibility matcher pull against the
    pre-correction world. One vectorized numpy pass; no device dispatch.

    ``changed_kf``: bool mask over kf indices whose pose moved. Returns
    the number of landmarks refreshed.
    """
    L = m.num_landmarks
    if L == 0 or not changed_kf.any():
        return 0
    anchors = np.asarray(m.lm_anchor, np.int64)
    mask = np.asarray(m.lm_alive, bool) & changed_kf[anchors]
    n = int(mask.sum())
    if n == 0:
        return 0
    ids = np.nonzero(mask)[0]
    first_ob = np.stack([m.lm_first_ob[i] for i in ids]).astype(np.float64)
    depth = 1.0 / np.clip(
        np.asarray([m.lm_inv_depth[i] for i in ids], np.float64), 1e-5, 1e3)
    fx, fy = float(cam_right.fx), float(cam_right.fy)
    cx, cy = float(cam_right.cx), float(cam_right.cy)
    # pixel -> sensor (same undistorted chain the BA epilogue uses)
    pc = np.stack([(first_ob[:, 0] - cx) / fx * depth,
                   (first_ob[:, 1] - cy) / fy * depth, depth], -1)
    # sensor -> robot -> world; anchor poses differ per landmark
    from lvio_fusion_tpu.utils import np_se3
    ext = np.asarray(cam_right.extrinsic, np.float64)
    pb = np_se3.se3_apply_batch(ext, pc)
    T = np.stack([m.kf_pose[a] for a in anchors[ids]]).astype(np.float64)
    q, t = T[:, :4], T[:, 4:]
    uv = np.cross(q[:, 1:], pb)
    pw = pb + 2.0 * (q[:, :1] * uv + np.cross(q[:, 1:], uv)) + t
    for k, i in enumerate(ids):
        m.lm_world[i] = pw[k].astype(np.float32)
    return n
