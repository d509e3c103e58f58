"""Loop detection + correction.

Functional equivalent of the reference Relocator (relocator.cpp):
  * DetectLoop (:87-133): revisit detection by horizontal proximity to
    keyframes older than 30 s (3 neighbors inside the threshold radius) —
    numpy brute force replaces the kd-tree (a few thousand kfs is tiny).
  * Relocate (:135-184 + mapping.cpp:251-300): lidar scan-to-map
    alignment of each candidate frame against a local map built around its
    old counterpart; score = fraction of feature points whose
    point-to-plane residual stays small.
  * CorrectLoop (:186-245): relocate every frame of the new submap, pick
    the best, rotation-align and rigidly shift the submap
    (UpdateNewSubmap), solve the section pose graph between the old
    section and the submap, and forward-update everything after.

Runs on the deterministic keyframe schedule instead of a 100 ms thread.
Both reference relocation modes are implemented: lidar scan-to-map
scoring (mode bit 2) and visual BRIEF-descriptor matching
(`relocate_visual`, mode bit 1; relocator.cpp RelocateByImage).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry.se3 import (
    se3_apply, se3_inv, se3_mul,
)

from lvio_fusion_tpu.utils.memo import builder_memo


@builder_memo
def _make_pnp(cam):
    """Jitted visual PnP (pose-only GN) shared across Relocator
    instances with the same camera (re-tracing per instance is the
    dominant construction cost; utils/memo.py)."""
    from lvio_fusion_tpu.core.frontend import pose_only_refine
    return jax.jit(lambda p0, w, px, ok: pose_only_refine(
        p0, w, px, ok, cam, iters=8))

from lvio_fusion_tpu.lidar.mapping import knn3_planes, make_scan_to_map


class Relocator:
    def __init__(self, lidar_mapping=None, threshold: float = 10.0,
                 min_elapsed: float = 30.0, score_thresh: float = 0.5,
                 up_axis: str = "z", resolution: float = 0.2,
                 mode: int = 2):
        """mode: reference relocator_mode — 1 visual, 2 lidar, 3 both."""
        self.mapping = lidar_mapping
        self.threshold = threshold
        self.min_elapsed = min_elapsed
        self.score_thresh = score_thresh
        self.resolution = resolution
        self.mode = mode
        self.up_axis = up_axis
        if lidar_mapping is not None:
            self._refine = make_scan_to_map(iters=4, resolution=resolution,
                                            up_axis=up_axis)
        # pending loop state (DetectorLoop statics)
        self._pending: Dict[int, int] = {}  # new kf -> old kf
        # first kf of the rigid-only tail left by the latest correction
        # (consumed + reset by the estimator's forward re-solve)
        self.forward_start = 1 << 30
        # jitted visual PnP: without this, pose_only_refine would re-trace
        # an 8-iteration GN for EVERY loop candidate (shapes are fixed:
        # the estimator's feature capacity)
        self._pnp = None

    def set_up_axis(self, up_axis: str):
        """Switch the world vertical axis (the VI initializer calls this
        when it gravity-aligns the map mid-run): both the scan-to-map
        DoF split and the horizontal-proximity loop detection follow."""
        if up_axis != self.up_axis:
            self.up_axis = up_axis
            if self.mapping is not None:
                self._refine = make_scan_to_map(
                    iters=4, resolution=self.resolution, up_axis=up_axis)

    # ---------------- detection ----------------

    def detect(self, m, kf_idx: int) -> Optional[int]:
        """Return the closest old keyframe index if this kf closes a loop.
        Proximity is measured in the HORIZONTAL plane — the two position
        axes perpendicular to the current up axis (on a raw camera-world
        map 'y' is up, so the plane is x-z; relocator.cpp:87-133 assumes
        z-up because the reference always runs gravity-aligned)."""
        t = m.kf_time[kf_idx]
        old_n = np.searchsorted(np.asarray(m.kf_time),
                                t - self.min_elapsed)
        if old_n < 3:
            return None
        cols = [4, 5] if self.up_axis == "z" else [4, 6]
        old_xy = np.stack(m.kf_pose[:old_n])[:, cols]
        d = np.linalg.norm(old_xy - m.kf_pose[kf_idx][cols], axis=-1)
        idx = np.argsort(d)[:3]
        if np.all(d[idx] < self.threshold):
            return int(idx[0])
        return None

    # ---------------- relocation ----------------

    def relocate(self, m, kf_idx: int, old_idx: int):
        """Relocate a keyframe against its old counterpart. Visual
        (descriptor PnP) provides the initial alignment when enabled;
        lidar scan-to-map refines/scores (Relocator::Relocate,
        relocator.cpp:135-184). Returns (pose, score) or None."""
        out = None
        if self.mode & 1:
            out = self.relocate_visual(m, kf_idx, old_idx)
        if self.mode & 2:
            init = out[0] if out is not None else None
            lidar_out = self.relocate_lidar(m, kf_idx, old_idx, init)
            if lidar_out is not None:
                out = lidar_out
        return out

    def relocate_visual(self, m, kf_idx: int, old_idx: int):
        """BRIEF match against the old keyframe + pose-only PnP
        (the reference's RelocateByPoints visual mode)."""
        import jax.numpy as jnp

        from lvio_fusion_tpu.core.frontend import pose_only_refine
        from lvio_fusion_tpu.ops.descriptors import match as dmatch

        dc = m.kf_desc[kf_idx]
        do = m.kf_desc[old_idx]
        if dc is None or do is None or self._cam is None:
            return None
        idx, good = dmatch(jnp.asarray(dc["desc"]), jnp.asarray(dc["ok"]),
                           jnp.asarray(do["desc"]), jnp.asarray(do["ok"]))
        good_np = np.asarray(good)
        if good_np.sum() < 10:
            return None
        idx_np = np.asarray(idx)
        # matched: current pixel <-> old landmark world position
        n = len(good_np)
        pw = np.zeros((n, 3), np.float32)
        old_lm = do["lm"]
        for i in np.where(good_np)[0]:
            li = old_lm[idx_np[i]]
            if li < 0:
                good_np[i] = False
            else:
                pw[i] = m.lm_world[li]
        if good_np.sum() < 10:
            return None
        if self._pnp is None:
            self._pnp = _make_pnp(self._cam)
        pose, inliers = self._pnp(
            jnp.asarray(m.kf_pose[old_idx]), jnp.asarray(pw),
            jnp.asarray(dc["px"]), jnp.asarray(good_np))
        score = float(np.asarray(inliers).sum()) / max(int(good_np.sum()), 1)
        return np.asarray(pose), score

    _cam = None  # left camera model, set by the estimator for visual mode

    def relocate_lidar(self, m, kf_idx: int, old_idx: int, init_pose=None):
        """Scan-to-map align kf against the old frame's neighborhood.
        Returns (pose, score) or None."""
        f = m.kf_lidar[kf_idx]
        if f is None or self.mapping is None:
            return None
        wm = self.mapping
        # local map: old frame +- 2 neighbors' world clouds
        ids = [i for i in sorted(wm.world_ground)
               if abs(i - old_idx) <= 2]
        if not ids:
            return None

        from lvio_fusion_tpu.lidar.mapping import merge_clouds
        map_g, mgv = merge_clouds(wm.world_ground, ids, wm.map_cap,
                                  self.resolution)
        map_s, msv = merge_clouds(wm.world_surf, ids, wm.map_cap,
                                  self.resolution)
        g = jnp.asarray(f["ground"])
        gv = jnp.asarray(f["ground_valid"])
        s = jnp.asarray(f["surf"])
        sv = jnp.asarray(f["surf_valid"])

        pose = jnp.asarray(m.kf_pose[kf_idx] if init_pose is None
                           else init_pose)
        # coarse-to-fine alternating rounds (mapping.cpp Relocate: 4 rounds;
        # the first rounds need a loose gate to capture the loop drift)
        for scale in (max(self.threshold, 4.0) ** 2, 4.0, 1.0):
            pose = self._refine(pose, g, gv, s, sv, map_g, mgv, map_s, msv,
                                jnp.float32(1.0), jnp.float32(1.0),
                                jnp.float32(0.0), jnp.float32(scale))
        score = float(self._score(pose, s, sv, map_s, msv))
        return np.asarray(pose), score

    def _score(self, pose, pts, valid, map_pts, map_valid):
        pw = jax.vmap(lambda p: se3_apply(pose, p))(pts)
        plane_pt, normal, ok = knn3_planes(
            pw, valid, map_pts, map_valid, (self.resolution ** 2) * 25.0)
        r = jnp.abs(jnp.sum((pw - plane_pt) * normal, -1))
        good = ok & (r < 2 * self.resolution)
        denom = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(good) / denom

    # ---------------- correction ----------------

    def process_keyframe(self, m, pose_graph, kf_idx: int) -> bool:
        """Detection state machine per new keyframe; corrects when a loop
        run ends (DetectorLoop, relocator.cpp:23-85). Returns True if a
        correction was applied."""
        old = self.detect(m, kf_idx)
        if old is not None:
            self._pending[kf_idx] = old
            return False
        if self._pending:
            new_kfs = sorted(self._pending)
            old_idx = min(self._pending.values())
            corrected = self.correct_loop(
                m, pose_graph, old_idx, new_kfs[0], new_kfs[-1])
            self._pending.clear()
            return corrected
        return False

    def flush(self, m, pose_graph) -> bool:
        """End-of-stream: an open detection run can never be closed by a
        later non-detecting keyframe (the reference's DetectorLoop only
        corrects when detection STOPS, relocator.cpp:23-85 — on a
        trajectory that keeps overlapping old ground, e.g. a full circle,
        the run stays open forever). Treat stream end as the run ending
        and apply the pending correction."""
        if not self._pending:
            return False
        new_kfs = sorted(self._pending)
        old_idx = min(self._pending.values())
        corrected = self.correct_loop(
            m, pose_graph, old_idx, new_kfs[0], new_kfs[-1])
        self._pending.clear()
        return corrected

    def correct_loop(self, m, pose_graph, old_idx: int, start_idx: int,
                     end_idx: int) -> bool:
        # snapshot for pose-graph measurements (pre-correction)
        snapshot = {i: m.kf_pose[i].copy() for i in range(m.num_kfs)}

        best, best_score, best_kf = None, -1.0, None
        for i in range(start_idx, end_idx + 1):
            out = self.relocate(m, i, self._pending.get(i, old_idx))
            if out is None:
                continue
            pose, score = out
            if score > best_score:
                best, best_score, best_kf = pose, score, i
        if best is None or best_score < self.score_thresh:
            return False

        # rigid-shift the submap by the best frame's correction
        transform = np.asarray(se3_mul(
            jnp.asarray(best), se3_inv(jnp.asarray(m.kf_pose[best_kf]))))
        pose_graph._apply_rigid(m, transform, start_idx, end_idx + 1)

        # record loop anchors (Frame::loop_closure): each submap kf is tied
        # to the old frame by its post-correction relative pose, so navsat
        # can prefer loop-implied positions (navsat.cpp:43-57 GetFixPoint)
        from lvio_fusion_tpu.utils import np_se3
        inv_old = np_se3.se3_inv(m.kf_pose[old_idx])
        for i in range(start_idx, end_idx + 1):
            m.kf_loop[i] = (old_idx, np_se3.se3_mul(inv_old, m.kf_pose[i]))

        # pose-graph solve over sections strictly between old and submap,
        # minus stretches already corrected by previous loops
        # (FilterOldSubmaps, pose_graph.cpp:24-50); record this submap so
        # future passes skip it too (AddSubMap, relocator.cpp:211-212)
        sections = pose_graph.filter_old_submaps(
            m, old_idx + 1, max(start_idx - 1, old_idx + 1))
        pose_graph.add_submap(old_idx, start_idx, end_idx)
        pose_graph.optimize(m, sections, fixed_old_kf=old_idx,
                            fixed_start_kf=start_idx, meas_poses=snapshot)

        # forward-update everything after the submap
        # (already covered: _apply_rigid above shifted [start, end]; kfs
        # after end follow the same rigid transform)
        pose_graph._apply_rigid(m, transform, end_idx + 1, m.num_kfs)
        # the tail past the relocated submap got RIGID treatment only;
        # report it so the estimator can run the 1-iteration forward
        # re-solve (Backend::UpdateFrontend, backend.cpp:248-293)
        self.forward_start = min(self.forward_start, end_idx + 1)

        # re-render world clouds at corrected poses
        for i in range(m.num_kfs):
            if m.kf_lidar[i] is not None and i in self.mapping.world_ground:
                self.mapping.to_world(m, i)
        return True
