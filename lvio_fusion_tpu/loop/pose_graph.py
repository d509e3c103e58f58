"""Pose graph: turn-delimited trajectory sectioning + section-graph solve.

Functional equivalent of the reference PoseGraph (pose_graph.cpp):
  * UpdateSections (:69-129): split the keyframe trajectory into sections
    A(turn start)->B(turn end)->C(next turn) using average-heading angle
    over 5-kf windows (turn >= 7 deg, straight < 1 deg, min B-C distance).
  * BuildProblem/Optimize (:163-224): relative-pose chain over section
    anchors with rotation anchors, endpoints fixed; solved with the
    batched LM core; afterwards each section is rigidly re-transformed
    (ForwardUpdate) so the inner keyframes follow their anchor.

Sectioning is cheap host logic over numpy poses; the graph solve is a
small fixed-capacity jitted LM program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry.se3 import (
    se3_boxplus, se3_inv, se3_mul,
)
from lvio_fusion_tpu.geometry.so3 import quat_mul, quat_rotate
from lvio_fusion_tpu.solver import factors
from lvio_fusion_tpu.solver.assemble import Contribution, assemble
from lvio_fusion_tpu.solver.lm import lm_solve, pin_invalid

# per-capacity section solvers shared across PoseGraph instances (jit
# tracing is re-done for every new wrapper object; see utils/memo.py)
_SECTION_SOLVERS: dict = {}


@dataclass
class Section:
    A: int = 0       # kf index: turn start
    B: int = 0       # kf index: turn end (straight begins)
    C: int = 0       # kf index: next turn start
    degree: float = 0.0
    old_A_pose: Optional[np.ndarray] = None


def headings(poses):
    """Unit forward (x) vectors of an array of poses (N, 7). Pure numpy:
    this runs per keyframe on variable-length slices (a jitted version
    would recompile per length)."""
    q = np.asarray(poses[:, :4], np.float64)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # R @ [1,0,0]: first column of the rotation matrix
    return np.stack([1 - 2 * (y * y + z * z),
                     2 * (x * y + w * z),
                     2 * (x * z - w * y)], axis=1)


def _angle_deg(v1, v2):
    c = np.dot(v1, v2) / max(np.linalg.norm(v1) * np.linalg.norm(v2), 1e-9)
    return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))


class PoseGraph:
    def __init__(self, buf_size: int = 5, turn_deg: float = 7.0,
                 straight_deg: float = 1.0, min_bc_distance: float = 20.0,
                 graph_cap: int = 64):
        self.buf = buf_size
        self.turn_deg = turn_deg
        self.straight_deg = straight_deg
        self.min_bc = min_bc_distance
        self.cap = graph_cap
        self.sections: Dict[int, Section] = {}  # keyed by A kf index
        # past loop submaps keyed by END kf index; Section(A=old kf,
        # B=submap start kf, C=submap end kf) — pose_graph.cpp submaps_
        self.submaps: Dict[int, Section] = {}
        self.current = Section()
        self.turning = True
        self._processed = 0
        self._solve = None

    # ---------------- sectioning ----------------

    def update_sections(self, m):
        """Consume new keyframes and advance the section state machine."""
        n = m.num_kfs
        b = self.buf
        while self._processed < n:
            i = self._processed
            self._processed += 1
            if i < 2 * b:
                continue
            poses = np.stack(m.kf_pose[i - 2 * b:i])
            h = headings(poses)
            last_ori = h[:b].sum(0)
            cur_ori = h[b:].sum(0)
            deg = _angle_deg(last_ori, cur_ori)
            if self.turning:
                self.current.degree += deg
                if deg < self.straight_deg:
                    self.current.B = i - b
                    self.turning = False
            else:
                ori_B = headings(np.stack(
                    m.kf_pose[max(0, self.current.B - b):self.current.B + 1]
                )).sum(0)
                if deg >= self.turn_deg or _angle_deg(ori_B, cur_ori) > self.turn_deg:
                    dist = float(np.linalg.norm(
                        m.kf_pose[i][4:] - m.kf_pose[self.current.B][4:]))
                    if self.current.A == self.current.B or dist > self.min_bc:
                        self.current.C = i - b
                        self.sections[self.current.A] = Section(
                            self.current.A, self.current.B, self.current.C,
                            self.current.degree)
                        self.current = Section(A=i - b, B=i - b, degree=deg)
                    self.turning = True

    def get_sections(self, m, start_kf: int, end_kf: int) -> List[Section]:
        self.update_sections(m)
        return [s for a, s in sorted(self.sections.items())
                if start_kf <= a <= end_kf]

    def add_submap(self, old_kf: int, start_kf: int, end_kf: int):
        """Record a corrected loop submap (AddSubMap,
        pose_graph.cpp:8-16)."""
        self.submaps[end_kf] = Section(A=old_kf, B=start_kf, C=end_kf)

    def filter_old_submaps(self, m, start_kf: int, end_kf: int):
        """Active sections in [start, end] minus those already rigidly
        anchored by a PREVIOUS loop correction (FilterOldSubmaps,
        pose_graph.cpp:24-50): a second loop pass over an already-corrected
        stretch must not re-correct it.

          * outer submap (its old anchor A <= start): everything up to the
            submap's end is pinned by the older loop — drop those sections
          * inner submap (A inside the range): drop sections covered by
            (A, submap end]
        """
        active = {s.A: s for s in self.get_sections(m, start_kf, end_kf)}
        for send in sorted(self.submaps):
            if not (start_kf <= send <= end_kf):
                continue
            sm = self.submaps[send]
            if sm.A <= start_kf:
                for a in [a for a in active if a <= send]:
                    del active[a]
            else:
                for a in [a for a in active if sm.A < a <= send]:
                    del active[a]
        return [active[a] for a in sorted(active)]

    def add_section(self, m, kf: int) -> bool:
        """Force a section boundary (AddSection, pose_graph.cpp:148-162)."""
        if self.sections and not self.turning and kf > self.current.B:
            self.current.C = kf
            self.sections[self.current.A] = Section(
                self.current.A, self.current.B, kf, self.current.degree)
            self.current = Section(A=kf, B=kf)
            return True
        return False

    # ---------------- graph solve ----------------

    def optimize(self, m, sections: List[Section], fixed_old_kf: int,
                 fixed_start_kf: int, meas_poses=None):
        """Solve the section-anchor chain with fixed endpoints, then rigidly
        forward-update each section's keyframes.

        meas_poses: optional snapshot {kf_idx: pose} taken BEFORE a loop
        correction moved the endpoints — relative measurements come from it
        (reference BuildProblem runs before UpdateNewSubmap moves the
        submap); defaults to current poses.
        """
        if not sections:
            return
        cap = self.cap
        anchors = [fixed_old_kf] + [s.A for s in sections] + [fixed_start_kf]
        Na = len(anchors)
        if Na > cap:
            anchors = anchors[:cap]
            Na = cap
        poses0 = np.stack([m.kf_pose[a] for a in anchors]).astype(np.float32)
        if meas_poses is None:
            posesm = poses0
        else:
            posesm = np.stack([meas_poses.get(a, m.kf_pose[a])
                               for a in anchors]).astype(np.float32)

        solve = self._make_solver()
        new_poses = np.asarray(solve(jnp.asarray(self._pad_poses(posesm)),
                                     jnp.asarray(self._pad_poses(poses0)),
                                     jnp.asarray(Na)))[:Na]

        # rigid forward-update of each section [A_k, A_{k+1})
        for k in range(1, Na - 1):
            old = poses0[k]
            new = new_poses[k]
            transform = np.asarray(se3_mul(jnp.asarray(new),
                                           se3_inv(jnp.asarray(old))))
            start = anchors[k]
            end = anchors[k + 1] if k + 1 < Na else m.num_kfs
            self._apply_rigid(m, transform, start, end)

    def _pad_poses(self, poses):
        out = np.zeros((self.cap, 7), np.float32)
        out[:, 0] = 1.0
        out[:len(poses)] = poses
        return out

    def _make_solver(self):
        if self._solve is not None:
            return self._solve
        cached = _SECTION_SOLVERS.get(self.cap)
        if cached is not None:
            self._solve = cached
            return cached
        cap = self.cap

        @jax.jit
        def solve(poses_meas, poses0, n_act):
            idx = jnp.arange(cap)
            valid = idx < n_act
            fixed = (idx == 0) | (idx == n_act - 1) | ~valid
            meas_rel = jax.vmap(
                lambda i: se3_mul(se3_inv(poses_meas[i]),
                                  poses_meas[jnp.minimum(i + 1, cap - 1)]))(idx)
            edge_valid = valid & (idx < n_act - 1)
            axis_w = jnp.array([1.0, 1.0, 1.0, 1.0, 10.0, 10.0])

            def build(poses):
                z = jnp.zeros((cap, 6), poses.dtype)

                def f_rel(xi_i, xi_j, p_i, p_j, meas):
                    return factors.relative_pose(
                        xi_i, xi_j, p_i, p_j, meas, 1.0, axis_w)

                idx_j = jnp.minimum(idx + 1, cap - 1)
                args = (poses, poses[idx_j], meas_rel)
                r = jax.vmap(f_rel)(z, z, *args)
                Ji, Jj = jax.vmap(jax.jacfwd(f_rel, argnums=(0, 1)))(
                    z, z, *args)
                pad = jnp.zeros(Ji.shape[:2] + (9,), poses.dtype)
                c1 = Contribution(
                    r=r, pose_idx=(idx.astype(jnp.int32),
                                   idx_j.astype(jnp.int32)),
                    pose_jacs=(jnp.concatenate([Ji, pad], -1),
                               jnp.concatenate([Jj, pad], -1)),
                    lm_idx=None, lm_jac=None, valid=edge_valid)

                def f_rot(xi, p_i, anchor):
                    return factors.rotation_prior(xi, p_i, anchor, 1.0)

                r2 = jax.vmap(f_rot)(z, poses, poses_meas)
                J2 = jax.vmap(jax.jacfwd(f_rot, argnums=0))(z, poses,
                                                            poses_meas)
                pad2 = jnp.zeros(J2.shape[:2] + (9,), poses.dtype)
                c2 = Contribution(
                    r=r2, pose_idx=(idx.astype(jnp.int32),),
                    pose_jacs=(jnp.concatenate([J2, pad2], -1),),
                    lm_idx=None, lm_jac=None, valid=valid)
                sys = assemble([c1, c2], cap, 15, 0)
                pv = jnp.concatenate([
                    jnp.repeat((valid & ~fixed)[:, None], 6, 1),
                    jnp.zeros((cap, 9), bool)], axis=1).reshape(-1)
                return pin_invalid(sys, pv, jnp.zeros(0, bool))

            def cost_fn(poses):
                sysc = build(poses)
                return sysc.cost

            def retract(poses, dxp, dxl):
                dx = dxp.reshape(cap, 15)[:, :6]
                dx = dx * (valid & ~fixed)[:, None]
                return jax.vmap(se3_boxplus)(poses, dx)

            res = lm_solve(poses0, build, retract, cost_fn, num_iters=6)
            return res.params

        self._solve = solve
        _SECTION_SOLVERS[self.cap] = solve
        return solve

    def _apply_rigid(self, m, transform, start_kf: int, end_kf: int):
        """new_pose = transform * old_pose for kfs in [start, end)
        (ForwardUpdate, pose_graph.cpp:227-252). Numpy: per-kf device
        dispatches would dominate behind a remote tunnel."""
        from lvio_fusion_tpu.utils import np_se3
        T = np.asarray(transform, np.float32)
        for i in range(start_kf, min(end_kf, m.num_kfs)):
            m.kf_pose[i] = np_se3.se3_mul(T, m.kf_pose[i])
            m.kf_vel[i] = np_se3.quat_rotate(T[:4], m.kf_vel[i]).astype(
                np.float32)

    def forward_update(self, m, transform, start_kf: int):
        self._apply_rigid(m, transform, start_kf, m.num_kfs)
