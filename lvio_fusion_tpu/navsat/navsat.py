"""GNSS (navsat) alignment and trajectory refinement.

Functional equivalent of the reference Navsat (navsat.cpp):
  * AddPoint (:10-35): store raw ENU points, interpolate one fix per
    keyframe.
  * Initialize (:100-133): estimate the ENU->map extrinsic (yaw, then
    yaw + xy) once enough distance is travelled.
  * Optimize / QuickFix (:135-189): section-wise refinement — align the
    section start frame to the GPS track over a gated rpyxyz DoF subset
    (OptimizeBC, :192-269) and rigidly forward-update; smooth the turning
    segment A-B with a relative-pose chain + GPS position anchors
    (OptimizeAB, :271-307).

Host bookkeeping + small fixed-capacity jitted GN solves.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry.se3 import (
    rpyxyz_to_se3, se3_apply, se3_boxplus, se3_inv, se3_mul,
)
from lvio_fusion_tpu.solver import factors
from lvio_fusion_tpu.utils.precision import f32_solver
from lvio_fusion_tpu.solver.assemble import Contribution, assemble
from lvio_fusion_tpu.solver.lm import lm_solve, pin_invalid

BC_CAP = 128   # kf slots per BC refinement
AB_CAP = 64    # kf slots per AB smoothing


class Navsat:
    def __init__(self, accuracy: float = 1.0,
                 trust_distance_yaw: float = 10.0,
                 trust_distance_pitch: float = 20.0,
                 trust_distance_z: float = 2.0):
        self.accuracy = accuracy
        self.trust_yaw = trust_distance_yaw
        self.trust_pitch = trust_distance_pitch
        self.trust_z = trust_distance_z
        self.raw_t: list = []
        self.raw_p: list = []
        self.kf_fix: Dict[int, np.ndarray] = {}  # kf index -> raw ENU fix
        self.extrinsic = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        self.initialized = False
        self._kf_done = 0

    # ---------------- intake ----------------

    def add_point(self, time: float, p_enu, m=None):
        self.raw_t.append(float(time))
        self.raw_p.append(np.asarray(p_enu, np.float32))
        if m is not None:
            self.attach_keyframes(m)

    def attach_keyframes(self, m):
        """Interpolate a raw fix for each new keyframe (AddPoint loop)."""
        if len(self.raw_t) < 2:
            return
        t = np.asarray(self.raw_t)
        P = np.stack(self.raw_p)
        while self._kf_done < m.num_kfs:
            i = self._kf_done
            kt = m.kf_time[i]
            j = np.searchsorted(t, kt)
            if j == 0 or j >= len(t):
                if kt > t[-1]:
                    break  # wait for more navsat data
                self._kf_done += 1
                continue
            if abs(t[j] - kt) > 1.0:
                self._kf_done += 1
                continue
            t1, t2 = kt - t[j - 1], t[j] - kt
            self.kf_fix[i] = (P[j] * t1 + P[j - 1] * t2) / max(t1 + t2, 1e-9)
            self._kf_done += 1

    def get_point(self, kf_idx: int, m=None) -> Optional[np.ndarray]:
        """Fix point in map frame for a keyframe. A keyframe tied to a
        loop closure uses the LOOP-implied position instead of the raw GPS
        fix (navsat.cpp:43-57 GetFixPoint) — GNSS refinement must not pull
        a relocalized frame away from its loop anchor."""
        from lvio_fusion_tpu.utils import np_se3
        if m is not None and m.kf_loop[kf_idx] is not None:
            old_idx, rel = m.kf_loop[kf_idx]
            return np_se3.se3_mul(m.kf_pose[old_idx], rel)[4:].copy()
        f = self.kf_fix.get(kf_idx)
        if f is None:
            return None
        return np_se3.se3_apply(self.extrinsic, f)

    def point_at(self, time: float) -> Optional[np.ndarray]:
        """Interpolated map-frame GPS point at an arbitrary time
        (GetAroundPoint, navsat.cpp:63-71, with interpolation instead of
        nearest-neighbor)."""
        from lvio_fusion_tpu.utils import np_se3
        if len(self.raw_t) < 2:
            return None
        t = np.asarray(self.raw_t)
        if time < t[0] - 1.0 or time > t[-1] + 1.0:
            return None
        j = int(np.clip(np.searchsorted(t, time), 1, len(t) - 1))
        P = np.stack(self.raw_p)
        a = (time - t[j - 1]) / max(t[j] - t[j - 1], 1e-9)
        a = float(np.clip(a, 0.0, 1.0))
        raw = (1 - a) * P[j - 1] + a * P[j]
        return np_se3.se3_apply(self.extrinsic, raw)

    def speed(self, t_to: float, t_from: float) -> float:
        """GPS-derived ground speed between two instants (the frontend's
        navsat_v seeding, frontend.cpp:49-65: ||fix(t2) - fix(t1)|| / dt —
        rotation-invariant, so the initialized/uninitialized branches of
        the reference collapse to one). Returns 0 when unavailable."""
        if t_to - t_from < 1e-6:
            return 0.0
        p2 = self.point_at(t_to)
        p1 = self.point_at(t_from)
        if p1 is None or p2 is None:
            return 0.0
        return float(np.linalg.norm(p2 - p1) / (t_to - t_from))

    def estimate_pose(self, time: float) -> Optional[np.ndarray]:
        """Pose (heading from GPS track) at ``time``: walk raw points back
        until the chord exceeds trust_distance_yaw, then build an SE3 from
        the two points (Navsat::EstimatePose, navsat.cpp:75-98 +
        get_pose_from_two_points, utility.cpp:42-53). The reference's only
        call site is commented out (navsat.cpp:180); kept for API parity.
        """
        from lvio_fusion_tpu.geometry.so3 import rpy_to_quat
        from lvio_fusion_tpu.utils import np_se3
        if len(self.raw_t) < 2:
            return None
        t = np.asarray(self.raw_t)
        j = int(np.clip(np.searchsorted(t, time), 1, len(t) - 1))
        P = np.stack(self.raw_p)
        b = np_se3.se3_apply(self.extrinsic, P[j])
        for i in range(j - 1, -1, -1):
            a = np_se3.se3_apply(self.extrinsic, P[i])
            if np.linalg.norm(a - b) > self.trust_yaw:
                d = (b - a).astype(np.float64)
                rpy = np.array([np.arctan2(d[1], d[0]),
                                -np.arctan2(d[2], np.linalg.norm(d[:2])),
                                0.0])
                import jax.numpy as jnp
                q = np.asarray(rpy_to_quat(jnp.asarray(rpy)))
                return np.concatenate([q, b]).astype(np.float32)
        return None

    # ---------------- initialization ----------------

    INIT_CAP = 256

    def initialize(self, m) -> bool:
        """Fit the ENU->map extrinsic in two passes (navsat.cpp:100-133):
        a closed-form yaw Procrustes seeds a full 6-DoF GN refinement
        (the reference's second DENSE_QR solve over all axes) — required
        when the ENU frame is pitched/rolled relative to the visual map
        (pre-gravity-alignment maps, sloped starts)."""
        ids = sorted(self.kf_fix)
        if len(ids) < 5:
            return False
        kf_p = np.stack([m.kf_pose[i][4:] for i in ids]).astype(np.float64)
        raw = np.stack([self.kf_fix[i] for i in ids]).astype(np.float64)
        span = np.linalg.norm(kf_p[-1] - kf_p[0])
        if span < self.trust_pitch:
            return False

        # pass 1: closed-form horizontal Procrustes (yaw) + translation
        mu_k, mu_r = kf_p.mean(0), raw.mean(0)
        K2, R2 = kf_p[:, :2] - mu_k[:2], raw[:, :2] - mu_r[:2]
        C = K2.T @ R2
        # yaw maximizing sum k . R(yaw) r:  atan2(cross, dot)
        yaw = np.arctan2(C[1, 0] - C[0, 1], C[0, 0] + C[1, 1])
        cy, sy = np.cos(yaw), np.sin(yaw)
        Rz = np.array([[cy, -sy], [sy, cy]])
        txy = mu_k[:2] - Rz @ mu_r[:2]
        tz = (kf_p[:, 2] - raw[:, 2]).mean()
        q = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)])
        ext = np.concatenate([q, [txy[0], txy[1], tz]]).astype(np.float32)

        # pass 2: full 6-DoF GN from the yaw seed
        n = min(len(ids), self.INIT_CAP)
        rbuf = np.zeros((self.INIT_CAP, 3), np.float32)
        kbuf = np.zeros((self.INIT_CAP, 3), np.float32)
        vbuf = np.zeros(self.INIT_CAP, bool)
        rbuf[:n], kbuf[:n], vbuf[:n] = raw[:n], kf_p[:n], True
        ext = np.asarray(_init_refine(
            jnp.asarray(ext), jnp.asarray(rbuf), jnp.asarray(kbuf),
            jnp.asarray(vbuf.astype(np.float32)))).astype(np.float32)
        self.extrinsic = ext
        self.initialized = True
        return True

    # ---------------- refinement ----------------

    def _bc_tables(self, m, frame_idx: int, end_idx: int):
        ids = [i for i in range(frame_idx, min(end_idx + 1, m.num_kfs))
               if i in self.kf_fix]
        from lvio_fusion_tpu.utils import np_se3
        n = min(len(ids), BC_CAP)
        rel_p = np.zeros((BC_CAP, 3), np.float32)
        fixp = np.zeros((BC_CAP, 3), np.float32)
        valid = np.zeros(BC_CAP, bool)
        base = np.asarray(m.kf_pose[frame_idx], np.float32)
        inv = np_se3.se3_inv(base)
        for s, i in enumerate(ids[:n]):
            rel_p[s] = np_se3.se3_apply(inv, m.kf_pose[i][4:])
            fixp[s] = self.get_point(i, m)
            valid[s] = True
        return (jnp.asarray(base), jnp.asarray(rel_p), jnp.asarray(fixp),
                jnp.asarray(valid))

    def optimize_bc(self, m, pose_graph, frame_idx: int, end_idx: int,
                    free_mask, iters: int = 6, section_degree: float = 0.0):
        """Align the pose of ``frame_idx`` (DoF subset) so the trajectory
        [frame, end] matches the GPS track; rigid forward-update follows.

        free_mask: 6-bools over [roll, pitch, yaw, x, y, z] rpyxyz DoF
        (reference mode bitmask, inverted: True = optimize).
        section_degree: accumulated turn degree of the section — bounds the
        vertical correction like the reference's z parameter bounds
        (navsat.cpp:244-248, dz = trust_distance_z * degree / 360): for a
        straight section GPS altitude noise must not bend the map.
        """
        base, rel_p, fixp, valid = self._bc_tables(m, frame_idx, end_idx)
        if int(valid.sum()) < 3:
            return False
        # distance gates (navsat.cpp:195-244): rotation needs path length
        dist = float(np.linalg.norm(
            m.kf_pose[min(end_idx, m.num_kfs - 1)][4:]
            - m.kf_pose[frame_idx][4:]))
        free = np.asarray(free_mask, bool).copy()
        if dist < self.trust_yaw:
            free[:3] = False
        if dist < self.trust_pitch:
            free[1] = False
        free[0] = False  # roll: keep flat (reference solves it separately
        # with a flatness residual then freezes it)
        if not free.any():
            return False
        mask = jnp.asarray(free.astype(np.float32))

        # z correction bounded by the section's turn degree (soft prior:
        # straight sections resist altitude bending)
        dz_trust = self.trust_z * max(section_degree, 1.0) / 360.0
        z_prior_w = 1.0 / max(dz_trust, 1e-3) if free[5] else 0.0
        old_pose = np.asarray(base)
        new_pose = np.asarray(_bc_solve(base, rel_p, fixp,
                                        valid.astype(jnp.float32), mask,
                                        jnp.float32(z_prior_w), iters))
        m.kf_pose[frame_idx] = new_pose.astype(np.float32)
        from lvio_fusion_tpu.utils import np_se3
        transform = np_se3.se3_mul(new_pose, np_se3.se3_inv(old_pose))
        pose_graph._apply_rigid(m, transform, frame_idx + 1, end_idx + 1)
        return True

    def optimize_section(self, m, pose_graph, section):
        """Full section refinement (Navsat::Optimize)."""
        self.optimize_bc(m, pose_graph, section.B, section.C,
                         [True] * 6, section_degree=section.degree)
        if section.A != section.B:
            self.optimize_ab(m, section)
        for i in range(section.B + 1, section.C):
            # per-frame longitudinal fix (mode 0b110111 => only x free)
            self.optimize_bc(m, pose_graph, i, i + 1,
                             [False, False, False, True, False, False])

    def optimize_ab(self, m, section):
        """Smooth the turning segment A..B with a relative-pose chain +
        GPS position anchors, endpoints fixed (Navsat::OptimizeAB,
        navsat.cpp:271-307; z interpolated between A's and B's heights)."""
        ids = [i for i in range(section.A, min(section.B + 1, m.num_kfs))]
        n = len(ids)
        if n < 3 or n > AB_CAP:
            return
        poses = np.zeros((AB_CAP, 7), np.float32)
        poses[:, 0] = 1.0
        fixp = np.zeros((AB_CAP, 3), np.float32)
        valid = np.zeros(AB_CAP, bool)
        zA = m.kf_pose[section.A][6]
        zB = m.kf_pose[section.B][6]
        tA = m.kf_time[section.A]
        tB = m.kf_time[ids[-1]]
        for s, i in enumerate(ids):
            poses[s] = m.kf_pose[i]
            p = self.get_point(i, m)
            if p is not None:
                # z interpolated by TIME between the endpoint heights
                # (navsat.cpp:289-291: a=(t-A.time)/(B.time-A.time); GNSS
                # altitude is not trusted inside a turn section)
                a = (m.kf_time[i] - tA) / max(tB - tA, 1e-9)
                fixp[s] = [p[0], p[1], (1 - a) * zA + a * zB]
                valid[s] = True
        new_poses = np.asarray(_ab_solve(
            jnp.asarray(poses), jnp.asarray(fixp), jnp.asarray(valid),
            jnp.asarray(n, jnp.int32)))
        for s, i in enumerate(ids):
            if 0 < s < n - 1:  # endpoints stay fixed
                m.kf_pose[i] = new_poses[s].astype(np.float32)

    def quick_fix(self, m, pose_graph, end_idx: int):
        """Refine the live tail (Navsat::QuickFix). Returns the index of
        the first keyframe that received only the RIGID forward update
        (everything past the solved anchor B), or None if nothing moved —
        the estimator re-solves that tail against the map
        (Backend::UpdateFrontend semantics, backend.cpp:248-293)."""
        if pose_graph.turning:
            return None
        B = pose_graph.current.B
        if B >= end_idx:
            return None
        dist = np.linalg.norm(m.kf_pose[end_idx][4:] - m.kf_pose[B][4:])
        if dist < self.trust_yaw:
            return None
        moved = self.optimize_bc(m, pose_graph, B, end_idx, [True] * 6,
                                 section_degree=pose_graph.current.degree)
        return B + 1 if moved else None


from functools import partial


@f32_solver
@partial(jax.jit, static_argnames=("iters",))
def _init_refine(ext0, raw, kf_p, valid, iters: int = 8):
    """Full 6-DoF GN on the ENU->map extrinsic: min sum over keyframes of
    || exp(xi) * ext0 applied to raw_i - kf_p_i ||^2 (Huber 2 m). This is
    the reference's second DENSE_QR pass over all axes."""

    def residual(xi, w):
        T = se3_boxplus(ext0, xi)
        pred = jax.vmap(lambda p: se3_apply(T, p))(raw)
        return ((pred - kf_p) * w[:, None]).reshape(-1)

    def gn(xi, _):
        pred = jax.vmap(lambda p: se3_apply(se3_boxplus(ext0, xi), p))(raw)
        n = jnp.linalg.norm(pred - kf_p, axis=-1) + 1e-9
        w = valid * jnp.sqrt(jnp.minimum(1.0, 2.0 / n))
        r = residual(xi, w)
        J = jax.jacfwd(residual)(xi, w)
        H = J.T @ J + 1e-5 * jnp.eye(6)
        dx = jnp.linalg.solve(H, -J.T @ r)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return xi + dx, None

    xi, _ = jax.lax.scan(gn, jnp.zeros(6), None, length=iters)
    return se3_boxplus(ext0, xi)


@f32_solver
@partial(jax.jit, static_argnames=("iters",))
def _bc_solve(base_pose, rel_p, fixp, valid, dof_mask, z_prior_w=0.0,
              iters: int = 6):
    """GN over rpyxyz increments of one frame: min sum || (T(base) *
    T(rpyxyz)) rel_p - fix ||^2 with Huber (+ soft zero-prior on the z
    increment scaled by the turn-degree trust)."""

    def residual(para, w):
        T = se3_mul(base_pose, rpyxyz_to_se3(para * dof_mask))
        pred = jax.vmap(lambda p: se3_apply(T, p))(rel_p)
        r = (pred - fixp) * w[:, None]
        return jnp.concatenate([r.reshape(-1),
                                (z_prior_w * para[5])[None]])

    def gn(para, _):
        pred = jax.vmap(lambda p: se3_apply(
            se3_mul(base_pose, rpyxyz_to_se3(para * dof_mask)), p))(rel_p)
        n = jnp.linalg.norm(pred - fixp, axis=-1) + 1e-9
        w = valid * jnp.sqrt(jnp.minimum(1.0, 2.0 / n))  # Huber 2 m
        r = residual(para, w)
        J = jax.jacfwd(residual)(para, w)
        H = J.T @ J + jnp.diag(1.0 - dof_mask) + 1e-5 * jnp.eye(6)
        dx = jnp.linalg.solve(H, -J.T @ r) * dof_mask
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return para + dx, None

    para, _ = jax.lax.scan(gn, jnp.zeros(6), None, length=iters)
    return se3_mul(base_pose, rpyxyz_to_se3(para * dof_mask))


@f32_solver
@jax.jit
def _ab_solve(poses0, fixp, fix_valid, n_act):
    """LM over inner poses of a turning segment: relative-pose chain
    (measured from the current values, per-axis weights like
    PoseGraphError(1, 20)) + Huber position anchors; endpoints fixed."""
    from lvio_fusion_tpu.solver import factors
    from lvio_fusion_tpu.solver.assemble import Contribution, assemble
    from lvio_fusion_tpu.solver.lm import lm_solve, pin_invalid

    C = poses0.shape[0]
    idx = jnp.arange(C)
    valid = idx < n_act
    fixed = (idx == 0) | (idx == n_act - 1) | ~valid
    idx_j = jnp.minimum(idx + 1, C - 1)
    meas_rel = jax.vmap(lambda i: se3_mul(
        se3_inv(poses0[i]), poses0[jnp.minimum(i + 1, C - 1)]))(idx)
    edge_valid = valid & (idx < n_act - 1)
    # rotation stiff, translation soft: the chain keeps local smoothness
    # while GPS anchors pull the positions (PoseGraphError(1, 20) weights);
    # the final edge into the fixed endpoint B gets the reference's
    # stronger translation weight (PoseGraphError(relative_B, 10, 20),
    # navsat.cpp:302-303)
    is_last_edge = idx == (n_act - 2)
    trans_w = jnp.where(is_last_edge, 10.0, 1.0)
    axis_w = (jnp.array([20.0, 20.0, 20.0, 0.0, 0.0, 0.0])[None, :]
              + jnp.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])[None, :]
              * trans_w[:, None])

    def build(poses):
        z = jnp.zeros((C, 6), poses.dtype)

        def f_rel(xi_i, xi_j, p_i, p_j, meas, aw):
            return factors.relative_pose(xi_i, xi_j, p_i, p_j, meas, 1.0,
                                         aw)

        args = (poses, poses[idx_j], meas_rel, axis_w)
        r = jax.vmap(f_rel)(z, z, *args)
        Ji, Jj = jax.vmap(jax.jacfwd(f_rel, argnums=(0, 1)))(z, z, *args)
        pad = jnp.zeros(Ji.shape[:2] + (9,), poses.dtype)
        c1 = Contribution(
            r=r, pose_idx=(idx.astype(jnp.int32), idx_j.astype(jnp.int32)),
            pose_jacs=(jnp.concatenate([Ji, pad], -1),
                       jnp.concatenate([Jj, pad], -1)),
            lm_idx=None, lm_jac=None, valid=edge_valid)

        def f_pos(xi, p_i, target):
            # anchors dominate the (noisy) chain translations
            return factors.position_prior(xi, p_i, target, 3.0)

        r2 = jax.vmap(f_pos)(z, poses, fixp)
        # Huber 2 m on the anchors
        nrm = jnp.linalg.norm(r2, axis=-1, keepdims=True) + 1e-9
        s = jnp.sqrt(jnp.minimum(1.0, 2.0 / nrm))
        J2 = jax.vmap(jax.jacfwd(f_pos, argnums=0))(z, poses, fixp)
        r2, J2 = r2 * s, J2 * s[..., None]
        pad2 = jnp.zeros(J2.shape[:2] + (9,), poses.dtype)
        c2 = Contribution(
            r=r2, pose_idx=(idx.astype(jnp.int32),),
            pose_jacs=(jnp.concatenate([J2, pad2], -1),),
            lm_idx=None, lm_jac=None, valid=valid & fix_valid)
        sys = assemble([c1, c2], C, 15, 0)
        pv = jnp.concatenate([
            jnp.repeat((valid & ~fixed)[:, None], 6, 1),
            jnp.zeros((C, 9), bool)], axis=1).reshape(-1)
        return pin_invalid(sys, pv, jnp.zeros(0, bool))

    def retract(poses, dxp, dxl):
        dx = dxp.reshape(C, 15)[:, :6] * (valid & ~fixed)[:, None]
        return jax.vmap(se3_boxplus)(poses, dx)

    res = lm_solve(poses0, build, retract,
                   lambda p: build(p).cost, num_iters=5)
    return res.params
