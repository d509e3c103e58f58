"""Backend: sliding-window BA over the host map.

Functional equivalent of the reference Backend thread (backend.cpp:28-245):
extract the active window from the map, assemble fixed-capacity factor
tables, run the jitted Schur-LM solve, write optimized poses/depths back,
reject outlier observations by reprojection error, and return the rigid
correction applied to the newest keyframe so the frontend can propagate it
(PoseGraph::ForwardUpdate semantics).

Window semantics: like the reference, landmarks anchored inside the window
contribute stereo + two-frame factors; landmarks anchored before it
contribute pose-only factors at their cached world positions
(backend.cpp:117-141). The first (oldest) window keyframe is gauge-fixed.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.core.hostmap import HostMap
from lvio_fusion_tpu.geometry.se3 import se3_inv, se3_mul
from lvio_fusion_tpu.solver.ba import (
    BAParams, PriorTables, VisualTables, make_window_ba,
)


def pose_only_refine_np(pose, pw, px, valid, cam, iters: int = 1,
                        huber_px: float = 4.0, weight: float = 1.0):
    """Host-side f64 pose-only GN over reprojection factors.

    The reference re-optimizes the FORWARD keyframes (those created while
    the window solve ran) for one Ceres iteration after applying the rigid
    correction (Backend::UpdateFrontend, backend.cpp:260-267) — a rigid
    shift alone leaves them linearized against the pre-BA landmarks. This
    is the TPU-native placement of that step: a few hundred projections in
    numpy f64, orders of magnitude below one device round-trip, so the
    async frontend never waits on an extra dispatch.

    pose (7,), pw (N, 3) landmark worlds, px (N, 2) observed pixels,
    valid (N,) bool. Returns the refined pose (7,) float32.
    """
    from lvio_fusion_tpu.utils import np_se3

    sel = np.asarray(valid, bool)
    if sel.sum() < 8:
        return np.asarray(pose, np.float32)
    pw = np.asarray(pw, np.float64)[sel]
    px = np.asarray(px, np.float64)[sel]
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    ext_inv = np_se3.se3_inv(np.asarray(cam.extrinsic))
    pose = np.asarray(pose, np.float64)

    def residual(T):
        Tcw = np_se3.se3_mul(ext_inv, np_se3.se3_inv(T))
        pc = np_se3.se3_apply_batch(Tcw, pw).astype(np.float64)
        z = np.where(np.abs(pc[:, 2]) < 1e-6, 1e-6, pc[:, 2])
        pred = np.stack([pc[:, 0] / z * fx + cx, pc[:, 1] / z * fy + cy], 1)
        return (pred - px) * weight

    for _ in range(iters):
        r = residual(pose)
        # Huber IRLS weight held at the linearization point
        n = np.sqrt((r * r).sum(1) + 1e-12)
        w = np.sqrt(np.minimum(1.0, huber_px / n))[:, None]
        J = np.zeros((len(pw), 2, 6))
        h = 1e-6
        for d in range(6):
            e = np.zeros(6)
            e[d] = h
            J[:, :, d] = (residual(np_se3.se3_boxplus(pose, e))
                          - residual(np_se3.se3_boxplus(pose, -e))) / (2 * h)
        rw = (r * w).reshape(-1)
        Jw = (J * w[:, :, None]).reshape(-1, 6)
        H = Jw.T @ Jw + 1e-4 * np.eye(6)
        dx = np.linalg.solve(H, -Jw.T @ rw)
        if not np.all(np.isfinite(dx)):
            break
        pose = np_se3.se3_boxplus(pose, dx).astype(np.float64)
    return pose.astype(np.float32)


class WindowCaps(NamedTuple):
    K: int = 8       # keyframes in the window
    L: int = 512     # landmark slots
    F: int = 2048    # two-frame observation slots
    G: int = 1024    # pose-only observation slots
    Q: int = 16      # prior slots


class PendingBA(NamedTuple):
    """An in-flight window solve: the device buffer plus everything needed
    to write the result back later (the reference backend thread's
    never-blocking contract, backend.cpp:28-40 — the frontend keeps
    tracking while Ceres runs; we fetch one batch later)."""

    flat: object           # device array (packed solve result)
    kf_idx: np.ndarray
    opt_ids: np.ndarray
    tf_src: tuple          # (src_kf, src_idx) of the two-frame obs table
    po_src: tuple
    n_tf: int
    n_po: int
    use_vio: bool
    old_newest: np.ndarray


class Backend:
    def __init__(self, cam_left, cam_right, caps: WindowCaps = WindowCaps(),
                 num_iters: int = 6, use_imu: bool = False,
                 imu_linearizer=None, window_seconds: float = 3.0,
                 reject_px: float = 10.0, stereo_weight_mul: float = 5.0):
        self.caps = caps
        self.window_seconds = window_seconds
        self.reject_px = reject_px
        self.stereo_weight_mul = stereo_weight_mul
        self.cam_left = cam_left
        self.cam_right = cam_right
        self.use_imu = use_imu
        self.solve_vo = make_window_ba(cam_left, cam_right,
                                       num_iters=num_iters, packed=True)
        if use_imu:
            from lvio_fusion_tpu.solver.imu_factor import make_imu_linearizer
            self.solve_vio = make_window_ba(
                cam_left, cam_right, num_iters=num_iters, use_imu=True,
                imu_linearizer=imu_linearizer or make_imu_linearizer(),
                packed=True)
    def _select_window(self, m: HostMap):
        """Last K kfs, clipped to window_seconds like backend.cpp:221."""
        n = m.num_kfs
        k0 = max(0, n - self.caps.K)
        t_end = m.kf_time[-1]
        while k0 < n - 1 and t_end - m.kf_time[k0] > self.window_seconds:
            k0 += 1
        return np.arange(k0, n)

    def optimize(self, m: HostMap, imu_tables=None,
                 imu_ready: bool = False) -> Optional[np.ndarray]:
        """Run window BA in place on the host map (synchronous: dispatch +
        finish back-to-back). Returns the rigid correction SE3
        (new * old^-1) of the newest keyframe, or None if the window is
        degenerate."""
        p = self.dispatch(m, imu_tables=imu_tables, imu_ready=imu_ready)
        if p is None:
            return None
        return self.finish(m, p)

    def dispatch(self, m: HostMap, imu_tables=None,
                 imu_ready: bool = False) -> Optional[PendingBA]:
        """Assemble the window tables and LAUNCH the solve without fetching
        the result (JAX dispatch is asynchronous). The frontend can keep
        tracking on the pre-BA state while the device solves — the
        reference backend thread's never-blocking contract
        (backend.cpp:28-40). Call :meth:`finish` later to write back."""
        caps = self.caps
        kf_idx = self._select_window(m)
        self.last_window_start = int(kf_idx[0]) if len(kf_idx) else 0
        K_act = len(kf_idx)
        if K_act < 2:
            return None
        kf_local = {int(g): i for i, g in enumerate(kf_idx)}

        # ---- gather observations of window kfs ----
        # src_kf/src_idx record where each gathered entry lives in the host
        # map (keyframe, slot) so fused per-observation outlier verdicts can
        # be written back without a second device pass.
        obs_lm, obs_kf, obs_px = [], [], []
        src_kf, src_idx = [], []
        for g in kf_idx:
            ok = m.obs_ok[g]
            sel = np.where(ok)[0]
            obs_lm.append(m.obs_lm[g][sel])
            obs_px.append(m.obs_px[g][sel])
            obs_kf.append(np.full(len(sel), kf_local[int(g)], np.int32))
            src_kf.append(np.full(len(sel), int(g), np.int64))
            src_idx.append(sel)
        obs_lm = np.concatenate(obs_lm)
        obs_px = np.concatenate(obs_px).astype(np.float32)
        obs_kf = np.concatenate(obs_kf)
        src_kf = np.concatenate(src_kf)
        src_idx = np.concatenate(src_idx)

        lm_anchor_g = np.asarray(m.lm_anchor, np.int64)
        alive = np.asarray(m.lm_alive, bool)
        in_window = np.zeros(m.num_landmarks, bool)
        if len(kf_idx):
            in_window_kf = np.zeros(m.num_kfs, bool)
            in_window_kf[kf_idx] = True

        # landmarks anchored inside the window and alive -> optimizable
        anchored_in = in_window_kf[lm_anchor_g] & alive
        opt_ids = np.unique(obs_lm[anchored_in[obs_lm]])
        if len(opt_ids) > caps.L:
            # keep the most-observed landmarks
            counts = np.asarray(m.lm_num_obs)[opt_ids]
            opt_ids = opt_ids[np.argsort(-counts)[: caps.L]]
        lm_slot = np.full(m.num_landmarks, -1, np.int64)
        lm_slot[opt_ids] = np.arange(len(opt_ids))
        L_act = len(opt_ids)

        # ---- split observations ----
        is_opt = lm_slot[obs_lm] >= 0
        is_po = (~anchored_in[obs_lm]) & alive[obs_lm]

        # two-frame obs table
        tf_lm = lm_slot[obs_lm[is_opt]]
        tf_kf = obs_kf[is_opt]
        tf_px = obs_px[is_opt]
        tf_src = (src_kf[is_opt], src_idx[is_opt])
        # pose-only obs table
        po_kf = obs_kf[is_po]
        po_px = obs_px[is_po]
        po_src = (src_kf[is_po], src_idx[is_po])
        po_pw = np.stack([m.lm_world[i] for i in obs_lm[is_po]]) \
            if is_po.any() else np.zeros((0, 3), np.float32)

        # record capacity truncation instead of silently skipping the tail
        # (overflow observations stay unchecked this round; they re-enter
        # next window once earlier ones are rejected)
        n_trunc = max(0, len(tf_lm) - caps.F) + max(0, len(po_kf) - caps.G)
        if n_trunc:
            from lvio_fusion_tpu.utils.profiling import COUNTERS
            COUNTERS["backend.obs_truncated"] += n_trunc

        vis_w = np.asarray([m.kf_weights[g][0] for g in kf_idx], np.float32)

        def pad(a, n, fill=0):
            a = np.asarray(a)
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            c = min(len(a), n)
            out[:c] = a[:c]
            return out

        F, G, L, K, Q = caps.F, caps.G, caps.L, caps.K, caps.Q
        vt = VisualTables(
            lm_anchor=jnp.asarray(pad(
                np.asarray([kf_local[int(a)] for a in lm_anchor_g[opt_ids]],
                           np.int64), L).astype(np.int32)),
            lm_first_ob=jnp.asarray(pad(
                np.stack([m.lm_first_ob[i] for i in opt_ids])
                if L_act else np.zeros((0, 2)), L).astype(np.float32)),
            lm_left_ob=jnp.asarray(pad(
                np.stack([m.lm_left_ob[i] for i in opt_ids])
                if L_act else np.zeros((0, 2)), L).astype(np.float32)),
            lm_valid=jnp.asarray(pad(np.ones(L_act, bool), L, False)),
            lm_weight=jnp.asarray(pad(
                self.stereo_weight_mul
                * np.asarray([m.kf_weights[a][0]
                              for a in lm_anchor_g[opt_ids]], np.float32)
                if L_act else np.zeros(0), L).astype(np.float32)),
            obs_lm=jnp.asarray(pad(tf_lm, F).astype(np.int32)),
            obs_frame=jnp.asarray(pad(tf_kf, F).astype(np.int32)),
            obs_pixel=jnp.asarray(pad(tf_px, F).astype(np.float32)),
            obs_weight=jnp.asarray(pad(vis_w[tf_kf], F).astype(np.float32)),
            obs_valid=jnp.asarray(pad(np.ones(len(tf_lm), bool), F, False)),
            po_frame=jnp.asarray(pad(po_kf, G).astype(np.int32)),
            po_pw=jnp.asarray(pad(po_pw, G).astype(np.float32)),
            po_pixel=jnp.asarray(pad(po_px, G).astype(np.float32)),
            po_weight=jnp.asarray(pad(vis_w[po_kf], G).astype(np.float32)),
            po_valid=jnp.asarray(pad(np.ones(len(po_kf), bool), G, False)),
        )

        # weak prior on every window kf to its current pose (small weight) —
        # stabilizes kfs that lost most features (backend.cpp:164-178)
        poses0 = np.stack([m.kf_pose[g] for g in kf_idx]).astype(np.float32)
        pt = PriorTables(
            frame=jnp.asarray(pad(np.arange(K_act), Q).astype(np.int32)),
            pose=jnp.asarray(pad(poses0, Q).astype(np.float32)),
            weight=jnp.asarray(pad(np.full(K_act, 0.1), Q).astype(np.float32)),
            valid=jnp.asarray(pad(np.ones(K_act, bool), Q, False)),
        )

        params = BAParams(
            poses=jnp.asarray(pad(poses0, K).astype(np.float32)),
            vel=jnp.asarray(pad(
                np.stack([m.kf_vel[g] for g in kf_idx]), K).astype(np.float32)),
            bias=jnp.asarray(pad(
                np.stack([m.kf_bias[g] for g in kf_idx]), K).astype(np.float32)),
            inv_depth=jnp.asarray(pad(
                np.asarray([m.lm_inv_depth[i] for i in opt_ids], np.float32)
                if L_act else np.zeros(0), L, 1.0).astype(np.float32)),
        )
        kf_valid = jnp.asarray(pad(np.ones(K_act, bool), K, False))
        kf_fixed = jnp.zeros(K, bool).at[0].set(True)

        use_vio = self.use_imu and imu_ready
        if use_vio and imu_tables is None:
            imu_tables = self._build_imu_tables(m, kf_idx)
        if use_vio:
            flat = self.solve_vio(params, vt, pt, kf_valid, kf_fixed,
                                  imu_tables)
        else:
            flat = self.solve_vo(params, vt, pt, kf_valid, kf_fixed)
        return PendingBA(
            flat=flat, kf_idx=kf_idx, opt_ids=opt_ids,
            tf_src=tf_src, po_src=po_src,
            n_tf=len(tf_lm), n_po=len(po_kf), use_vio=use_vio,
            old_newest=m.kf_pose[kf_idx[-1]].copy())

    def finish(self, m: HostMap, p: PendingBA) -> np.ndarray:
        """Fetch an in-flight solve (blocks until the device is done) and
        write it back into the host map. Safe to call any number of
        keyframes later as long as the window kfs' poses and the gathered
        observation slots were not mutated meanwhile (the host map is
        append-only; the estimator finishes before any global-stage
        mutation). Returns the rigid correction of the window's newest kf."""
        caps = self.caps
        K, L, F, G = caps.K, caps.L, caps.F, caps.G
        from lvio_fusion_tpu.solver.ba import unpack_ba_result
        (new_poses, new_vel, new_bias, new_depths, lm_world_new, obs_err,
         po_err, cost) = unpack_ba_result(p.flat, K, L, F, G)
        kf_idx, opt_ids = p.kf_idx, p.opt_ids
        new_poses = new_poses[:len(kf_idx)]

        # ---- write back ----
        for i, g in enumerate(kf_idx):
            m.kf_pose[g] = new_poses[i]
            if p.use_vio:
                m.kf_vel[g] = new_vel[i]
                m.kf_bias[g] = new_bias[i]
        for s, gid in enumerate(opt_ids):
            m.lm_inv_depth[gid] = float(new_depths[s])
            m.lm_world[gid] = lm_world_new[s]

        # fused outlier rejection: the reprojection errors came back in the
        # same packed fetch as the solution (backend.cpp:229-245 semantics,
        # zero extra dispatches)
        nf = min(p.n_tf, F)
        self._apply_rejection(m, p.tf_src[0][:nf], p.tf_src[1][:nf],
                              obs_err[:nf])
        ng = min(p.n_po, G)
        self._apply_rejection(m, p.po_src[0][:ng], p.po_src[1][:ng],
                              po_err[:ng])

        from lvio_fusion_tpu.utils import np_se3
        return np_se3.se3_mul(new_poses[-1], np_se3.se3_inv(p.old_newest))

    def _apply_rejection(self, m: HostMap, src_kf, src_idx, err):
        """Flip obs_ok for observations whose reprojection error exceeds
        reject_px and retire landmarks whose support collapses (the
        reference removes the observation AND eventually the landmark,
        backend.cpp:229-245 + Map::RemoveLandmark)."""
        for k in np.where(err >= self.reject_px)[0]:
            g, j = int(src_kf[k]), int(src_idx[k])
            if m.obs_ok[g][j]:
                m.obs_ok[g][j] = False
                lid = int(m.obs_lm[g][j])
                m.lm_num_obs[lid] -= 1
                if m.lm_num_obs[lid] <= 1:
                    # anchor-only support left: stop using this landmark
                    m.lm_alive[lid] = False

    def _build_imu_tables(self, m: HostMap, kf_idx):
        """Stack stored preintegrations between consecutive window kfs
        into a fixed-capacity ImuFactorTables (M = K-1 slots)."""
        from lvio_fusion_tpu.models.sensors import GRAVITY
        from lvio_fusion_tpu.solver.imu_factor import (
            ImuFactorTables, sqrt_info_from_cov,
        )
        M = self.caps.K - 1
        dp = np.zeros((M, 3), np.float32)
        dq = np.zeros((M, 4), np.float32); dq[:, 0] = 1.0
        dv = np.zeros((M, 3), np.float32)
        sum_dt = np.ones((M,), np.float32)
        jac = np.tile(np.eye(15, dtype=np.float32), (M, 1, 1))
        cov = np.tile(np.eye(15, dtype=np.float32), (M, 1, 1))
        lin_ba = np.zeros((M, 3), np.float32)
        lin_bg = np.zeros((M, 3), np.float32)
        valid = np.zeros((M,), bool)
        for s, (gi, gj) in enumerate(zip(kf_idx[:-1], kf_idx[1:])):
            if s >= M:
                break
            p = m.kf_preint[gj]
            if p is None or not (m.kf_good_imu[gi] and m.kf_good_imu[gj]):
                continue
            dp[s], dq[s], dv[s] = p["dp"], p["dq"], p["dv"]
            sum_dt[s], jac[s], cov[s] = p["sum_dt"], p["jac"], p["cov"]
            lin_ba[s], lin_bg[s] = p["lin_ba"], p["lin_bg"]
            valid[s] = True
        sqrt_info = np.asarray(sqrt_info_from_cov(jnp.asarray(cov)))
        return ImuFactorTables(
            frame_i=jnp.asarray(np.arange(M, dtype=np.int32)),
            frame_j=jnp.asarray(np.arange(1, M + 1, dtype=np.int32)),
            dp=jnp.asarray(dp), dq=jnp.asarray(dq), dv=jnp.asarray(dv),
            sum_dt=jnp.asarray(sum_dt), jac=jnp.asarray(jac),
            sqrt_info=jnp.asarray(sqrt_info), lin_ba=jnp.asarray(lin_ba),
            lin_bg=jnp.asarray(lin_bg), valid=jnp.asarray(valid),
            g_norm=jnp.float32(GRAVITY))
