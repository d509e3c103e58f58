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


from lvio_fusion_tpu.utils.memo import builder_memo


@builder_memo
def _packed_entry(solve, caps, use_imu: bool):
    """Jitted (fbuf, ibuf) -> packed-solve entry around a window-BA solve
    function (shared across Backend instances with equal configuration;
    ``solve`` itself comes from the memoized make_window_ba, so equal
    configs key to the same entry)."""
    packer = _TablePacker(caps, use_imu)
    if use_imu:
        from lvio_fusion_tpu.models.sensors import GRAVITY
        from lvio_fusion_tpu.solver.imu_factor import (
            ImuFactorTables, sqrt_info_from_cov,
        )
        M = caps.K - 1

    @jax.jit
    def run(fbuf, ibuf):
        d = packer.unpack(fbuf, ibuf)
        params = BAParams(poses=d["poses"], vel=d["vel"], bias=d["bias"],
                          inv_depth=d["inv_depth"])
        vt = VisualTables(
            lm_anchor=d["lm_anchor"], lm_first_ob=d["lm_first_ob"],
            lm_left_ob=d["lm_left_ob"], lm_valid=d["lm_valid"],
            lm_weight=d["lm_weight"], obs_lm=d["obs_lm"],
            obs_frame=d["obs_frame"], obs_pixel=d["obs_pixel"],
            obs_weight=d["obs_weight"], obs_valid=d["obs_valid"],
            po_frame=d["po_frame"], po_pw=d["po_pw"],
            po_pixel=d["po_pixel"], po_weight=d["po_weight"],
            po_valid=d["po_valid"])
        pt = PriorTables(frame=d["pt_frame"], pose=d["pt_pose"],
                         weight=d["pt_weight"], valid=d["pt_valid"])
        if use_imu:
            it = ImuFactorTables(
                frame_i=jnp.arange(M, dtype=jnp.int32),
                frame_j=jnp.arange(1, M + 1, dtype=jnp.int32),
                dp=d["imu_dp"], dq=d["imu_dq"], dv=d["imu_dv"],
                sum_dt=d["imu_sum_dt"], jac=d["imu_jac"],
                sqrt_info=sqrt_info_from_cov(d["imu_cov"]),
                lin_ba=d["imu_lin_ba"], lin_bg=d["imu_lin_bg"],
                valid=d["imu_valid"], g_norm=jnp.float32(GRAVITY))
            return solve(params, vt, pt, d["kf_valid"], d["kf_fixed"], it)
        return solve(params, vt, pt, d["kf_valid"], d["kf_fixed"])

    return run, packer


def _tables_from_dict(d: dict):
    """(BAParams, VisualTables, PriorTables) from the numpy slab dict
    (legacy unpacked dispatch path)."""
    j = {k: jnp.asarray(v) for k, v in d.items()}
    params = BAParams(poses=j["poses"], vel=j["vel"], bias=j["bias"],
                      inv_depth=j["inv_depth"])
    vt = VisualTables(
        lm_anchor=j["lm_anchor"].astype(jnp.int32),
        lm_first_ob=j["lm_first_ob"], lm_left_ob=j["lm_left_ob"],
        lm_valid=j["lm_valid"], lm_weight=j["lm_weight"],
        obs_lm=j["obs_lm"].astype(jnp.int32),
        obs_frame=j["obs_frame"].astype(jnp.int32),
        obs_pixel=j["obs_pixel"], obs_weight=j["obs_weight"],
        obs_valid=j["obs_valid"],
        po_frame=j["po_frame"].astype(jnp.int32), po_pw=j["po_pw"],
        po_pixel=j["po_pixel"], po_weight=j["po_weight"],
        po_valid=j["po_valid"])
    pt = PriorTables(frame=j["pt_frame"].astype(jnp.int32),
                     pose=j["pt_pose"], weight=j["pt_weight"],
                     valid=j["pt_valid"])
    return params, vt, pt


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


class _TablePacker:
    """Flattens every window-BA table into TWO host buffers (one f32,
    one i32), unpacked by static slicing inside the jitted solve entry.

    Why: the axon relay enters a slow per-call mode after the first
    device->host fetch of a computed result (measured: ~1-4 ms of
    enqueue per device_put afterwards, vs ~0.04 ms before). A dispatch
    that uploads ~25 small tables pays ~10 ms of pure call overhead per
    keyframe; two flat puts pay ~1 ms regardless of table count."""

    def __init__(self, caps: WindowCaps, use_imu: bool):
        K, L, F, G, Q = caps.K, caps.L, caps.F, caps.G, caps.Q
        M = K - 1
        f = [("poses", (K, 7)), ("vel", (K, 3)), ("bias", (K, 6)),
             ("inv_depth", (L,)), ("lm_first_ob", (L, 2)),
             ("lm_left_ob", (L, 2)), ("lm_weight", (L,)),
             ("obs_pixel", (F, 2)), ("obs_weight", (F,)),
             ("po_pw", (G, 3)), ("po_pixel", (G, 2)), ("po_weight", (G,)),
             ("pt_pose", (Q, 7)), ("pt_weight", (Q,))]
        i = [("lm_anchor", (L,)), ("obs_lm", (F,)), ("obs_frame", (F,)),
             ("po_frame", (G,)), ("pt_frame", (Q,)), ("lm_valid", (L,)),
             ("obs_valid", (F,)), ("po_valid", (G,)), ("pt_valid", (Q,)),
             ("kf_valid", (K,)), ("kf_fixed", (K,))]
        if use_imu:
            # covariance rides instead of sqrt-info: the 15x15 LLT moves
            # into the device program (the host-side conversion was a
            # full blocking fetch per keyframe)
            f += [("imu_dp", (M, 3)), ("imu_dq", (M, 4)),
                  ("imu_dv", (M, 3)), ("imu_sum_dt", (M,)),
                  ("imu_jac", (M, 15, 15)), ("imu_cov", (M, 15, 15)),
                  ("imu_lin_ba", (M, 3)), ("imu_lin_bg", (M, 3))]
            i += [("imu_valid", (M,))]
        self.f_specs, self.i_specs = f, i
        self.f_len = sum(int(np.prod(s)) for _, s in f)
        self.i_len = sum(int(np.prod(s)) for _, s in i)

    def pack(self, d: dict):
        fbuf = np.zeros(self.f_len, np.float32)
        ibuf = np.zeros(self.i_len, np.int32)
        for buf, specs, dt in ((fbuf, self.f_specs, np.float32),
                               (ibuf, self.i_specs, np.int32)):
            o = 0
            for name, shape in specs:
                n = int(np.prod(shape))
                buf[o:o + n] = np.asarray(d[name]).astype(dt).ravel()
                o += n
        return fbuf, ibuf

    def unpack(self, fbuf, ibuf) -> dict:
        """Static-sliced views (jit-traceable); *_valid/*_fixed come
        back as bool."""
        out = {}
        for buf, specs in ((fbuf, self.f_specs), (ibuf, self.i_specs)):
            o = 0
            for name, shape in specs:
                n = int(np.prod(shape))
                v = buf[o:o + n].reshape(shape)
                o += n
                if name.endswith("_valid") or name.endswith("_fixed"):
                    v = v != 0
                out[name] = v
        return out


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
        self._solve_packed_vo, self._packer_vo = _packed_entry(
            self.solve_vo, caps, False)
        if use_imu:
            from lvio_fusion_tpu.solver.imu_factor import make_imu_linearizer
            self.solve_vio = make_window_ba(
                cam_left, cam_right, num_iters=num_iters, use_imu=True,
                imu_linearizer=imu_linearizer or make_imu_linearizer(),
                packed=True)
            self._solve_packed_vio, self._packer_vio = _packed_entry(
                self.solve_vio, caps, True)
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
        # weak prior on every window kf to its current pose (small weight) —
        # stabilizes kfs that lost most features (backend.cpp:164-178)
        poses0 = np.stack([m.kf_pose[g] for g in kf_idx]).astype(np.float32)
        d = dict(
            lm_anchor=pad(np.asarray(
                [kf_local[int(a)] for a in lm_anchor_g[opt_ids]],
                np.int64), L),
            lm_first_ob=pad(np.stack([m.lm_first_ob[i] for i in opt_ids])
                            if L_act else np.zeros((0, 2)), L),
            lm_left_ob=pad(np.stack([m.lm_left_ob[i] for i in opt_ids])
                           if L_act else np.zeros((0, 2)), L),
            lm_valid=pad(np.ones(L_act, bool), L, False),
            lm_weight=pad(
                self.stereo_weight_mul
                * np.asarray([m.kf_weights[a][0]
                              for a in lm_anchor_g[opt_ids]], np.float32)
                if L_act else np.zeros(0), L),
            obs_lm=pad(tf_lm, F), obs_frame=pad(tf_kf, F),
            obs_pixel=pad(tf_px, F), obs_weight=pad(vis_w[tf_kf], F),
            obs_valid=pad(np.ones(len(tf_lm), bool), F, False),
            po_frame=pad(po_kf, G), po_pw=pad(po_pw, G),
            po_pixel=pad(po_px, G), po_weight=pad(vis_w[po_kf], G),
            po_valid=pad(np.ones(len(po_kf), bool), G, False),
            pt_frame=pad(np.arange(K_act), Q),
            pt_pose=pad(poses0, Q),
            pt_weight=pad(np.full(K_act, 0.1), Q),
            pt_valid=pad(np.ones(K_act, bool), Q, False),
            poses=pad(poses0, K),
            vel=pad(np.stack([m.kf_vel[g] for g in kf_idx]), K),
            bias=pad(np.stack([m.kf_bias[g] for g in kf_idx]), K),
            inv_depth=pad(
                np.asarray([m.lm_inv_depth[i] for i in opt_ids], np.float32)
                if L_act else np.zeros(0), L, 1.0),
            kf_valid=pad(np.ones(K_act, bool), K, False),
            kf_fixed=np.eye(1, K, 0, dtype=bool)[0],
        )

        use_vio = self.use_imu and imu_ready
        if use_vio and imu_tables is not None:
            # externally-supplied tables: legacy unpacked path
            params, vt, pt = _tables_from_dict(d)
            flat = self.solve_vio(params, vt, pt,
                                  jnp.asarray(d["kf_valid"]),
                                  jnp.asarray(d["kf_fixed"]), imu_tables)
        elif use_vio:
            d.update(self._build_imu_dict(m, kf_idx))
            fbuf, ibuf = self._packer_vio.pack(d)
            flat = self._solve_packed_vio(fbuf, ibuf)
        else:
            fbuf, ibuf = self._packer_vo.pack(d)
            flat = self._solve_packed_vo(fbuf, ibuf)
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

    def _build_imu_dict(self, m: HostMap, kf_idx) -> dict:
        """Numpy IMU factor slabs for the packed dispatch (covariance in
        place of sqrt-info — the LLT runs inside the device program)."""
        M = self.caps.K - 1
        d = dict(
            imu_dp=np.zeros((M, 3), np.float32),
            imu_dq=np.zeros((M, 4), np.float32),
            imu_dv=np.zeros((M, 3), np.float32),
            imu_sum_dt=np.ones((M,), np.float32),
            imu_jac=np.tile(np.eye(15, dtype=np.float32), (M, 1, 1)),
            imu_cov=np.tile(np.eye(15, dtype=np.float32), (M, 1, 1)),
            imu_lin_ba=np.zeros((M, 3), np.float32),
            imu_lin_bg=np.zeros((M, 3), np.float32),
            imu_valid=np.zeros((M,), bool),
        )
        d["imu_dq"][:, 0] = 1.0
        for s, (gi, gj) in enumerate(zip(kf_idx[:-1], kf_idx[1:])):
            if s >= M:
                break
            p = m.kf_preint[gj]
            if p is None or not (m.kf_good_imu[gi] and m.kf_good_imu[gj]):
                continue
            d["imu_dp"][s], d["imu_dq"][s], d["imu_dv"][s] = \
                p["dp"], p["dq"], p["dv"]
            d["imu_sum_dt"][s] = p["sum_dt"]
            d["imu_jac"][s], d["imu_cov"][s] = p["jac"], p["cov"]
            d["imu_lin_ba"][s], d["imu_lin_bg"][s] = p["lin_ba"], p["lin_bg"]
            d["imu_valid"][s] = True
        return d

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
