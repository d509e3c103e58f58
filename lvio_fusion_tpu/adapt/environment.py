"""Offline RL environment: re-optimize keyframes under candidate weights.

Functional equivalent of the reference adapt::Environment
(environment.cpp + adapt/environment.h): after a finished run whose map
poses are reset to ground truth, each env instance replays ``horizon``
consecutive keyframes from a random start; ``step(weights)`` re-solves the
keyframe pose with the given factor weights (pose-only visual solve, then
the lidar two-stage refine) and rewards the inverse relative translation
error vs ground truth (environment.cpp:117-132).

TPU-native design: all per-keyframe factor tables are pre-stacked into
fixed-shape device tensors at construction, and the env step is ONE
batched jitted program over all env instances — the replacement for the
reference's 8-100 DummyVectorEnv processes, and the axis that shards over
the device mesh for multi-chip RL training.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from lvio_fusion_tpu.utils.memo import builder_memo

from lvio_fusion_tpu.adapt.observation import (
    OBS_DIM, action_to_weights, observation_grid,
)
from lvio_fusion_tpu.core.frontend import pose_only_refine
from lvio_fusion_tpu.geometry.se3 import se3_inv, se3_mul, se3_to_rpyxyz
from lvio_fusion_tpu.lidar.mapping import _masked_gn, dof_masks
from lvio_fusion_tpu.utils.precision import f32_solver


@flax.struct.dataclass
class EnvTables:
    """Pre-stacked per-keyframe solve inputs (K keyframes)."""

    poses_gt: jnp.ndarray     # (K, 7) ground-truth poses
    poses_prev: jnp.ndarray   # (K, 7) previous-kf gt poses
    poses_init: jnp.ndarray   # (K, 7) solve initialization (gt, or a
    # drift-perturbed variant for training against realistic map error)
    # frozen IMU factor inputs (environment.cpp:45-71: all IMU-side states
    # held constant; only the current pose varies)
    imu_dp: jnp.ndarray       # (K, 3)
    imu_dq: jnp.ndarray       # (K, 4)
    imu_dv: jnp.ndarray       # (K, 3)
    imu_dt: jnp.ndarray       # (K,)
    imu_jac: jnp.ndarray      # (K, 15, 15)
    imu_sqrt_info: jnp.ndarray  # (K, 15, 15)
    vel_prev: jnp.ndarray     # (K, 3)
    vel_cur: jnp.ndarray      # (K, 3)
    bias_cur: jnp.ndarray     # (K, 6)
    has_imu: jnp.ndarray      # (K,)
    g_norm: jnp.ndarray       # scalar
    obs_px: jnp.ndarray       # (K, F, 2) left-cam observations
    obs_world: jnp.ndarray    # (K, F, 3) landmark world positions
    obs_valid: jnp.ndarray    # (K, F)
    obs_grid: jnp.ndarray     # (K, OBS_DIM) precomputed observations
    ground: jnp.ndarray       # (K, G, 3) body-frame ground points
    ground_valid: jnp.ndarray
    surf: jnp.ndarray         # (K, S, 3)
    surf_valid: jnp.ndarray
    map_ground: jnp.ndarray   # (K, M, 3) world-frame local maps
    map_ground_valid: jnp.ndarray
    map_surf: jnp.ndarray
    map_surf_valid: jnp.ndarray
    has_lidar: jnp.ndarray    # (K,)


class EnvState(NamedTuple):
    kf: jnp.ndarray    # (B,) int32 current keyframe per env
    t: jnp.ndarray     # (B,) int32 steps taken
    key: jnp.ndarray


def _imu_pose_residual(tables: EnvTables, kf, pose):
    """Frozen-IMU 15-dim residual as a function of the current pose only
    (previous pose/vel/bias and current vel/bias constant)."""
    from lvio_fusion_tpu.solver.imu_factor import imu_residual
    J = tables.imu_jac[kf]
    z = jnp.zeros(15, pose.dtype)
    return imu_residual(
        z, jnp.concatenate([jnp.zeros(6, pose.dtype),
                            jnp.zeros(9, pose.dtype)]),
        tables.poses_prev[kf], tables.vel_prev[kf], tables.bias_cur[kf],
        pose, tables.vel_cur[kf], tables.bias_cur[kf],
        tables.imu_dp[kf], tables.imu_dq[kf], tables.imu_dv[kf],
        tables.imu_dt[kf],
        J[0:3, 9:12], J[0:3, 12:15], J[3:6, 12:15],
        J[6:9, 9:12], J[6:9, 12:15],
        tables.bias_cur[kf][:3], tables.bias_cur[kf][3:],
        tables.imu_sqrt_info[kf], tables.g_norm)


@f32_solver
def _solve_one(tables: EnvTables, kf, weights, cam, up_axis, resolution):
    """Re-optimize one keyframe pose under the given weights."""
    init = tables.poses_init[kf]  # gt like the reference, or the drifted
    # variant (weights then have to pull the solve back toward gt)

    # visual (weight[0]) + frozen IMU factor, pose-only GN
    from lvio_fusion_tpu.geometry.se3 import se3_boxplus

    def residual(xi, pose):
        T = se3_boxplus(pose, xi)
        pred = jax.vmap(lambda p: cam.world2pixel(p, T))(
            tables.obs_world[kf])
        rv = ((pred - tables.obs_px[kf])
              * tables.obs_valid[kf][:, None] * weights[0]).reshape(-1)
        ri = _imu_pose_residual(tables, kf, T) \
            * tables.has_imu[kf].astype(pose.dtype)
        return jnp.concatenate([rv, ri])

    def gn(pose, _):
        z = jnp.zeros(6, pose.dtype)
        r = residual(z, pose)
        Jm = jax.jacfwd(residual)(z, pose)
        H = Jm.T @ Jm + 1e-4 * jnp.eye(6, dtype=pose.dtype)
        d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-10))
        dx = jnp.linalg.solve(H / d[:, None] / d[None, :],
                              -(Jm.T @ r) / d) / d
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return se3_boxplus(pose, dx), None

    pose, _ = jax.lax.scan(gn, init, None, length=4)
    # weight-blend: the visual weight scales how much we trust the visual
    # solution (Huber-solved); then lidar stages with their own weights
    g_mask, s_mask = dof_masks(up_axis)
    w_vis = weights[0]
    thr_g = (resolution ** 2) * 100.0
    thr_s = (resolution ** 2) * 25.0

    def with_lidar(pose):
        p1, _ = _masked_gn(pose, pose, tables.ground[kf],
                           tables.ground_valid[kf], tables.map_ground[kf],
                           tables.map_ground_valid[kf], g_mask, thr_g,
                           weights[1], w_vis * 0.01, 4)
        p2, _ = _masked_gn(p1, pose, tables.surf[kf],
                           tables.surf_valid[kf], tables.map_surf[kf],
                           tables.map_surf_valid[kf], s_mask, thr_s,
                           weights[2], w_vis * 0.01, 4)
        return p2

    pose = jax.lax.cond(tables.has_lidar[kf], with_lidar, lambda p: p, pose)
    return pose


def _reward(result, gt, base):
    """min(100, 1/||rel translation error ratio||)
    (environment.cpp:117-132)."""
    err = se3_to_rpyxyz(se3_mul(se3_inv(gt), result))[3:]
    rel = se3_to_rpyxyz(se3_mul(se3_inv(base), gt))[3:]
    # guard each axis at 1% of the step length: purely lateral axes of a
    # straight trajectory otherwise blow the ratio up and flatten the
    # reward signal (the reference divides by raw rel components)
    floor = 0.01 * jnp.maximum(jnp.linalg.norm(rel), 1e-3)
    denom = jnp.where(jnp.abs(rel) < floor, floor, jnp.abs(rel))
    ratio = err / denom
    return jnp.minimum(100.0, 1.0 / jnp.maximum(
        jnp.linalg.norm(ratio), 1e-2))



@builder_memo
def _make_env_fns(cam, num_envs: int, horizon: int, up_axis: str,
                  resolution: float, weight_reg: float):
    """Jitted (reset, step) for VectorEnv, taking the EnvTables as an
    argument so all envs with same-shaped tables share one trace."""
    from lvio_fusion_tpu.adapt.observation import default_weights
    log_def = jnp.log10(default_weights(float(cam.fx)))

    @jax.jit
    def reset(tables, key):
        K = tables.poses_gt.shape[0]
        k1, key = jax.random.split(key)
        start = jax.random.randint(k1, (num_envs,), 1,
                                   max(2, K - horizon - 1))
        state = EnvState(kf=start.astype(jnp.int32),
                         t=jnp.zeros(num_envs, jnp.int32), key=key)
        obs = tables.obs_grid[state.kf]
        return state, obs

    @jax.jit
    def step(tables, state: EnvState, actions):
        K = tables.poses_gt.shape[0]
        weights = jax.vmap(action_to_weights)(actions)

        def one(kf, w):
            result = _solve_one(tables, kf, w, cam, up_axis, resolution)
            r = _reward(result, tables.poses_gt[kf],
                        tables.poses_prev[kf])
            reg = jnp.sum((jnp.log10(jnp.maximum(w, 1e-6))
                           - log_def) ** 2)
            return r - weight_reg * reg

        reward = jax.vmap(one)(state.kf, weights)
        kf = jnp.minimum(state.kf + 1, K - 1)
        t = state.t + 1
        done = (t >= horizon) | (kf >= K - 1)
        obs = tables.obs_grid[kf]
        return EnvState(kf, t, state.key), obs, reward, done

    return reset, step


class VectorEnv:
    """Batched env over B instances; all device-side."""

    def __init__(self, tables: EnvTables, cam, num_envs: int,
                 horizon: int = 10, up_axis: str = "z",
                 resolution: float = 0.2, weight_reg: float = 0.0):
        """``weight_reg``: reward-shaping coefficient penalizing the
        squared log10-distance of the chosen weights from the per-frame
        defaults. The raw ratio reward is a pose-only PROXY for the real
        pipeline — unshaped, it tolerates extreme lidar weights that
        measurably hurt end-to-end ATE when the policy drives the full
        window BA + scan-to-map stages."""
        self.tables = tables
        self.B = num_envs
        self.horizon = horizon
        reset, step = _make_env_fns(cam, num_envs, horizon, up_axis,
                                    resolution, weight_reg)
        # tables ride as a jit ARGUMENT (pytree of device arrays): env
        # instances over different drift realizations / train-eval splits
        # of the same map share one traced program (utils/memo.py)
        self.reset = lambda key: reset(tables, key)
        self.step = lambda state, actions: step(tables, state, actions)


def drift_init(poses_gt: np.ndarray, drift: float,
               drift_seed: int) -> np.ndarray:
    """Drift-perturbed solve initialization: a random-walk translation of
    ``drift`` meters per traveled meter on top of the gt poses (the same
    walk ``tables_from_map`` applies)."""
    poses_init = np.asarray(poses_gt).copy()
    K = len(poses_init)
    if drift > 0 and K > 1:
        rng = np.random.default_rng(drift_seed)
        step_len = np.linalg.norm(poses_init[1:, 4:] - poses_init[:-1, 4:],
                                  axis=-1)
        walk = np.cumsum(rng.normal(0, 1, (K - 1, 3))
                         * (drift * step_len)[:, None], axis=0)
        poses_init[1:, 4:] += walk.astype(np.float32)
    return poses_init


def with_drift(tables: EnvTables, drift: float,
               drift_seed: int) -> EnvTables:
    """Re-seed a table set's drift realization WITHOUT rebuilding the
    (drift-independent) keyframe tables — only ``poses_init`` depends on
    the drift walk. Evaluating a policy over many held-out realizations
    then costs one ``tables_from_map`` total instead of one per seed."""
    return tables.replace(poses_init=jnp.asarray(
        drift_init(np.asarray(tables.poses_gt), drift, drift_seed)))


def stack_realizations(tables_list) -> EnvTables:
    """Concatenate table sets along the keyframe axis (scalar g_norm kept
    from the first): R same-shaped realizations become ONE EnvTables of
    K' = R*K keyframes, so a batched env can evaluate every realization
    in a single jitted step program. Env start indices must stay within
    one realization's [r*K, (r+1)*K) span (rollouts walk kf+1)."""
    first = tables_list[0]
    return jax.tree.map(
        lambda *xs: xs[0] if np.ndim(xs[0]) == 0
        else jnp.concatenate(xs, axis=0), *tables_list)


def tables_from_map(m, gt_times, gt_poses, cam_right, caps=None,
                    height: int = 240, width: int = 360,
                    lidar_mapping=None, drift: float = 0.0,
                    drift_seed: int = 0) -> EnvTables:
    """Build EnvTables from a finished HostMap + TUM ground truth
    (Environment::Init semantics: poses := ground truth).

    ``drift`` > 0 perturbs the SOLVE INITIALIZATION with a random-walk
    translation of that many meters per traveled meter — training then
    rewards weights that pull a drifted pose back to gt, rather than
    weights that merely keep an already-perfect pose (the reference
    trains only on the gt-reset map, environment.h:26-48)."""
    from lvio_fusion_tpu.geometry.se3 import se3_apply, se3_slerp

    K = m.num_kfs
    F = caps.get("F", 256) if caps else 256
    G = caps.get("G", 512) if caps else 512
    S = caps.get("S", 512) if caps else 512
    M = caps.get("M", 2048) if caps else 2048

    def gt_at(t):
        i = np.searchsorted(gt_times, t)
        i = np.clip(i, 1, len(gt_times) - 1)
        a = (t - gt_times[i - 1]) / max(gt_times[i] - gt_times[i - 1], 1e-9)
        return np.asarray(se3_slerp(jnp.asarray(gt_poses[i - 1]),
                                    jnp.asarray(gt_poses[i]),
                                    float(np.clip(a, 0, 1))))

    poses_gt = np.stack([gt_at(t) for t in m.kf_time]).astype(np.float32)
    # Align ground truth into the MAP frame: the estimator's world may be
    # gravity-rotated (VI init) or otherwise rigidly offset from the GT
    # frame, while obs_world / lidar tables live in the map frame. Without
    # this, no solve can approach "gt" and the ratio reward is ~0 for
    # every action (no learning signal). Rigid Umeyama (no scale) over
    # keyframe positions.
    if K >= 3:
        from lvio_fusion_tpu.utils import np_se3
        P = poses_gt[:, 4:]
        Q = np.stack(m.kf_pose)[:, 4:].astype(np.float32)
        mu_p, mu_q = P.mean(0), Q.mean(0)
        U, _, Vt = np.linalg.svd((Q - mu_q).T @ (P - mu_p))
        refl = np.eye(3)
        refl[2, 2] = np.sign(np.linalg.det(U @ Vt))
        R = (U @ refl @ Vt).astype(np.float32)
        # R,t as an SE3 (quaternion wxyz) applied LEFT to every gt pose;
        # Shepperd conversion stays sound for near-180-degree alignments
        q = np_se3.quat_from_mat(R).astype(np.float32)
        t_align = (mu_q - R @ mu_p).astype(np.float32)
        T_align = np.concatenate([q, t_align])
        poses_gt = np.stack([np_se3.se3_mul(T_align, p)
                             for p in poses_gt]).astype(np.float32)
    poses_prev = np.concatenate([poses_gt[:1], poses_gt[:-1]])
    poses_init = drift_init(poses_gt, drift, drift_seed)

    # frozen IMU factor tables
    from lvio_fusion_tpu.models.sensors import GRAVITY
    from lvio_fusion_tpu.solver.imu_factor import sqrt_info_from_cov
    imu_dp = np.zeros((K, 3), np.float32)
    imu_dq = np.zeros((K, 4), np.float32)
    imu_dq[:, 0] = 1.0
    imu_dv = np.zeros((K, 3), np.float32)
    imu_dt = np.ones((K,), np.float32)
    imu_jac = np.tile(np.eye(15, dtype=np.float32), (K, 1, 1))
    imu_si = np.tile(np.eye(15, dtype=np.float32), (K, 1, 1))
    has_imu = np.zeros(K, bool)
    for k in range(K):
        p = m.kf_preint[k]
        if p is None or k == 0:
            continue
        imu_dp[k], imu_dq[k], imu_dv[k] = p["dp"], p["dq"], p["dv"]
        imu_dt[k], imu_jac[k] = p["sum_dt"], p["jac"]
        imu_si[k] = np.asarray(sqrt_info_from_cov(jnp.asarray(p["cov"])))
        has_imu[k] = True
    vel_prev = np.concatenate([np.zeros((1, 3), np.float32),
                               np.stack(m.kf_vel[:-1])]) \
        if K > 1 else np.zeros((K, 3), np.float32)
    vel_cur = np.stack(m.kf_vel).astype(np.float32)
    bias_cur = np.stack(m.kf_bias).astype(np.float32)

    obs_px = np.zeros((K, F, 2), np.float32)
    obs_world = np.zeros((K, F, 3), np.float32)
    obs_valid = np.zeros((K, F), bool)
    obs_grid = np.zeros((K, OBS_DIM), np.float32)
    ground = np.zeros((K, G, 3), np.float32)
    ground_valid = np.zeros((K, G), bool)
    surf = np.zeros((K, S, 3), np.float32)
    surf_valid = np.zeros((K, S), bool)
    map_g = np.zeros((K, M, 3), np.float32)
    map_gv = np.zeros((K, M), bool)
    map_s = np.zeros((K, M, 3), np.float32)
    map_sv = np.zeros((K, M), bool)
    has_lidar = np.zeros(K, bool)

    for k in range(K):
        ids = m.obs_lm[k]
        px = m.obs_px[k]
        ok = m.obs_ok[k]
        n = min(len(ids), F)
        obs_px[k, :n] = px[:n]
        obs_valid[k, :n] = ok[:n]
        if n:
            obs_world[k, :n] = np.stack([m.lm_world[i] for i in ids[:n]])
        # observation grid: previous-kf pixels of the same landmarks
        if k > 0 and n:
            prev_ids = {int(i): j for j, i in enumerate(m.obs_lm[k - 1])}
            prev = np.zeros((n, 2), np.float32)
            seen = np.zeros(n, bool)
            for j, i in enumerate(ids[:n]):
                jj = prev_ids.get(int(i))
                if jj is not None:
                    prev[j] = m.obs_px[k - 1][jj]
                    seen[j] = True
            grid = observation_grid(jnp.asarray(px[:n]), jnp.asarray(prev),
                                    jnp.asarray(seen & ok[:n]),
                                    height, width)
            obs_grid[k] = np.asarray(grid).reshape(-1)
        f = m.kf_lidar[k]
        if f is not None and lidar_mapping is not None:
            ng = min(len(f["ground"]), G)
            ground[k, :ng] = f["ground"][:ng]
            ground_valid[k, :ng] = f["ground_valid"][:ng]
            ns = min(len(f["surf"]), S)
            surf[k, :ns] = f["surf"][:ns]
            surf_valid[k, :ns] = f["surf_valid"][:ns]
            local = lidar_mapping._local_map(k)
            if local is not None:
                (mg, mgv), (ms, msv) = local
                mm = min(mg.shape[0], M)
                map_g[k, :mm] = np.asarray(mg)[:mm]
                map_gv[k, :mm] = np.asarray(mgv)[:mm]
                map_s[k, :mm] = np.asarray(ms)[:mm]
                map_sv[k, :mm] = np.asarray(msv)[:mm]
                has_lidar[k] = True

    return EnvTables(
        poses_gt=jnp.asarray(poses_gt), poses_prev=jnp.asarray(poses_prev),
        poses_init=jnp.asarray(poses_init),
        imu_dp=jnp.asarray(imu_dp), imu_dq=jnp.asarray(imu_dq),
        imu_dv=jnp.asarray(imu_dv), imu_dt=jnp.asarray(imu_dt),
        imu_jac=jnp.asarray(imu_jac), imu_sqrt_info=jnp.asarray(imu_si),
        vel_prev=jnp.asarray(vel_prev), vel_cur=jnp.asarray(vel_cur),
        bias_cur=jnp.asarray(bias_cur), has_imu=jnp.asarray(has_imu),
        g_norm=jnp.float32(GRAVITY),
        obs_px=jnp.asarray(obs_px), obs_world=jnp.asarray(obs_world),
        obs_valid=jnp.asarray(obs_valid), obs_grid=jnp.asarray(obs_grid),
        ground=jnp.asarray(ground), ground_valid=jnp.asarray(ground_valid),
        surf=jnp.asarray(surf), surf_valid=jnp.asarray(surf_valid),
        map_ground=jnp.asarray(map_g), map_ground_valid=jnp.asarray(map_gv),
        map_surf=jnp.asarray(map_s), map_surf_valid=jnp.asarray(map_sv),
        has_lidar=jnp.asarray(has_lidar))
