"""Visual-inertial initialization.

Functional equivalent of the reference Initializer (initializer.cpp:10-130
+ imu/tools.cpp): from a visually-initialized keyframe trajectory and the
preintegrations between keyframes, estimate per-kf velocities, shared
gyro/accel biases, and the gravity direction, then hand back the rotation
that gravity-aligns the world frame (Map::ApplyGravityRotation).

Stage 1 (EstimateVelAndRwg): velocities from pose differences, gravity
direction from the mean specific-force integral.
Stage 2 (InertialOptimization): small dense GN over [Rwg(3), bg(3), ba(3),
v(3K)] minimizing the 9-dim preintegration residuals with gravity rotated
by Rwg — a few dozen parameters, one fused jit program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lvio_fusion_tpu.geometry.so3 import (
    exp_so3, g2R, quat_conj, quat_mul, quat_normalize, quat_rotate,
)
from lvio_fusion_tpu.ops.imu_preint import Preintegration


class InertialInit(NamedTuple):
    vel: jnp.ndarray      # (K, 3) world-frame velocities
    bg: jnp.ndarray       # (3,) shared gyro bias
    ba: jnp.ndarray       # (3,) shared accel bias
    rwg: jnp.ndarray      # (4,) quaternion: rotates gravity dir -> world
    cost: jnp.ndarray


def _residuals(rwg_t, bg, ba, vel, poses, pre: Preintegration, g_norm,
               rwg0):
    """Stacked 9-dim residuals over consecutive pairs.

    pre: batched Preintegration with leading dim M = K-1.
    """
    K = poses.shape[0]
    rwg = quat_normalize(quat_mul(rwg0, exp_so3(rwg_t)))
    g = quat_rotate(rwg, jnp.array([0.0, 0.0, g_norm], dtype=poses.dtype))

    def one(i):
        qi, pi = poses[i, :4], poses[i, 4:]
        qj, pj = poses[i + 1, :4], poses[i + 1, 4:]
        qi_inv = quat_conj(qi)
        t = pre.sum_dt[i]
        dba = ba - pre.lin_ba[i]
        dbg = bg - pre.lin_bg[i]
        dq_dbg = pre.jac[i, 3:6, 12:15]
        dv_dba = pre.jac[i, 6:9, 9:12]
        dv_dbg = pre.jac[i, 6:9, 12:15]
        dp_dba = pre.jac[i, 0:3, 9:12]
        dp_dbg = pre.jac[i, 0:3, 12:15]
        cdq = quat_normalize(quat_mul(pre.dq[i], exp_so3(dq_dbg @ dbg)))
        cdv = pre.dv[i] + dv_dba @ dba + dv_dbg @ dbg
        cdp = pre.dp[i] + dp_dba @ dba + dp_dbg @ dbg
        r_p = quat_rotate(qi_inv, 0.5 * g * t * t + pj - pi - vel[i] * t) - cdp
        r_q = 2.0 * quat_mul(quat_conj(cdq), quat_mul(qi_inv, qj))[1:]
        r_v = quat_rotate(qi_inv, g * t + vel[i + 1] - vel[i]) - cdv
        # weight rotation strongly (it pins bg), velocity/position evenly
        return jnp.concatenate([r_p, 100.0 * r_q, r_v])

    return jax.vmap(one)(jnp.arange(K - 1)).reshape(-1)


def inertial_init(poses, pre: Preintegration, g_norm, iters: int = 10,
                  prior_bg: float = 1.0, prior_ba: float = 10.0):
    """Run the two-stage inertial-only initialization.

    poses: (K, 7) keyframe poses from the visual pipeline.
    pre:   batched Preintegration between consecutive kfs (leading dim K-1).
    """
    K = poses.shape[0]
    dtype = poses.dtype

    # TPU matmuls default to bf16 multiplies (f32 accumulate), which is
    # fatal for this stiff 9+3K-dim normal solve: measured on the axon
    # chip, the DEFAULT-precision solve returns |v| ~ 23 m/s on a
    # ground-truth 1.4 m/s window (CPU: 1.65) and silently poisons VI
    # init. Pin full-f32 multiplies for everything traced here — the
    # system is tiny, so the extra MXU passes are free.
    with jax.default_matmul_precision("highest"):
        return _inertial_init_impl(poses, pre, g_norm, iters,
                                   prior_bg, prior_ba, K, dtype)


def _inertial_init_impl(poses, pre, g_norm, iters, prior_bg, prior_ba,
                        K, dtype):
    # ---- stage 1: closed-form guesses (initializer.cpp:10-29) ----
    dts = pre.sum_dt
    dpos = poses[1:, 4:] - poses[:-1, 4:]
    v_guess = dpos / dts[:, None]
    vel0 = jnp.concatenate([v_guess, v_guess[-1:]], axis=0)
    # gravity direction: mean of R_i * dv_i  (specific-force integral)
    dirG = jnp.sum(jax.vmap(quat_rotate)(poses[:-1, :4], pre.dv), axis=0)
    dirG = -dirG / jnp.maximum(jnp.linalg.norm(dirG), 1e-6)
    # rwg0: rotation taking (0,0,1) to measured "up" = -dirG... reference
    # g2R computes the world-aligning rotation; here rwg rotates the nominal
    # +g vector into the frame where the residual lives.
    rwg0 = quat_conj(g2R(-dirG))

    # ---- stage 2: GN over [rwg_t(3), bg(3), ba(3), vel(3K)] ----
    def pack(rwg_t, bg, ba, vel):
        return jnp.concatenate([rwg_t, bg, ba, vel.reshape(-1)])

    def unpack(x):
        return x[:3], x[3:6], x[6:9], x[9:].reshape(K, 3)

    def full_res(x):
        rwg_t, bg, ba, vel = unpack(x)
        r = _residuals(rwg_t, bg, ba, vel, poses, pre, g_norm, rwg0)
        # soft priors keep biases physical (tools.cpp priors)
        return jnp.concatenate([r, prior_bg * bg, prior_ba * ba])

    x = pack(jnp.zeros(3, dtype), jnp.zeros(3, dtype), jnp.zeros(3, dtype),
             vel0)

    def gn(x, _):
        r = full_res(x)
        J = jax.jacfwd(full_res)(x)
        H = J.T @ J
        d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-10))
        Hs = H / d[:, None] / d[None, :] + 1e-6 * jnp.eye(H.shape[0], dtype=dtype)
        dx = jnp.linalg.solve(Hs, -(J.T @ r) / d) / d
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return x + dx, 0.5 * jnp.sum(r * r)

    x, costs = jax.lax.scan(gn, x, None, length=iters)
    rwg_t, bg, ba, vel = unpack(x)
    rwg = quat_normalize(quat_mul(rwg0, exp_so3(rwg_t)))
    cost = 0.5 * jnp.sum(full_res(x) ** 2)
    return InertialInit(vel=vel, bg=bg, ba=ba, rwg=rwg, cost=cost)


def gravity_alignment(rwg, g_norm):
    """World-frame correction R_align = rwg^{-1}: applying it to all poses
    gravity-aligns the map (Map::ApplyGravityRotation, map.cpp:104-113)."""
    return quat_conj(rwg)
