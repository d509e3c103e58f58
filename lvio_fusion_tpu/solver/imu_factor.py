"""IMU preintegration factor for the window BA solver.

15-dim residual between consecutive keyframes weighted by the sqrt
information from the propagated covariance — math parity with the
reference's analytic ImuError (ceres/imu_error.hpp:12-122,
preintegration.cpp:144-188). Jacobians come from vmapped jacfwd through
the same 15-dim tangent the assembler uses ([pose(6) | v(3) | ba,bg(6)]),
so no hand-derived blocks are needed.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp

from lvio_fusion_tpu.geometry.se3 import se3_boxplus
from lvio_fusion_tpu.geometry.so3 import (
    exp_so3, quat_conj, quat_mul, quat_normalize, quat_rotate,
)
from lvio_fusion_tpu.solver.assemble import Contribution
from lvio_fusion_tpu.utils.memo import builder_memo


@flax.struct.dataclass
class ImuFactorTables:
    """Stacked preintegrations between consecutive window keyframes (M,)."""

    frame_i: jnp.ndarray   # (M,) int32
    frame_j: jnp.ndarray   # (M,) int32
    dp: jnp.ndarray        # (M, 3)
    dq: jnp.ndarray        # (M, 4)
    dv: jnp.ndarray        # (M, 3)
    sum_dt: jnp.ndarray    # (M,)
    jac: jnp.ndarray       # (M, 15, 15)
    sqrt_info: jnp.ndarray  # (M, 15, 15) upper-triangular L^T of cov^-1
    lin_ba: jnp.ndarray    # (M, 3)
    lin_bg: jnp.ndarray    # (M, 3)
    valid: jnp.ndarray     # (M,) bool
    g_norm: jnp.ndarray    # scalar gravity magnitude


def sqrt_info_from_cov(cov, eps: float = 1e-8):
    """Upper-triangular sqrt information: chol(cov^-1)^T with damping."""
    n = cov.shape[-1]
    covd = cov + eps * jnp.eye(n, dtype=cov.dtype)
    info = jnp.linalg.inv(covd)
    # symmetrize for a stable cholesky
    info = 0.5 * (info + jnp.swapaxes(info, -1, -2))
    L = jnp.linalg.cholesky(info)
    L = jnp.where(jnp.isfinite(L), L, 0.0)
    return jnp.swapaxes(L, -1, -2)


def imu_residual(xi_i, xi_j, pose_i, vel_i, bias_i, pose_j, vel_j, bias_j,
                 dp, dq, dv, sum_dt, dp_dba, dp_dbg, dq_dbg, dv_dba, dv_dbg,
                 lin_ba, lin_bg, sqrt_info, g_norm):
    """15-dim residual [p, r, v, ba, bg] (preintegration.cpp:144-165)."""
    T_i = se3_boxplus(pose_i, xi_i[:6])
    T_j = se3_boxplus(pose_j, xi_j[:6])
    Vi = vel_i + xi_i[6:9]
    Vj = vel_j + xi_j[6:9]
    Bai = bias_i[:3] + xi_i[9:12]
    Bgi = bias_i[3:] + xi_i[12:15]
    Baj = bias_j[:3] + xi_j[9:12]
    Bgj = bias_j[3:] + xi_j[12:15]

    qi, pi = T_i[:4], T_i[4:]
    qj, pj = T_j[:4], T_j[4:]
    qi_inv = quat_conj(qi)
    g = jnp.array([0.0, 0.0, 1.0], dtype=pose_i.dtype) * g_norm
    t = sum_dt

    dba = Bai - lin_ba
    dbg = Bgi - lin_bg
    cdq = quat_normalize(quat_mul(dq, exp_so3(dq_dbg @ dbg)))
    cdv = dv + dv_dba @ dba + dv_dbg @ dbg
    cdp = dp + dp_dba @ dba + dp_dbg @ dbg

    r_p = quat_rotate(qi_inv, 0.5 * g * t * t + pj - pi - Vi * t) - cdp
    r_q = 2.0 * quat_mul(quat_conj(cdq), quat_mul(qi_inv, qj))[1:]
    r_v = quat_rotate(qi_inv, g * t + Vj - Vi) - cdv
    r_ba = Baj - Bai
    r_bg = Bgj - Bgi
    r = jnp.concatenate([r_p, r_q, r_v, r_ba, r_bg])
    return sqrt_info @ r


@builder_memo
def make_imu_linearizer():
    """Returns linearize(params, tables) -> [Contribution] for window BA."""

    def linearize(params, t: ImuFactorTables):
        dtype = params.poses.dtype
        M = t.frame_i.shape[0]
        pose_i = params.poses[t.frame_i]
        pose_j = params.poses[t.frame_j]
        vel_i = params.vel[t.frame_i]
        vel_j = params.vel[t.frame_j]
        bias_i = params.bias[t.frame_i]
        bias_j = params.bias[t.frame_j]

        J = t.jac
        sl = lambda a, b: J[:, a:a + 3, b:b + 3]

        def f(xi_i, xi_j, p_i, v_i, b_i, p_j, v_j, b_j, dp, dq, dv, sdt,
              dpa, dpg, dqg, dva, dvg, lba, lbg, si):
            return imu_residual(xi_i, xi_j, p_i, v_i, b_i, p_j, v_j, b_j,
                                dp, dq, dv, sdt, dpa, dpg, dqg, dva, dvg,
                                lba, lbg, si, t.g_norm)

        z = jnp.zeros((M, 15), dtype)
        args = (pose_i, vel_i, bias_i, pose_j, vel_j, bias_j,
                t.dp, t.dq, t.dv, t.sum_dt,
                sl(0, 9), sl(0, 12), sl(3, 12), sl(6, 9), sl(6, 12),
                t.lin_ba, t.lin_bg, t.sqrt_info)
        r = jax.vmap(f)(z, z, *args)
        Ji, Jj = jax.vmap(jax.jacfwd(f, argnums=(0, 1)))(z, z, *args)
        return [Contribution(r=r, pose_idx=(t.frame_i, t.frame_j),
                             pose_jacs=(Ji, Jj), lm_idx=None, lm_jac=None,
                             valid=t.valid)]

    return linearize
