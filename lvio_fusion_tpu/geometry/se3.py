"""SE(3) rigid transforms as 7-vectors ``[qw, qx, qy, qz, tx, ty, tz]``.

Batched, jit/vmap/grad-safe. The tangent (twist) ordering is ``[phi, rho]``:
rotation first, then translation — the solver's pose parameter blocks use this
6-dof tangent with a LEFT-multiplicative retraction (``se3_boxplus``):
``T' = exp([dphi, drho]) * T``. Jacobians in the solver come from jax.jacfwd
through this retraction, so no hand derivation is needed anywhere.

Parity target: Sophus SE3d semantics as used throughout the reference
(e.g. frame poses `frame.h:44`, relative-pose math `ceres/base.hpp:10-92`).
"""

from __future__ import annotations

import jax.numpy as jnp

from lvio_fusion_tpu.geometry.so3 import (
    exp_so3,
    log_so3,
    quat_conj,
    quat_identity,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
    quat_to_rpy,
    rpy_to_quat,
    slerp,
)

_EPS = 1e-8


def se3_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def se3_make(q, t):
    return jnp.concatenate([q, t], axis=-1)


def se3_q(T):
    return T[..., :4]


def se3_t(T):
    return T[..., 4:]


def se3_mul(T1, T2):
    """Compose: (T1 * T2) acts as T1 after T2."""
    q1, t1 = T1[..., :4], T1[..., 4:]
    q2, t2 = T2[..., :4], T2[..., 4:]
    return se3_make(quat_normalize(quat_mul(q1, q2)), quat_rotate(q1, t2) + t1)


def se3_inv(T):
    q, t = T[..., :4], T[..., 4:]
    qi = quat_conj(q)
    return se3_make(qi, -quat_rotate(qi, t))


def se3_apply(T, p):
    """Transform 3-point(s): R p + t."""
    return quat_rotate(T[..., :4], p) + T[..., 4:]


def se3_exp(xi):
    """Twist (..., 6) ``[phi, rho]`` -> SE3. Uses the exact V matrix."""
    phi, rho = xi[..., :3], xi[..., 3:]
    q = exp_so3(phi)
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)  # NaN-safe grad at 0
    theta = jnp.sqrt(theta2_safe)
    # V = I + (1-cos)/t^2 [phi]x + (t - sin t)/t^3 [phi]x^2
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2_safe * theta))
    px = jnp.cross(phi, rho)
    ppx = jnp.cross(phi, px)
    t = rho + a * px + b * ppx
    return se3_make(q, t)


def se3_log(T):
    """SE3 -> twist (..., 6) ``[phi, rho]`` (inverse of se3_exp)."""
    q, t = T[..., :4], T[..., 4:]
    phi = log_so3(q)
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)  # NaN-safe grad at 0
    theta = jnp.sqrt(theta2_safe)
    half = 0.5 * theta
    # V^{-1} = I - 1/2 [phi]x + c [phi]x^2,  c = (1 - t cos(t/2)/(2 sin(t/2)))/t^2
    cot_term = half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)
    c = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - cot_term) / theta2_safe)
    px = jnp.cross(phi, t)
    ppx = jnp.cross(phi, px)
    rho = t - 0.5 * px + c * ppx
    return jnp.concatenate([phi, rho], axis=-1)


def se3_boxplus(T, xi):
    """Left-multiplicative retraction used by the LM solver: exp(xi) * T."""
    return se3_mul(se3_exp(xi), T)


def se3_slerp(T0, T1, alpha):
    """Interpolate pose (slerp on rotation, lerp on translation).

    Semantics of reference utility.cpp:125-130 / Map::ComputePose.
    """
    q = slerp(T0[..., :4], T1[..., :4], alpha)
    t = (1.0 - alpha) * T0[..., 4:] + alpha * T1[..., 4:]
    return se3_make(q, t)


def se3_to_mat(T):
    """SE3 -> homogeneous (..., 4, 4) matrix."""
    R = quat_to_mat(T[..., :4])
    t = T[..., 4:]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rpyxyz_to_se3(rpyxyz):
    """[roll, pitch, yaw, x, y, z] -> SE3 7-vector.

    Mirrors the reference's scalar-DoF pose parameterization used by the
    lidar RPZ/YXY split factors and navsat refinement (ceres/base.hpp:119-150).
    """
    q = rpy_to_quat(rpyxyz[..., :3])
    return se3_make(q, rpyxyz[..., 3:])


def se3_to_rpyxyz(T):
    return jnp.concatenate([quat_to_rpy(T[..., :4]), T[..., 4:]], axis=-1)


def se3_relative(T_i, T_j):
    """Relative transform taking j to i: T_i^{-1} * T_j."""
    return se3_mul(se3_inv(T_i), T_j)
