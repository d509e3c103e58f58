"""SO(3) rotations as unit quaternions, batched & dtype-agnostic.

Convention: quaternions are arrays with trailing dim 4 ordered ``[w, x, y, z]``
(Hamilton convention, right-handed). All ops broadcast over leading dims and
are safe under jit/vmap/grad (no data-dependent branching; small-angle paths
use Taylor switches via jnp.where with NaN-safe guards).

Behavioral parity targets (math semantics, not code) are the reference's
templated quaternion helpers in
/root/reference/src/lvio_fusion/include/lvio_fusion/ceres/base.hpp:10-150 and
utility.h:99-140 (q_delta/skew/R2ypr/g2R etc.); this file is an independent
JAX implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q1, q2):
    """Hamilton product q1 ⊗ q2, broadcasting over leading dims."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, _EPS)
    # canonicalize sign (w >= 0) so log/compose stay on the same chart
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_rotate(q, v):
    """Rotate 3-vector(s) v by quaternion(s) q: R(q) @ v."""
    qv = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_to_mat(q):
    """3x3 rotation matrix from quaternion; trailing dims (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(m):
    """Quaternion from rotation matrix; branch-free Shepperd via 4-way where."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate quaternions (each valid where its pivot dominates)
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    s0 = safe_sqrt(1.0 + tr) * 2  # pivot w
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2  # pivot x
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2  # pivot y
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2  # pivot z
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return quat_normalize(q)


def exp_so3(phi):
    """Exponential map: rotation vector (..., 3) -> unit quaternion (..., 4).

    NaN-safe under grad at phi=0 (double-where guards around sqrt).
    """
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta2 < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))  # guarded sqrt
    half = 0.5 * theta
    # sin(t/2)/t with Taylor fallback 1/2 - t^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([w, k * phi], axis=-1))


def log_so3(q):
    """Log map: unit quaternion (..., 4) -> rotation vector (..., 3)."""
    q = quat_normalize(q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = vn2 < 1e-12
    vn = jnp.sqrt(jnp.where(small, 1.0, vn2))  # guarded sqrt
    angle = 2.0 * jnp.arctan2(vn, w)
    # angle/vn with Taylor fallback (2/w)(1 - vn^2/(3w^2))
    w_safe = jnp.maximum(w, _EPS)
    scale = jnp.where(
        small,
        2.0 / w_safe * (1.0 - vn2 / (3.0 * w_safe * w_safe)),
        angle / vn,
    )
    return scale * v


def slerp(q0, q1, alpha):
    """Spherical interpolation from q0 (alpha=0) to q1 (alpha=1)."""
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    dq = quat_mul(quat_conj(q0), q1)
    return quat_normalize(quat_mul(q0, exp_so3(alpha * log_so3(dq))))


def skew(v):
    """Skew-symmetric matrix [v]_x of (..., 3) -> (..., 3, 3)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def rpy_to_quat(rpy):
    """Roll-pitch-yaw (XYZ intrinsic applied as R = Rz(y) Ry(p) Rx(r)) -> quat.

    Matches the reference's rpy convention (ceres/base.hpp:94-117 composes
    yaw * pitch * roll about z/y/x).
    """
    r, p, y = jnp.moveaxis(rpy, -1, 0)
    zeros = jnp.zeros_like(r)
    qx = exp_so3(jnp.stack([r, zeros, zeros], -1))
    qy = exp_so3(jnp.stack([zeros, p, zeros], -1))
    qz = exp_so3(jnp.stack([zeros, zeros, y], -1))
    return quat_mul(qz, quat_mul(qy, qx))


def quat_to_rpy(q):
    """Quaternion -> roll-pitch-yaw with R = Rz(y) Ry(p) Rx(r)."""
    m = quat_to_mat(q)
    yaw = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    pitch = jnp.arcsin(jnp.clip(-m[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def g2R(g):
    """Rotation taking measured gravity direction g to +z, with yaw zeroed.

    Semantics of reference utility.cpp:91-117 (used by the IMU initializer to
    put the world frame gravity-aligned).
    """
    g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), _EPS)
    ez = jnp.array([0.0, 0.0, 1.0], dtype=g.dtype)
    # rotation aligning g to ez: axis = g x ez, angle = acos(g . ez)
    axis = jnp.cross(g, jnp.broadcast_to(ez, g.shape))
    s = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    c = jnp.sum(g * ez, axis=-1, keepdims=True)
    angle = jnp.arctan2(s, c)
    axis = axis / jnp.maximum(s, _EPS)
    q = exp_so3(angle * axis)
    # zero the yaw component
    rpy = quat_to_rpy(q)
    yaw_only = jnp.stack([jnp.zeros_like(rpy[..., 2]), jnp.zeros_like(rpy[..., 2]), -rpy[..., 2]], -1)
    return quat_mul(rpy_to_quat(yaw_only), q)
