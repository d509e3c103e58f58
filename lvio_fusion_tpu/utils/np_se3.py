"""Pure-numpy SE3/quaternion helpers for host-side bookkeeping.

The estimator's per-frame host logic needs a handful of single-pose
compositions; routing those through jax costs a device dispatch each
(painful when the TPU sits behind a network tunnel). These mirror
geometry/so3.py / se3.py exactly, for scalars only.
"""

from __future__ import annotations

import math

import numpy as np

# The hot helpers below are written in scalar Python-float arithmetic on
# purpose: these run hundreds of times per batch flush on the 1-core
# host, and numpy's tiny-array machinery (np.cross builds moveaxis
# views, np.linalg.norm dispatches through ufunc reduction) costs tens
# of microseconds per call where the plain f64 formula costs well under
# one.


def quat_mul(q1, q2):
    w1, x1, y1, z1 = (float(q1[0]), float(q1[1]), float(q1[2]),
                      float(q1[3]))
    w2, x2, y2, z2 = (float(q2[0]), float(q2[1]), float(q2[2]),
                      float(q2[3]))
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], dtype=np.float64)


def quat_conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]], dtype=np.float64)


def quat_rotate(q, v):
    w, x, y, z = (float(q[0]), float(q[1]), float(q[2]), float(q[3]))
    vx, vy, vz = float(v[0]), float(v[1]), float(v[2])
    # v' = v + w*u + qv x u with u = 2 (qv x v)
    ux = 2.0 * (y * vz - z * vy)
    uy = 2.0 * (z * vx - x * vz)
    uz = 2.0 * (x * vy - y * vx)
    return np.array([vx + w * ux + (y * uz - z * uy),
                     vy + w * uy + (z * ux - x * uz),
                     vz + w * uz + (x * uy - y * ux)], np.float64)


def _norm(q):
    n = math.sqrt(float(q[0]) ** 2 + float(q[1]) ** 2
                  + float(q[2]) ** 2 + float(q[3]) ** 2)
    q = q / max(n, 1e-12)
    return q if q[0] >= 0 else -q


def quat_from_mat(R):
    """Rotation matrix -> quaternion (wxyz), Shepperd's method: pick the
    largest of the four diagonal branches so the conversion stays
    numerically sound near 180-degree rotations (where the naive w-major
    formula divides by w ~ 0)."""
    R = np.asarray(R, np.float64)
    tr = np.trace(R)
    cand = np.array([tr, R[0, 0], R[1, 1], R[2, 2]])
    k = int(np.argmax(cand))
    if k == 0:
        s = np.sqrt(max(tr + 1.0, 1e-18)) * 2.0
        q = np.array([0.25 * s,
                      (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s,
                      (R[1, 0] - R[0, 1]) / s])
    elif k == 1:
        s = np.sqrt(max(1.0 + R[0, 0] - R[1, 1] - R[2, 2], 1e-18)) * 2.0
        q = np.array([(R[2, 1] - R[1, 2]) / s,
                      0.25 * s,
                      (R[0, 1] + R[1, 0]) / s,
                      (R[0, 2] + R[2, 0]) / s])
    elif k == 2:
        s = np.sqrt(max(1.0 + R[1, 1] - R[0, 0] - R[2, 2], 1e-18)) * 2.0
        q = np.array([(R[0, 2] - R[2, 0]) / s,
                      (R[0, 1] + R[1, 0]) / s,
                      0.25 * s,
                      (R[1, 2] + R[2, 1]) / s])
    else:
        s = np.sqrt(max(1.0 + R[2, 2] - R[0, 0] - R[1, 1], 1e-18)) * 2.0
        q = np.array([(R[1, 0] - R[0, 1]) / s,
                      (R[0, 2] + R[2, 0]) / s,
                      (R[1, 2] + R[2, 1]) / s,
                      0.25 * s])
    return _norm(q)


def se3_mul(T1, T2):
    w1 = float(T1[0]); x1 = float(T1[1]); y1 = float(T1[2])
    z1 = float(T1[3])
    tx1 = float(T1[4]); ty1 = float(T1[5]); tz1 = float(T1[6])
    w2 = float(T2[0]); x2 = float(T2[1]); y2 = float(T2[2])
    z2 = float(T2[3])
    tx2 = float(T2[4]); ty2 = float(T2[5]); tz2 = float(T2[6])
    qw = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    qx = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    qy = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    qz = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    n = max(math.sqrt(qw * qw + qx * qx + qy * qy + qz * qz), 1e-12)
    s = (1.0 / n) if qw >= 0 else (-1.0 / n)
    # rotate t2 by q1 (same identity as quat_rotate)
    ux = 2.0 * (y1 * tz2 - z1 * ty2)
    uy = 2.0 * (z1 * tx2 - x1 * tz2)
    uz = 2.0 * (x1 * ty2 - y1 * tx2)
    return np.array(
        [qw * s, qx * s, qy * s, qz * s,
         tx2 + w1 * ux + (y1 * uz - z1 * uy) + tx1,
         ty2 + w1 * uy + (z1 * ux - x1 * uz) + ty1,
         tz2 + w1 * uz + (x1 * uy - y1 * ux) + tz1], np.float32)


def se3_inv(T):
    w = float(T[0]); x = -float(T[1]); y = -float(T[2]); z = -float(T[3])
    tx = float(T[4]); ty = float(T[5]); tz = float(T[6])
    ux = 2.0 * (y * tz - z * ty)
    uy = 2.0 * (z * tx - x * tz)
    uz = 2.0 * (x * ty - y * tx)
    return np.array(
        [w, x, y, z,
         -(tx + w * ux + (y * uz - z * uy)),
         -(ty + w * uy + (z * ux - x * uz)),
         -(tz + w * uz + (x * uy - y * ux))], np.float32)


def se3_apply(T, p):
    return (quat_rotate(T[:4], p) + np.asarray(T[4:], np.float64)
            ).astype(np.float32)


def se3_twist(T, dt):
    """Approximate body twist [phi, rho] per second from a small relative
    SE3 over ``dt`` seconds (small-angle: V ~ I, so rho ~ translation)."""
    q = np.asarray(T[:4], np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    if q[0] < 0:
        q = -q
    s = np.linalg.norm(q[1:])
    ang = 2.0 * np.arctan2(s, q[0])
    phi = (q[1:] / s * ang) if s > 1e-9 else np.zeros(3)
    xi = np.concatenate([phi, np.asarray(T[4:], np.float64)])
    return (xi / max(float(dt), 1e-6)).astype(np.float32)


def se3_exp(xi):
    """Twist [phi, rho] -> SE3 (mirrors geometry/se3.se3_exp, exact V)."""
    xi = np.asarray(xi, np.float64)
    phi, rho = xi[:3], xi[3:]
    theta2 = float(phi @ phi)
    theta = np.sqrt(theta2)
    if theta2 < 1e-12:
        q = _norm(np.concatenate([[1.0], 0.5 * phi]))
        a, b = 0.5 - theta2 / 24.0, 1.0 / 6.0 - theta2 / 120.0
    else:
        half = 0.5 * theta
        q = _norm(np.concatenate([[np.cos(half)],
                                  np.sin(half) / theta * phi]))
        a = (1.0 - np.cos(theta)) / theta2
        b = (theta - np.sin(theta)) / (theta2 * theta)
    px = np.cross(phi, rho)
    t = rho + a * px + b * np.cross(phi, px)
    return np.concatenate([q, t]).astype(np.float32)


def se3_boxplus(T, xi):
    """Left-multiplicative retraction exp(xi) * T (the solver's chart)."""
    return se3_mul(se3_exp(xi), T)


def se3_apply_batch(T, pts):
    """Apply ONE SE3 to (N, 3) points (rotation-matrix form)."""
    w, x, y, z = np.asarray(T[:4], np.float64)
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return (np.asarray(pts, np.float64) @ R.T
            + np.asarray(T[4:], np.float64)).astype(np.float32)
