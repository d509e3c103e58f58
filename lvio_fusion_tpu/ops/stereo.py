"""Stereo matching + linear triangulation.

Replaces the reference LocalMap's stereo LK match + SVD triangulation
(local_map.cpp:233-269, utility.cpp:7-18). Matching reuses the pyramidal
LK tracker between the left and right images, seeded at the max-depth
projection (same trick as the reference). Triangulation solves the stacked
two-ray linear system with 3x3 normal equations (vmapped dense solve —
cheaper and MXU-friendlier than per-point 4x4 SVD, identical solution for
the non-degenerate stereo geometry).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lvio_fusion_tpu.geometry.se3 import se3_inv, se3_mul, se3_to_mat
from lvio_fusion_tpu.utils.precision import f32_solver


@f32_solver
def triangulate(T_w_s0, T_w_s1, uv0, uv1):
    """Triangulate world points from two sensor poses + normalized camera
    coords (pinhole, z=1 plane).

    T_w_s*: (..., 7) sensor->world. uv*: (..., 2). Returns (pw (..., 3),
    good (...,) bool) — good requires positive depth in both views and a
    well-conditioned system.
    """
    rows = []
    for T, uv in ((T_w_s0, uv0), (T_w_s1, uv1)):
        M = se3_to_mat(se3_inv(T))[..., :3, :]  # (..., 3, 4) world->sensor
        u = uv[..., 0:1]
        v = uv[..., 1:2]
        rows.append(u * M[..., 2, :] - M[..., 0, :])
        rows.append(v * M[..., 2, :] - M[..., 1, :])
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    # solve A [p;1] = 0  =>  A3 p = -a4 in least squares.
    # QR keeps the condition number un-squared (f32 matters for far points
    # with near-parallel rays).
    A3 = A[..., :3]
    a4 = A[..., 3]
    q, r = jnp.linalg.qr(A3)
    rdiag = jnp.abs(jnp.diagonal(r, axis1=-2, axis2=-1))
    good_cond = jnp.min(rdiag, axis=-1) > 1e-6
    r_safe = jnp.where(good_cond[..., None, None], r,
                       jnp.eye(3, dtype=r.dtype))
    qtb = -jnp.einsum("...ij,...i->...j", q, a4)
    pw = jax.scipy.linalg.solve_triangular(r_safe, qtb[..., None],
                                           lower=False)[..., 0]

    def depth_in(T, p):
        Minv = se3_to_mat(se3_inv(T))
        return (jnp.einsum("...ij,...j->...i", Minv[..., :3, :3], p)
                + Minv[..., :3, 3])[..., 2]

    good = (good_cond & (depth_in(T_w_s0, pw) > 0.1)
            & (depth_in(T_w_s1, pw) > 0.1))
    return pw, good


def pixel_to_norm(pts, fx, fy, cx, cy):
    return jnp.stack([(pts[..., 0] - cx) / fx, (pts[..., 1] - cy) / fy], -1)
