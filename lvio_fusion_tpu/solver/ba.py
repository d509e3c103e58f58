"""Sliding-window bundle adjustment: factor tables, linearization, solve.

The TPU-native equivalent of the reference backend's BuildProblem + Ceres
SPARSE_SCHUR solve (backend.cpp:96-183, 206-211). All tables are fixed
capacity with validity masks; the per-keyframe state is a 15-dim block
``[pose(6) | velocity(3) | acc_bias(3) | gyr_bias(3)]`` (IMU dims are
identity-pinned when IMU is off), landmarks are scalar inverse depths.

Factor types (mirroring the reference's window BA):
  * two-frame reprojection  (anchor pose, observer pose, inv depth)
  * stereo (two-camera) reprojection at the anchor (inv depth only)
  * pose-only reprojection for landmarks anchored outside the window
  * IMU preintegration factors between consecutive kfs (solver/imu_factor.py)
  * weak pose priors (the reference's weak-constraint PoseError fallback)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp

from lvio_fusion_tpu.geometry.se3 import se3_boxplus
from lvio_fusion_tpu.solver import factors
from lvio_fusion_tpu.solver.assemble import Contribution, assemble
from lvio_fusion_tpu.solver.lm import lm_solve, pin_invalid
from lvio_fusion_tpu.utils.memo import builder_memo

STATE_DIM = 15
POSE = slice(0, 6)
VEL = slice(6, 9)
BIAS = slice(9, 15)

HUBER_VISUAL = 4.0  # px-scale robust threshold (weighted units)


@flax.struct.dataclass
class BAParams:
    """Optimizable window state."""

    poses: jnp.ndarray      # (K, 7) SE3 robot->world
    vel: jnp.ndarray        # (K, 3)
    bias: jnp.ndarray       # (K, 6) [ba, bg]
    inv_depth: jnp.ndarray  # (L,)


@flax.struct.dataclass
class VisualTables:
    """Fixed-capacity factor tables for the visual part of the window."""

    # landmark table (L,)
    lm_anchor: jnp.ndarray    # int32 anchor kf index
    lm_first_ob: jnp.ndarray  # (L, 2) right-cam pixel at anchor
    lm_left_ob: jnp.ndarray   # (L, 2) left-cam pixel at anchor (stereo factor)
    lm_valid: jnp.ndarray     # (L,) bool
    lm_weight: jnp.ndarray    # (L,) stereo-factor weight

    # two-frame observations (F,)
    obs_lm: jnp.ndarray       # int32 landmark index
    obs_frame: jnp.ndarray    # int32 observing kf index
    obs_pixel: jnp.ndarray    # (F, 2) left-cam pixel
    obs_weight: jnp.ndarray   # (F,)
    obs_valid: jnp.ndarray    # (F,) bool

    # pose-only observations (G,) — landmark world position frozen
    po_frame: jnp.ndarray     # int32
    po_pw: jnp.ndarray        # (G, 3)
    po_pixel: jnp.ndarray     # (G, 2)
    po_weight: jnp.ndarray    # (G,)
    po_valid: jnp.ndarray     # (G,) bool


@flax.struct.dataclass
class PriorTables:
    """Weak pose priors (reference backend.cpp:164-178 fallback priors)."""

    frame: jnp.ndarray   # (Q,) int32
    pose: jnp.ndarray    # (Q, 7) prior pose values
    weight: jnp.ndarray  # (Q,)
    valid: jnp.ndarray   # (Q,) bool


def _zeros_like_tangent(n, dims, dtype):
    return jnp.zeros((n, dims), dtype)


def linearize_visual(params: BAParams, vt: VisualTables, cam_left, cam_right):
    """Linearize all visual factors; returns Contributions with S=15 blocks
    (only the 6 pose dims are touched — remaining columns stay zero)."""
    dtype = params.poses.dtype
    contribs = []

    # --- two-frame reprojection ---
    F = vt.obs_lm.shape[0]
    pose_i = params.poses[vt.obs_frame]
    anchor = vt.lm_anchor[vt.obs_lm]
    pose_a = params.poses[anchor]
    inv_d = params.inv_depth[vt.obs_lm]
    first_ob = vt.lm_first_ob[vt.obs_lm]

    def f_two(xi_i, xi_a, dd, p_i, p_a, d0, fob, px, w):
        return factors.reproj_two_frame(
            xi_i, xi_a, dd, p_i, p_a, d0, fob, px, cam_left, cam_right, w)

    z6 = _zeros_like_tangent(F, 6, dtype)
    z1 = jnp.zeros((F,), dtype)
    args = (pose_i, pose_a, inv_d, first_ob, vt.obs_pixel, vt.obs_weight)
    r = jax.vmap(f_two)(z6, z6, z1, *args)
    Ji, Ja, Jl = jax.vmap(jax.jacfwd(f_two, argnums=(0, 1, 2)))(
        z6, z6, z1, *args)
    # robust reweighting
    s = factors.huber_scale(r, HUBER_VISUAL)
    r, Ji, Ja, Jl = r * s, Ji * s[..., None], Ja * s[..., None], Jl * s
    pad = jnp.zeros(Ji.shape[:2] + (STATE_DIM - 6,), dtype)
    valid = vt.obs_valid & vt.lm_valid[vt.obs_lm]
    # exclude self-observation factors (observer == anchor): the stereo
    # factor already covers the anchor frame
    valid = valid & (vt.obs_frame != anchor)
    contribs.append(Contribution(
        r=r,
        pose_idx=(vt.obs_frame, anchor),
        pose_jacs=(jnp.concatenate([Ji, pad], -1),
                   jnp.concatenate([Ja, pad], -1)),
        lm_idx=vt.obs_lm, lm_jac=Jl, valid=valid))

    # --- stereo factor at the anchor (inv depth only) ---
    L = params.inv_depth.shape[0]

    def f_st(dd, d0, fob, lob, w):
        return factors.reproj_two_camera(dd, d0, fob, lob, cam_left,
                                         cam_right, w)

    zl = jnp.zeros((L,), dtype)
    r2 = jax.vmap(f_st)(zl, params.inv_depth, vt.lm_first_ob, vt.lm_left_ob,
                        vt.lm_weight)
    Jl2 = jax.vmap(jax.jacfwd(f_st, argnums=0))(
        zl, params.inv_depth, vt.lm_first_ob, vt.lm_left_ob, vt.lm_weight)
    s2 = factors.huber_scale(r2, HUBER_VISUAL)
    r2, Jl2 = r2 * s2, Jl2 * s2
    contribs.append(Contribution(
        r=r2, pose_idx=(), pose_jacs=(),
        lm_idx=jnp.arange(L, dtype=jnp.int32), lm_jac=Jl2,
        valid=vt.lm_valid))

    # --- pose-only reprojection ---
    G = vt.po_frame.shape[0]

    def f_po(xi, p_i, pw, px, w):
        return factors.reproj_pose_only(xi, p_i, pw, px, cam_left, w)

    zg = _zeros_like_tangent(G, 6, dtype)
    argsg = (params.poses[vt.po_frame], vt.po_pw, vt.po_pixel, vt.po_weight)
    r3 = jax.vmap(f_po)(zg, *argsg)
    J3 = jax.vmap(jax.jacfwd(f_po, argnums=0))(zg, *argsg)
    s3 = factors.huber_scale(r3, HUBER_VISUAL)
    r3, J3 = r3 * s3, J3 * s3[..., None]
    pad3 = jnp.zeros(J3.shape[:2] + (STATE_DIM - 6,), dtype)
    contribs.append(Contribution(
        r=r3, pose_idx=(vt.po_frame,),
        pose_jacs=(jnp.concatenate([J3, pad3], -1),),
        lm_idx=None, lm_jac=None, valid=vt.po_valid))

    return contribs


def linearize_priors(params: BAParams, pt: PriorTables):
    dtype = params.poses.dtype
    Q = pt.frame.shape[0]

    def f(xi, p_i, prior, w):
        return factors.pose_prior(xi, p_i, prior, w)

    z = _zeros_like_tangent(Q, 6, dtype)
    args = (params.poses[pt.frame], pt.pose, pt.weight)
    r = jax.vmap(f)(z, *args)
    J = jax.vmap(jax.jacfwd(f, argnums=0))(z, *args)
    pad = jnp.zeros(J.shape[:2] + (STATE_DIM - 6,), dtype)
    return [Contribution(
        r=r, pose_idx=(pt.frame,),
        pose_jacs=(jnp.concatenate([J, pad], -1),),
        lm_idx=None, lm_jac=None, valid=pt.valid)]


def retract(params: BAParams, dxp, dxl, kf_free_pose, kf_free_imu):
    K = params.poses.shape[0]
    dx = dxp.reshape(K, STATE_DIM)
    dpose = dx[:, POSE] * kf_free_pose[:, None]
    dimu = dx[:, 6:] * kf_free_imu[:, None]
    poses = jax.vmap(se3_boxplus)(params.poses, dpose)
    vel = params.vel + dimu[:, :3]
    bias = params.bias + dimu[:, 3:]
    inv_depth = jnp.clip(params.inv_depth + dxl, 1e-5, 1e3)
    return BAParams(poses, vel, bias, inv_depth)


class WindowBAProblem(NamedTuple):
    """Static problem definition closed over by the jitted solve."""

    cam_left: object
    cam_right: object
    use_imu: bool


@builder_memo
def make_window_ba(cam_left, cam_right, num_iters: int = 8, use_imu: bool = False,
                   imu_linearizer=None, packed: bool = False):
    """Build a jittable window-BA solve function.

    Returns solve(params, visual_tables, prior_tables, kf_valid,
                  kf_fixed, imu_tables=None) -> (BAParams, cost), or — with
    ``packed=True`` — ONE flat f32 array
    [poses (K*7) | vel (K*3) | bias (K*6) | inv_depth (L) |
     lm_world (L*3) | obs_err (F) | po_err (G) | cost]
    so the host pays a single device->host transfer (see unpack_ba_result).

    The packed epilogue fuses what the reference backend does as separate
    passes after Ceres returns — refreshing landmark world caches
    (Frontend::UpdateCache, frontend.cpp:306-324) and measuring
    reprojection errors for outlier rejection (backend.cpp:229-245) —
    into the SAME program, so the whole keyframe solve costs one
    dispatch + one fetch through the device tunnel.
    """

    def build(params, vt, pt, p_valid, l_valid, imu_tables):
        contribs = linearize_visual(params, vt, cam_left, cam_right)
        contribs += linearize_priors(params, pt)
        if use_imu and imu_linearizer is not None:
            contribs += imu_linearizer(params, imu_tables)
        K = params.poses.shape[0]
        L = params.inv_depth.shape[0]
        sys = assemble(contribs, K, STATE_DIM, L, dtype=params.poses.dtype)
        return pin_invalid(sys, p_valid, l_valid)

    def cost_fn(params, vt, pt, imu_tables):
        # cheap cost-only evaluation (no jacobians)
        contribs = linearize_visual(params, vt, cam_left, cam_right)
        contribs += linearize_priors(params, pt)
        if use_imu and imu_linearizer is not None:
            contribs += imu_linearizer(params, imu_tables)
        c = jnp.zeros((), params.poses.dtype)
        for con in contribs:
            v = con.valid.astype(params.poses.dtype)[:, None]
            c = c + 0.5 * jnp.sum((con.r * v) ** 2)
        return c

    @partial(jax.jit, static_argnames=())
    def solve(params: BAParams, vt: VisualTables, pt: PriorTables,
              kf_valid, kf_fixed, imu_tables=None):
        K = params.poses.shape[0]
        free_pose = (kf_valid & ~kf_fixed)
        # gauge-fixing pins only the pose; velocity/bias of fixed kfs stay
        # free (the IMU chain must be able to correct them)
        free_imu = kf_valid if use_imu else jnp.zeros_like(free_pose)
        pv = jnp.concatenate([
            jnp.repeat(free_pose[:, None], 6, axis=1),
            jnp.repeat(free_imu[:, None], 9, axis=1),
        ], axis=1).reshape(K * STATE_DIM)
        lv = params.inv_depth * 0 + 1
        lv = (jnp.zeros_like(params.inv_depth, dtype=bool) |
              vt.lm_valid)

        res = lm_solve(
            params,
            build_fn=lambda p: build(p, vt, pt, pv, lv, imu_tables),
            retract_fn=lambda p, dxp, dxl: retract(
                p, dxp, dxl, free_pose.astype(p.poses.dtype),
                free_imu.astype(p.poses.dtype)),
            cost_fn=lambda p: cost_fn(p, vt, pt, imu_tables),
            num_iters=num_iters,
        )
        if packed:
            from lvio_fusion_tpu.geometry.se3 import se3_apply
            p = res.params
            # --- fused epilogue (world cache + outlier errors) ---
            pb = jax.vmap(lambda ob, d: cam_right.pixel2robot(
                ob, 1.0 / jnp.maximum(d, 1e-5)))(vt.lm_first_ob, p.inv_depth)
            lm_world = jax.vmap(se3_apply)(p.poses[vt.lm_anchor], pb)
            pred_tf = jax.vmap(lambda w, T: cam_left.world2pixel(w, T))(
                lm_world[vt.obs_lm], p.poses[vt.obs_frame])
            obs_err = jnp.linalg.norm(pred_tf - vt.obs_pixel, axis=-1)
            pred_po = jax.vmap(lambda w, T: cam_left.world2pixel(w, T))(
                vt.po_pw, p.poses[vt.po_frame])
            po_err = jnp.linalg.norm(pred_po - vt.po_pixel, axis=-1)
            return jnp.concatenate([
                p.poses.reshape(-1), p.vel.reshape(-1), p.bias.reshape(-1),
                p.inv_depth, lm_world.reshape(-1), obs_err, po_err,
                res.cost[None]])
        return res.params, res.cost

    return solve


def unpack_ba_result(flat, K: int, L: int, F: int = 0, G: int = 0):
    """Host-side unpack of the packed window-BA result (numpy)."""
    import numpy as np
    flat = np.asarray(flat)
    poses = flat[:K * 7].reshape(K, 7)
    vel = flat[K * 7:K * 10].reshape(K, 3)
    bias = flat[K * 10:K * 16].reshape(K, 6)
    inv_depth = flat[K * 16:K * 16 + L]
    o = K * 16 + L
    lm_world = flat[o:o + L * 3].reshape(L, 3)
    obs_err = flat[o + L * 3:o + L * 3 + F]
    po_err = flat[o + L * 3 + F:o + L * 3 + F + G]
    cost = float(flat[-1])
    return poses, vel, bias, inv_depth, lm_world, obs_err, po_err, cost
