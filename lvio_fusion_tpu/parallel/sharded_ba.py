"""Factor-parallel window BA: shard the observation tables across the
device mesh and psum the assembled normal equations.

This is the second scaling axis next to batch/data parallelism over
SLAM/RL instances (parallel/mesh.py): within ONE bundle-adjustment
problem, the two-frame observation table (the dominant factor count) is
split across devices; each device linearizes its shard and the Gauss-
Newton system (Hpp, Hpl, Hll, bp, bl — a few MB) is reduced over ICI with
one psum. The damped Schur solve then runs replicated (it is a few-hundred
-dim dense Cholesky — cheaper than distributing).

The collective pattern matches the classic data-parallel gradient psum:
assembly cost scales 1/devices, communication is O(state^2), independent
of the factor count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from lvio_fusion_tpu.solver.assemble import assemble
from lvio_fusion_tpu.solver.ba import (
    BAParams, STATE_DIM, linearize_priors, linearize_visual, retract,
)
from lvio_fusion_tpu.solver.lm import BlockSystem, lm_solve, pin_invalid
from lvio_fusion_tpu.utils.memo import builder_memo


@builder_memo
def make_sharded_window_ba(cam_left, cam_right, mesh: Mesh,
                           num_iters: int = 6, axis: str = "data"):
    """Build a window-BA solve whose visual-factor linearization +
    assembly is sharded over ``mesh`` along the observation dimension.

    The obs tables' leading dim must be divisible by the mesh size.
    Landmark/prior/pose-only tables are small and stay replicated (their
    contributions are divided by the device count inside the shard so the
    psum reproduces the exact unsharded system).
    """
    n_dev = mesh.shape[axis]

    def build(params: BAParams, vt, pt, p_valid, l_valid):
        K = params.poses.shape[0]
        L = params.inv_depth.shape[0]

        def shard_build(params, vt, pt):
            s = 1.0 / jnp.sqrt(float(n_dev))

            def scale(c):
                """Whiten a replicated contribution by 1/sqrt(n_dev) so the
                cross-device psum of H = J^T J and b = -J^T r counts it
                exactly once."""
                return c._replace(
                    r=c.r * s,
                    pose_jacs=tuple(j * s for j in c.pose_jacs),
                    lm_jac=None if c.lm_jac is None else c.lm_jac * s)

            contribs = linearize_visual(params, vt, cam_left, cam_right)
            # contribs[0] = two-frame obs (sharded); the rest replicated
            scaled = [contribs[0]] + [scale(c) for c in contribs[1:]]
            scaled += [scale(c) for c in linearize_priors(params, pt)]
            sys = assemble(scaled, K, STATE_DIM, L,
                           dtype=params.poses.dtype)
            sys = jax.tree.map(partial(jax.lax.psum, axis_name=axis), sys)
            return sys

        obs_sharded = P(axis)
        rep = P()
        vt_spec = type(vt)(
            lm_anchor=rep, lm_first_ob=rep, lm_left_ob=rep, lm_valid=rep,
            lm_weight=rep,
            obs_lm=obs_sharded, obs_frame=obs_sharded,
            obs_pixel=obs_sharded, obs_weight=obs_sharded,
            obs_valid=obs_sharded,
            po_frame=rep, po_pw=rep, po_pixel=rep, po_weight=rep,
            po_valid=rep)
        sys = shard_map(
            shard_build, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: rep, params), vt_spec,
                      jax.tree.map(lambda _: rep, pt)),
            out_specs=jax.tree.map(lambda _: rep,
                                   BlockSystem(0, 0, 0, 0, 0, 0)),
        )(params, vt, pt)
        return pin_invalid(sys, p_valid, l_valid)

    @jax.jit
    def solve(params: BAParams, vt, pt, kf_valid, kf_fixed):
        K = params.poses.shape[0]
        free_pose = (kf_valid & ~kf_fixed)
        pv = jnp.concatenate([
            jnp.repeat(free_pose[:, None], 6, axis=1),
            jnp.zeros((K, 9), bool),
        ], axis=1).reshape(K * STATE_DIM)
        lv = vt.lm_valid

        res = lm_solve(
            params,
            build_fn=lambda p: build(p, vt, pt, pv, lv),
            retract_fn=lambda p, dxp, dxl: retract(
                p, dxp, dxl, free_pose.astype(p.poses.dtype),
                jnp.zeros_like(free_pose, p.poses.dtype)),
            cost_fn=lambda p: build(p, vt, pt, pv, lv).cost,
            num_iters=num_iters,
        )
        return res.params, res.cost

    return solve
