"""Feature-parallel frontend tracking: shard the LK feature table across
the device mesh and psum the pose-GN normal equations.

Third scaling axis next to batch/data parallelism over instances
(parallel/mesh.py) and factor-parallel window BA (parallel/sharded_ba.py):
within ONE frame's tracking step (the per-frame hot op — reference
frontend.cpp:155-260 TrackLastFrame + the pose solve), the feature table
shards across devices. Pyramidal LK, the bidirectional check, and the
moving-point test are embarrassingly parallel per feature; the only
cross-feature reductions are

  * the mean flow deviation of the moving-point rejection
    (frontend.cpp:195-230) — one psum of a 2-vector + count, and
  * the 6x6 pose Gauss-Newton system (H, b) — one psum pair per GN
    iteration (core/frontend.pose_only_refine with ``axis_name``).

Pyramids are replicated (each device tracks its feature slice against the
full image); communication is O(6x6) per iteration, independent of the
feature count, so tracking cost scales 1/devices — the same collective
shape as data-parallel gradient aggregation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from lvio_fusion_tpu.core.frontend import pose_only_refine
from lvio_fusion_tpu.models.camera import stereo_baseline
from lvio_fusion_tpu.ops.lk import track_bidirectional
from lvio_fusion_tpu.utils.memo import builder_memo


@builder_memo
def make_sharded_track(cam_left, cam_right, mesh: Mesh, win: int = 15,
                       lk_iters: int = 6, remove_moving: bool = True,
                       moving_px: float = 30.0, axis: str = "data"):
    """Build a jitted tracking step whose feature axis is sharded over
    ``mesh``. Semantics match the in-program ``_track`` of
    core/frontend.make_frontend (same seeding, bidirectional LK,
    moving-point rejection, pose-only GN); the feature count must be
    divisible by the mesh size. Returns
    ``track(pyr_last, pyr_cur, feat_px, feat_valid, lm_world, pose_pred)
    -> (pts, inliers, pose, num_inliers)``.
    """
    baseline = stereo_baseline(cam_left, cam_right)

    def shard_fn(pyr_last, pyr_cur, feat_px, feat_valid, lm_world,
                 pose_pred):
        # landmark-projection seeding (frontend.cpp:166-171)
        proj = jax.vmap(
            lambda p: cam_left.world2pixel(p, pose_pred))(lm_world)
        seed = jnp.where(feat_valid[:, None], proj, feat_px)
        wild = jnp.linalg.norm(seed - feat_px, axis=-1) > 100.0
        seed = jnp.where(wild[:, None], feat_px, seed)
        pts, ok = track_bidirectional(pyr_last, pyr_cur, feat_px, seed,
                                      win=win, iters=lk_iters)
        ok = ok & feat_valid
        if remove_moving:
            # the deviation mean is over ALL inliers: psum the shard sums
            dev = proj - pts
            okf = ok.astype(dev.dtype)
            s_dev = jax.lax.psum(jnp.sum(dev * okf[:, None], 0), axis)
            s_cnt = jax.lax.psum(jnp.sum(okf), axis)
            avg = s_dev / jnp.maximum(s_cnt, 1.0)
            cd = jnp.linalg.norm(dev - avg, axis=-1)
            depth = jax.vmap(
                lambda p: cam_left.world2sensor(p, pose_pred)[2])(lm_world)
            far_lm = depth > 50.0 * baseline
            ok = ok & (far_lm | (cd < moving_px))
        pose, inliers = pose_only_refine(pose_pred, lm_world, pts, ok,
                                         cam_left, axis_name=axis)
        n_inl = jax.lax.psum(jnp.sum(inliers.astype(jnp.int32)), axis)
        return pts, inliers, pose, n_inl

    feat = P(axis)
    rep = P()

    def specs(pyr):
        pyr_spec = jax.tree.map(lambda _: rep, pyr)
        return (pyr_spec, pyr_spec, feat, feat, feat, rep)

    @jax.jit
    def track(pyr_last, pyr_cur, feat_px, feat_valid, lm_world, pose_pred):
        fn = shard_map(
            shard_fn, mesh=mesh, in_specs=specs(pyr_last),
            out_specs=(feat, feat, rep, rep))
        return fn(pyr_last, pyr_cur, feat_px, feat_valid, lm_world,
                  pose_pred)

    return track
