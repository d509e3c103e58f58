"""Window-BA solver validation on a synthetic stereo scene with known
ground truth: perturbed poses/depths must converge back (gauge fixed by
the first keyframe + stereo scale)."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry.se3 import (
    se3_apply, se3_boxplus, se3_exp, se3_identity, se3_inv, se3_make, se3_mul,
)
from lvio_fusion_tpu.geometry.so3 import exp_so3
from lvio_fusion_tpu.models.camera import Camera
from lvio_fusion_tpu.solver.ba import (
    BAParams, PriorTables, VisualTables, make_window_ba,
)

FX, FY, CX, CY = 400.0, 400.0, 320.0, 240.0
BASELINE = 0.5


def make_rig():
    cam_left = Camera.create(FX, FY, CX, CY, se3_identity())
    cam_right = Camera.create(
        FX, FY, CX, CY, se3_make(jnp.array([1.0, 0, 0, 0]),
                                 jnp.array([BASELINE, 0.0, 0.0])))
    return cam_left, cam_right


def make_scene(K=6, L=48, seed=0):
    rng = np.random.default_rng(seed)
    # forward motion along z with slight yaw
    poses = [se3_identity()]
    for k in range(1, K):
        step = se3_exp(jnp.array([0.0, 0.02, 0.0, 0.02, 0.0, 0.6]))
        poses.append(se3_mul(poses[-1], step))
    poses = jnp.stack(poses)

    # landmarks in front of the rig
    pw = jnp.asarray(np.stack([
        rng.uniform(-4, 4, L), rng.uniform(-2, 2, L), rng.uniform(6, 25, L)
    ], axis=1), dtype=jnp.float32)
    anchor = jnp.asarray(rng.integers(0, max(1, K // 2), L), dtype=jnp.int32)
    return poses, pw, anchor


def build_tables(poses, pw, anchor, cam_left, cam_right):
    K, L = poses.shape[0], pw.shape[0]
    # ground-truth inverse depth: z in the right sensor frame at the anchor
    pc_r = jax.vmap(lambda p, a: cam_right.world2sensor(p, poses[a]))(pw, anchor)
    inv_depth_gt = 1.0 / pc_r[:, 2]
    first_ob = jax.vmap(lambda p, a: cam_right.world2pixel(p, poses[a]))(pw, anchor)
    left_ob = jax.vmap(lambda p, a: cam_left.world2pixel(p, poses[a]))(pw, anchor)

    # observations: every kf after the anchor observes the landmark
    obs_lm, obs_frame, obs_pix, obs_valid = [], [], [], []
    for k in range(K):
        pix = jax.vmap(lambda p: cam_left.world2pixel(p, poses[k]))(pw)
        z = jax.vmap(lambda p: cam_left.world2sensor(p, poses[k]))(pw)[:, 2]
        valid = (z > 0.5) & (anchor <= k)
        obs_lm.append(jnp.arange(L, dtype=jnp.int32))
        obs_frame.append(jnp.full((L,), k, dtype=jnp.int32))
        obs_pix.append(pix)
        obs_valid.append(valid)

    G = 4  # empty pose-only table
    vt = VisualTables(
        lm_anchor=anchor,
        lm_first_ob=first_ob,
        lm_left_ob=left_ob,
        lm_valid=jnp.ones(L, dtype=bool),
        lm_weight=jnp.ones(L) * 1.0,
        obs_lm=jnp.concatenate(obs_lm),
        obs_frame=jnp.concatenate(obs_frame),
        obs_pixel=jnp.concatenate(obs_pix),
        obs_weight=jnp.ones(L * K),
        obs_valid=jnp.concatenate(obs_valid),
        po_frame=jnp.zeros(G, dtype=jnp.int32),
        po_pw=jnp.ones((G, 3)),
        po_pixel=jnp.zeros((G, 2)),
        po_weight=jnp.zeros(G),
        po_valid=jnp.zeros(G, dtype=bool),
    )
    return vt, inv_depth_gt


def empty_priors(K):
    return PriorTables(
        frame=jnp.zeros(1, dtype=jnp.int32),
        pose=se3_identity()[None],
        weight=jnp.zeros(1),
        valid=jnp.zeros(1, dtype=bool),
    )


def test_ba_recovers_ground_truth():
    cam_left, cam_right = make_rig()
    poses_gt, pw, anchor = make_scene()
    K, L = poses_gt.shape[0], pw.shape[0]
    vt, inv_depth_gt = build_tables(poses_gt, pw, anchor, cam_left, cam_right)

    rng = np.random.default_rng(1)
    noise = jnp.asarray(np.concatenate([
        np.zeros((1, 6)),
        rng.normal(0, 1, (K - 1, 6)) * np.array([0.02, 0.02, 0.02, 0.15, 0.15, 0.15]),
    ]), dtype=jnp.float32)
    poses0 = jax.vmap(se3_boxplus)(poses_gt, noise)
    inv_depth0 = inv_depth_gt * jnp.asarray(
        rng.uniform(0.8, 1.25, L), dtype=jnp.float32)

    params0 = BAParams(
        poses=poses0,
        vel=jnp.zeros((K, 3)),
        bias=jnp.zeros((K, 6)),
        inv_depth=inv_depth0,
    )
    solve = make_window_ba(cam_left, cam_right, num_iters=12)
    kf_valid = jnp.ones(K, dtype=bool)
    kf_fixed = jnp.zeros(K, dtype=bool).at[0].set(True)

    params, cost = solve(params0, vt, empty_priors(K), kf_valid, kf_fixed)

    # trajectory error vs ground truth
    terr = jnp.linalg.norm(params.poses[:, 4:] - poses_gt[:, 4:], axis=-1)
    derr = jnp.abs(params.inv_depth - inv_depth_gt) / inv_depth_gt

    t0 = jnp.linalg.norm(poses0[:, 4:] - poses_gt[:, 4:], axis=-1)
    print("initial terr:", np.asarray(t0))
    print("final   terr:", np.asarray(terr))
    print("final cost:", float(cost))

    assert float(cost) < 1e-2, f"cost did not converge: {float(cost)}"
    assert float(terr.max()) < 1e-2, f"pose error too large: {terr}"
    assert float(derr.max()) < 1e-2, f"depth error too large: {derr.max()}"


def test_ba_is_jittable_and_fixed_shape():
    cam_left, cam_right = make_rig()
    poses_gt, pw, anchor = make_scene(K=4, L=16, seed=3)
    vt, inv_d = build_tables(poses_gt, pw, anchor, cam_left, cam_right)
    K, L = 4, 16
    params = BAParams(poses_gt, jnp.zeros((K, 3)), jnp.zeros((K, 6)), inv_d)
    solve = make_window_ba(cam_left, cam_right, num_iters=2)
    out, cost = solve(params, vt, empty_priors(K), jnp.ones(K, bool),
                      jnp.zeros(K, bool).at[0].set(True))
    # already at optimum: stays there
    assert float(cost) < 1e-4
    np.testing.assert_allclose(out.poses, poses_gt, atol=1e-3)
