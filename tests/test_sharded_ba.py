"""Factor-parallel sharded BA must reproduce the single-device solve on
the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.parallel.mesh import make_mesh
from lvio_fusion_tpu.parallel.sharded_ba import make_sharded_window_ba
from lvio_fusion_tpu.solver.ba import BAParams, make_window_ba
from test_ba_solver import build_tables, empty_priors, make_rig, make_scene


def test_sharded_matches_single_device():
    cam_left, cam_right = make_rig()
    poses_gt, pw, anchor = make_scene(K=6, L=48, seed=2)
    vt, inv_depth_gt = build_tables(poses_gt, pw, anchor, cam_left,
                                    cam_right)
    # obs table length must divide the mesh: 48*6 = 288 = 8 * 36 ok
    K, L = 6, 48
    rng = np.random.default_rng(3)
    from lvio_fusion_tpu.geometry.se3 import se3_boxplus
    noise = jnp.asarray(np.concatenate([
        np.zeros((1, 6)),
        rng.normal(0, 1, (K - 1, 6)) * np.array([0.01] * 3 + [0.1] * 3)
    ]), dtype=jnp.float32)
    params0 = BAParams(
        poses=jax.vmap(se3_boxplus)(poses_gt, noise),
        vel=jnp.zeros((K, 3)), bias=jnp.zeros((K, 6)),
        inv_depth=inv_depth_gt * jnp.asarray(
            rng.uniform(0.9, 1.1, L), jnp.float32))
    kf_valid = jnp.ones(K, bool)
    kf_fixed = jnp.zeros(K, bool).at[0].set(True)
    pt = empty_priors(K)

    ref_solve = make_window_ba(cam_left, cam_right, num_iters=6)
    ref, ref_cost = ref_solve(params0, vt, pt, kf_valid, kf_fixed)

    mesh = make_mesh(8)
    assert mesh.shape["data"] == 8, "expected the virtual 8-device mesh"
    sh_solve = make_sharded_window_ba(cam_left, cam_right, mesh,
                                      num_iters=6)
    out, cost = sh_solve(params0, vt, pt, kf_valid, kf_fixed)

    np.testing.assert_allclose(np.asarray(out.poses),
                               np.asarray(ref.poses), atol=2e-3)
    err = np.linalg.norm(np.asarray(out.poses)[:, 4:]
                         - np.asarray(poses_gt)[:, 4:], axis=-1)
    assert err.max() < 1e-2, err
