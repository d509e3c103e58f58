"""Visual-inertial window BA: IMU factors + visual factors must jointly
recover perturbed states (including velocities)."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry.se3 import se3_boxplus
from lvio_fusion_tpu.ops.imu_preint import preintegrate
from lvio_fusion_tpu.solver.ba import BAParams, make_window_ba
from lvio_fusion_tpu.solver.imu_factor import (
    ImuFactorTables, make_imu_linearizer, sqrt_info_from_cov,
)
from test_ba_solver import build_tables, empty_priors, make_rig, make_scene
from test_imu import G, RATE, simulate


def make_imu_tables(sim, kf_samples):
    """Preintegrate between consecutive keyframe sample indices."""
    rows = []
    for i0, i1 in zip(kf_samples[:-1], kf_samples[1:]):
        acc = jnp.asarray(sim["acc"][i0:i1 + 1])
        gyr = jnp.asarray(sim["gyr"][i0:i1 + 1])
        dt = jnp.full((i1 - i0 + 1,), 1.0 / RATE).at[0].set(0.0)
        rows.append(preintegrate(acc, gyr, dt, jnp.zeros(3), jnp.zeros(3),
                                 0.1, 0.01, 1e-3, 1e-4))
    M = len(rows)
    stack = lambda xs: jnp.stack(xs)
    return ImuFactorTables(
        frame_i=jnp.arange(M, dtype=jnp.int32),
        frame_j=jnp.arange(1, M + 1, dtype=jnp.int32),
        dp=stack([r.dp for r in rows]),
        dq=stack([r.dq for r in rows]),
        dv=stack([r.dv for r in rows]),
        sum_dt=stack([r.sum_dt for r in rows]),
        jac=stack([r.jac for r in rows]),
        sqrt_info=stack([sqrt_info_from_cov(r.cov) for r in rows]),
        lin_ba=stack([r.lin_ba for r in rows]),
        lin_bg=stack([r.lin_bg for r in rows]),
        valid=jnp.ones(M, bool),
        g_norm=jnp.float32(G),
    )


def test_vio_ba_recovers_states():
    cam_left, cam_right = make_rig()
    sim = simulate(T=1.0)
    K = 6
    kf_samples = [int(i) for i in np.linspace(0, 180, K)]

    # ground truth keyframe states from the IMU simulation
    poses_gt = jnp.asarray(np.concatenate(
        [sim["q"][kf_samples], sim["pos"][kf_samples]], 1), dtype=jnp.float32)
    vel_gt = jnp.asarray(sim["vel"][kf_samples], dtype=jnp.float32)

    # landmarks + visual observations along this trajectory
    rng = np.random.default_rng(0)
    L = 40
    pw = jnp.asarray(np.stack([
        rng.uniform(-4, 4, L), rng.uniform(-3, 3, L), rng.uniform(6, 20, L)
    ], 1), dtype=jnp.float32)
    anchor = jnp.asarray(rng.integers(0, K // 2, L), dtype=jnp.int32)
    vt, inv_depth_gt = build_tables(poses_gt, pw, anchor, cam_left, cam_right)
    imu_t = make_imu_tables(sim, kf_samples)

    # perturb
    noise = jnp.asarray(np.concatenate([
        np.zeros((1, 6)),
        rng.normal(0, 1, (K - 1, 6)) * np.array([0.01, 0.01, 0.01, 0.1, 0.1, 0.1])
    ]), dtype=jnp.float32)
    params0 = BAParams(
        poses=jax.vmap(se3_boxplus)(poses_gt, noise),
        vel=vel_gt + jnp.asarray(rng.normal(0, 0.2, (K, 3)), jnp.float32),
        bias=jnp.zeros((K, 6)),
        inv_depth=inv_depth_gt * jnp.asarray(rng.uniform(0.9, 1.1, L),
                                             jnp.float32),
    )

    solve = make_window_ba(cam_left, cam_right, num_iters=10, use_imu=True,
                           imu_linearizer=make_imu_linearizer())
    kf_valid = jnp.ones(K, bool)
    kf_fixed = jnp.zeros(K, bool).at[0].set(True)
    out, cost = solve(params0, vt, empty_priors(K), kf_valid, kf_fixed,
                      imu_tables=imu_t)

    terr = jnp.linalg.norm(out.poses[:, 4:] - poses_gt[:, 4:], axis=-1)
    verr = jnp.linalg.norm(out.vel - vel_gt, axis=-1)
    t0 = jnp.linalg.norm(params0.poses[:, 4:] - poses_gt[:, 4:], axis=-1)
    print("terr:", np.asarray(terr), " (init:", np.asarray(t0), ")")
    print("verr:", np.asarray(verr))
    assert float(terr.max()) < 0.02, terr
    assert float(verr.max()) < 0.1, verr
