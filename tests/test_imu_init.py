"""Inertial initialization: recover gravity direction, biases, and
velocities from a tilted-world visual trajectory + biased IMU."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.core.imu_init import gravity_alignment, inertial_init
from lvio_fusion_tpu.geometry.so3 import exp_so3, quat_mul, quat_rotate
from lvio_fusion_tpu.ops.imu_preint import preintegrate
from test_imu import G, RATE, simulate


def batch_preint(sim, kf_samples, bg_extra=0.0, ba_extra=0.0):
    rows = []
    for i0, i1 in zip(kf_samples[:-1], kf_samples[1:]):
        acc = jnp.asarray(sim["acc"][i0:i1 + 1]) + ba_extra
        gyr = jnp.asarray(sim["gyr"][i0:i1 + 1]) + bg_extra
        dt = jnp.full((i1 - i0 + 1,), 1.0 / RATE).at[0].set(0.0)
        rows.append(preintegrate(acc, gyr, dt, jnp.zeros(3), jnp.zeros(3),
                                 0.1, 0.01, 1e-3, 1e-4))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *rows)


def test_recovers_gravity_and_biases():
    sim = simulate(T=2.0)
    K = 10
    kf_samples = [int(i) for i in np.linspace(0, 380, K)]

    # tilt the "visual world" by a known rotation (vision knows nothing
    # about gravity before initialization)
    tilt = exp_so3(jnp.array([0.15, -0.1, 0.05]))
    q_v = jax.vmap(lambda q: quat_mul(tilt, q))(
        jnp.asarray(sim["q"][kf_samples], jnp.float32))
    p_v = jax.vmap(lambda p: quat_rotate(tilt, p))(
        jnp.asarray(sim["pos"][kf_samples], jnp.float32))
    poses_v = jnp.concatenate([q_v, p_v], axis=1)
    vel_v_gt = jax.vmap(lambda v: quat_rotate(tilt, v))(
        jnp.asarray(sim["vel"][kf_samples], jnp.float32))

    bg_true, ba_true = 0.02, 0.05
    pre = batch_preint(sim, kf_samples, bg_extra=bg_true, ba_extra=ba_true)

    init = inertial_init(poses_v, pre, jnp.float32(G), iters=12)

    np.testing.assert_allclose(np.asarray(init.bg), np.full(3, bg_true),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(init.ba), np.full(3, ba_true),
                               atol=6e-2)
    verr = jnp.linalg.norm(init.vel - vel_v_gt, axis=-1)
    assert float(verr.max()) < 0.1, verr

    # gravity alignment: rotating the tilted world back must make gravity
    # point along -z again: check rwg rotates +g_nominal onto tilt * +g
    g_nom = jnp.array([0.0, 0.0, 1.0])
    est_dir = quat_rotate(init.rwg, g_nom)
    true_dir = quat_rotate(tilt, g_nom)
    cos = float(jnp.dot(est_dir, true_dir))
    assert cos > 0.9995, (est_dir, true_dir)

    # applying the alignment re-levels the poses
    align = gravity_alignment(init.rwg, G)
    g_aligned = quat_rotate(align, quat_rotate(tilt, g_nom))
    np.testing.assert_allclose(np.asarray(g_aligned), [0, 0, 1], atol=0.02)
