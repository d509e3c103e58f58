"""IMU preintegration: zero residual on perfect synthetic measurements,
first-order bias correction, state prediction, and the IMU factor inside
window BA."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry.so3 import exp_so3, quat_conj, quat_mul, quat_rotate
from lvio_fusion_tpu.ops.imu_preint import Preintegration, predict_state, preintegrate
from lvio_fusion_tpu.solver.imu_factor import imu_residual, sqrt_info_from_cov

G = 9.81007
RATE = 200.0


def simulate(T=1.0, seed=0):
    """Planar-ish trajectory with yaw rotation + sinusoidal acceleration.
    Returns dict of sampled ground truth + perfect IMU measurements."""
    n = int(T * RATE) + 1
    t = np.arange(n) / RATE
    # world acceleration & yaw rate
    acc_w = np.stack([0.8 * np.sin(2 * t), 0.5 * np.cos(3 * t),
                      0.2 * np.sin(t)], 1)
    yaw_rate = 0.4 + 0.2 * np.sin(t)
    yaw = np.concatenate([[0.0], np.cumsum(
        0.5 * (yaw_rate[1:] + yaw_rate[:-1]) / RATE)])
    vel = np.concatenate([np.zeros((1, 3)), np.cumsum(
        0.5 * (acc_w[1:] + acc_w[:-1]) / RATE, axis=0)]) + np.array([1.0, 0, 0])
    pos = np.concatenate([np.zeros((1, 3)), np.cumsum(
        0.5 * (vel[1:] + vel[:-1]) / RATE, axis=0)])

    q = np.stack([np.cos(yaw / 2), np.zeros(n), np.zeros(n),
                  np.sin(yaw / 2)], 1)  # yaw about z

    g_w = np.array([0.0, 0.0, -G])
    # accelerometer: specific force in body frame
    acc_m, gyr_m = [], []
    for i in range(n):
        R = np.asarray(jax.vmap(quat_rotate, (None, 0))(
            jnp.asarray(q[i]), jnp.eye(3))).T  # body->world
        acc_m.append(R.T @ (acc_w[i] - g_w))
        gyr_m.append(np.array([0.0, 0.0, yaw_rate[i]]))
    return dict(t=t, pos=pos, vel=vel, q=q,
                acc=np.asarray(acc_m, np.float32),
                gyr=np.asarray(gyr_m, np.float32))


def preint_full(sim, i0, i1, ba=None, bg=None, gyr_extra=0.0):
    ba = jnp.zeros(3) if ba is None else jnp.asarray(ba)
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    acc = jnp.asarray(sim["acc"][i0:i1 + 1])
    gyr = jnp.asarray(sim["gyr"][i0:i1 + 1]) + gyr_extra
    dt = jnp.full((i1 - i0 + 1,), 1.0 / RATE).at[0].set(0.0)
    return preintegrate(acc, gyr, dt, ba, bg,
                        acc_n=0.1, gyr_n=0.01, acc_w=1e-3, gyr_w=1e-4)


def test_zero_residual_on_perfect_data():
    sim = simulate()
    i0, i1 = 0, 150
    p = preint_full(sim, i0, i1)
    pose_i = jnp.concatenate([jnp.asarray(sim["q"][i0]), jnp.asarray(sim["pos"][i0])])
    pose_j = jnp.concatenate([jnp.asarray(sim["q"][i1]), jnp.asarray(sim["pos"][i1])])
    r = imu_residual(
        jnp.zeros(15), jnp.zeros(15), pose_i.astype(jnp.float32),
        jnp.asarray(sim["vel"][i0], jnp.float32), jnp.zeros(6),
        pose_j.astype(jnp.float32), jnp.asarray(sim["vel"][i1], jnp.float32),
        jnp.zeros(6), p.dp, p.dq, p.dv, p.sum_dt,
        p.dp_dba, p.dp_dbg, p.dq_dbg, p.dv_dba, p.dv_dbg,
        p.lin_ba, p.lin_bg, jnp.eye(15), jnp.float32(G))
    assert float(jnp.abs(r).max()) < 2e-2, f"residual: {r}"


def test_padding_is_noop():
    sim = simulate()
    p1 = preint_full(sim, 0, 100)
    # same buffer + 50 padded samples (dt = 0)
    acc = jnp.concatenate([jnp.asarray(sim["acc"][:101]), jnp.zeros((50, 3))])
    gyr = jnp.concatenate([jnp.asarray(sim["gyr"][:101]), jnp.zeros((50, 3))])
    dt = jnp.concatenate([jnp.full((101,), 1.0 / RATE).at[0].set(0.0),
                          jnp.zeros(50)])
    p2 = preintegrate(acc, gyr, dt, jnp.zeros(3), jnp.zeros(3),
                      0.1, 0.01, 1e-3, 1e-4)
    np.testing.assert_allclose(p1.dp, p2.dp, atol=1e-6)
    np.testing.assert_allclose(p1.dq, p2.dq, atol=1e-6)
    np.testing.assert_allclose(p1.dv, p2.dv, atol=1e-6)
    np.testing.assert_allclose(p1.sum_dt, p2.sum_dt, atol=1e-6)


def test_bias_jacobian_first_order():
    sim = simulate()
    delta = 0.02
    # gyro measurements corrupted by a constant bias delta
    p_biased = preint_full(sim, 0, 120, gyr_extra=delta)
    # exact: relinearize at the true bias
    p_exact = preint_full(sim, 0, 120, bg=jnp.full(3, delta),
                          gyr_extra=delta)
    # first-order: correct the mislinearized preintegration via jacobian
    dp_c, dq_c, dv_c = p_biased.corrected(jnp.zeros(3), jnp.full(3, delta))
    np.testing.assert_allclose(dp_c, p_exact.dp, atol=2e-3)
    np.testing.assert_allclose(dv_c, p_exact.dv, atol=2e-3)
    dq_err = quat_mul(quat_conj(dq_c), p_exact.dq)
    assert float(jnp.abs(dq_err[1:]).max()) < 2e-3


def test_predict_state_matches_ground_truth():
    sim = simulate()
    i0, i1 = 40, 200
    p = preint_full(sim, i0, i1)
    pose_i = jnp.concatenate([jnp.asarray(sim["q"][i0]),
                              jnp.asarray(sim["pos"][i0])]).astype(jnp.float32)
    pose_j, vel_j = predict_state(p, pose_i,
                                  jnp.asarray(sim["vel"][i0], jnp.float32),
                                  jnp.zeros(3), jnp.zeros(3), G)
    np.testing.assert_allclose(pose_j[4:], sim["pos"][i1], atol=2e-2)
    np.testing.assert_allclose(vel_j, sim["vel"][i1], atol=2e-2)
    dq = quat_mul(quat_conj(pose_j[:4]), jnp.asarray(sim["q"][i1], jnp.float32))
    assert float(jnp.abs(dq[1:]).max()) < 1e-2


def test_sqrt_info_is_finite_and_whitening():
    sim = simulate()
    p = preint_full(sim, 0, 100)
    si = sqrt_info_from_cov(p.cov)
    assert bool(jnp.all(jnp.isfinite(si)))
    # si^T si should reconstruct the information matrix (loosely, f32)
    info = si.T @ si
    eye = info @ (p.cov + 1e-8 * jnp.eye(15))
    # diagonal should be ~1
    d = jnp.diagonal(eye)
    assert float(jnp.abs(d - 1.0).max()) < 0.2, d
