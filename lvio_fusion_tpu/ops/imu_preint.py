"""IMU preintegration as a lax.scan over raw samples.

VINS-Mono-style midpoint integration with 15x15 bias Jacobian and
covariance propagation (18-dim noise) — math parity with the reference
(preintegration.cpp:30-142, state order [p(0) r(3) v(6) ba(9) bg(12)],
gravity convention g = (0,0,+9.81007) with world +z up, accelerometer
measuring specific force).

The whole buffer integrates in ONE fused scan (the reference loops sample
by sample on the CPU); padded samples use dt=0, which is an exact no-op of
the recursion, so fixed-capacity buffers jit cleanly.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from lvio_fusion_tpu.geometry.so3 import (
    exp_so3, quat_mul, quat_normalize, quat_rotate, quat_to_mat, skew,
)

# state order within the 15-dim preintegration state
O_T, O_R, O_V, O_BA, O_BG = 0, 3, 6, 9, 12


@flax.struct.dataclass
class Preintegration:
    """Result of integrating an IMU sample buffer between two frames."""

    dp: jnp.ndarray        # (3,) position delta (body_i frame)
    dq: jnp.ndarray        # (4,) rotation delta quaternion
    dv: jnp.ndarray        # (3,) velocity delta
    sum_dt: jnp.ndarray    # scalar
    jac: jnp.ndarray       # (15, 15) d(state)/d(bias) chain
    cov: jnp.ndarray       # (15, 15) propagated covariance
    lin_ba: jnp.ndarray    # (3,) linearization-point accel bias
    lin_bg: jnp.ndarray    # (3,) linearization-point gyro bias

    @property
    def dp_dba(self):
        return self.jac[O_T:O_T + 3, O_BA:O_BA + 3]

    @property
    def dp_dbg(self):
        return self.jac[O_T:O_T + 3, O_BG:O_BG + 3]

    @property
    def dq_dbg(self):
        return self.jac[O_R:O_R + 3, O_BG:O_BG + 3]

    @property
    def dv_dba(self):
        return self.jac[O_V:O_V + 3, O_BA:O_BA + 3]

    @property
    def dv_dbg(self):
        return self.jac[O_V:O_V + 3, O_BG:O_BG + 3]

    def corrected(self, ba, bg):
        """First-order bias-corrected deltas (preintegration.cpp:190-245)."""
        dba = ba - self.lin_ba
        dbg = bg - self.lin_bg
        dq = quat_mul(self.dq, exp_so3(self.dq_dbg @ dbg))
        dv = self.dv + self.dv_dba @ dba + self.dv_dbg @ dbg
        dp = self.dp + self.dp_dba @ dba + self.dp_dbg @ dbg
        return dp, quat_normalize(dq), dv



def make_preintegrator(acc_n: float, gyr_n: float, acc_w: float,
                       gyr_w: float):
    """Jitted full preintegration with the noise densities baked in,
    shared across Estimator instances with the same IMU parameters
    (utils/memo.py: per-instance jit wrappers re-trace)."""
    import jax

    @jax.jit
    def _preint(acc, gyr, dt, ba, bg):
        return preintegrate(acc, gyr, dt, ba, bg, acc_n, gyr_n,
                            acc_w, gyr_w)

    return _preint


from lvio_fusion_tpu.utils.memo import builder_memo

make_preintegrator = builder_memo(make_preintegrator)


def preintegrate(acc, gyr, dt, ba, bg, acc_n, gyr_n, acc_w, gyr_w):
    """Integrate buffers acc/gyr (S, 3) with per-step dt (S,) from the
    linearization biases ba/bg. dt[k] is the interval between sample k-1
    and k (dt[0] ignored); padded entries use dt=0 (exact no-op).
    """
    dtype = acc.dtype
    noise = jnp.zeros((18, 18), dtype)
    n = jnp.asarray([acc_n ** 2] * 3 + [gyr_n ** 2] * 3
                    + [acc_n ** 2] * 3 + [gyr_n ** 2] * 3
                    + [acc_w ** 2] * 3 + [gyr_w ** 2] * 3, dtype)
    noise = jnp.diag(n)
    I3 = jnp.eye(3, dtype=dtype)

    def step(carry, inp):
        dp, dq, dv, J, P, a0, g0, sdt = carry
        a1, g1, h = inp  # h = dt

        un_gyr = 0.5 * (g0 + g1) - bg
        dq_new = quat_normalize(quat_mul(
            dq, jnp.concatenate([jnp.ones(1, dtype), un_gyr * h / 2])))
        un_acc0 = quat_rotate(dq, a0 - ba)
        un_acc1 = quat_rotate(dq_new, a1 - ba)
        un_acc = 0.5 * (un_acc0 + un_acc1)
        dp_new = dp + dv * h + 0.5 * un_acc * h * h
        dv_new = dv + un_acc * h

        # jacobian/covariance propagation (preintegration.cpp:50-100)
        R0 = quat_to_mat(dq)
        R1 = quat_to_mat(dq_new)
        Rw = skew(un_gyr)
        Ra0 = skew(a0 - ba)
        Ra1 = skew(a1 - ba)

        F = jnp.zeros((15, 15), dtype)
        F = F.at[0:3, 0:3].set(I3)
        F = F.at[0:3, 3:6].set(
            -0.25 * R0 @ Ra0 * h * h
            - 0.25 * R1 @ Ra1 @ (I3 - Rw * h) * h * h)
        F = F.at[0:3, 6:9].set(I3 * h)
        F = F.at[0:3, 9:12].set(-0.25 * (R0 + R1) * h * h)
        F = F.at[0:3, 12:15].set(0.25 * R1 @ Ra1 * h * h * h)
        F = F.at[3:6, 3:6].set(I3 - Rw * h)
        F = F.at[3:6, 12:15].set(-I3 * h)
        F = F.at[6:9, 3:6].set(
            -0.5 * R0 @ Ra0 * h - 0.5 * R1 @ Ra1 @ (I3 - Rw * h) * h)
        F = F.at[6:9, 6:9].set(I3)
        F = F.at[6:9, 9:12].set(-0.5 * (R0 + R1) * h)
        F = F.at[6:9, 12:15].set(0.5 * R1 @ Ra1 * h * h)
        F = F.at[9:12, 9:12].set(I3)
        F = F.at[12:15, 12:15].set(I3)

        V = jnp.zeros((15, 18), dtype)
        V = V.at[0:3, 0:3].set(0.25 * R0 * h * h)
        v03 = -0.25 * R1 @ Ra1 * h * h * 0.5 * h
        V = V.at[0:3, 3:6].set(v03)
        V = V.at[0:3, 6:9].set(0.25 * R1 * h * h)
        V = V.at[0:3, 9:12].set(v03)
        V = V.at[3:6, 3:6].set(0.5 * I3 * h)
        V = V.at[3:6, 9:12].set(0.5 * I3 * h)
        V = V.at[6:9, 0:3].set(0.5 * R0 * h)
        v63 = -0.5 * R1 @ Ra1 * h * 0.5 * h
        V = V.at[6:9, 3:6].set(v63)
        V = V.at[6:9, 6:9].set(0.5 * R1 * h)
        V = V.at[6:9, 9:12].set(v63)
        V = V.at[9:12, 12:15].set(I3 * h)
        V = V.at[12:15, 15:18].set(I3 * h)

        J_new = F @ J
        P_new = F @ P @ F.T + V @ noise @ V.T

        # dt = 0 is a padded / first sample: keep state, slide the window
        is_pad = h <= 0.0
        keep = lambda new, old: jnp.where(is_pad, old, new)
        carry = (keep(dp_new, dp), keep(dq_new, dq), keep(dv_new, dv),
                 keep(J_new, J), keep(P_new, P), a1, g1,
                 sdt + jnp.maximum(h, 0.0))
        return carry, None

    init = (jnp.zeros(3, dtype), jnp.array([1.0, 0, 0, 0], dtype),
            jnp.zeros(3, dtype), jnp.eye(15, dtype=dtype),
            jnp.zeros((15, 15), dtype), acc[0], gyr[0],
            jnp.zeros((), dtype))
    (dp, dq, dv, J, P, _, _, sum_dt), _ = jax.lax.scan(
        step, init, (acc, gyr, dt))
    return Preintegration(dp=dp, dq=dq, dv=dv, sum_dt=sum_dt, jac=J, cov=P,
                          lin_ba=ba, lin_bg=bg)


def preintegrate_light(acc, gyr, dt, ba, bg):
    """Midpoint preintegration WITHOUT Jacobian/covariance propagation —
    the cheap form used only as a warp-seed predictor inside the batched
    frontend program (one (dp, dq, dv, sum_dt) per frame interval; the
    full 15x15 propagation still runs per keyframe for the BA factors).
    Same conventions as :func:`preintegrate`: dt[0] is ignored (anchor
    row), padded rows use dt=0 (exact no-op)."""
    dtype = acc.dtype

    def step(carry, inp):
        dp, dq, dv, a0, g0, sdt = carry
        a1, g1, h = inp
        un_gyr = 0.5 * (g0 + g1) - bg
        dq_new = quat_normalize(quat_mul(
            dq, jnp.concatenate([jnp.ones(1, dtype), un_gyr * h / 2])))
        un_acc = 0.5 * (quat_rotate(dq, a0 - ba)
                        + quat_rotate(dq_new, a1 - ba))
        dp_new = dp + dv * h + 0.5 * un_acc * h * h
        dv_new = dv + un_acc * h
        is_pad = h <= 0.0
        keep = lambda new, old: jnp.where(is_pad, old, new)
        return (keep(dp_new, dp), keep(dq_new, dq), keep(dv_new, dv),
                a1, g1, sdt + jnp.maximum(h, 0.0)), None

    init = (jnp.zeros(3, dtype), jnp.array([1.0, 0, 0, 0], dtype),
            jnp.zeros(3, dtype), acc[0], gyr[0], jnp.zeros((), dtype))
    (dp, dq, dv, _, _, sum_dt), _ = jax.lax.scan(step, init, (acc, gyr, dt))
    return dp, dq, dv, sum_dt


def predict_from_delta(pose_i, vel_i, dp, dq, dv, sum_dt, g_norm):
    """Forward state prediction from a raw preintegration delta
    (PredictState, frontend.cpp:437-451; world gravity along -z, i.e.
    valid only once the map is gravity-aligned)."""
    g = jnp.array([0.0, 0.0, -g_norm], dtype=pose_i.dtype)
    qi, pi = pose_i[:4], pose_i[4:]
    p_j = pi + vel_i * sum_dt + 0.5 * g * sum_dt * sum_dt \
        + quat_rotate(qi, dp)
    q_j = quat_normalize(quat_mul(qi, dq))
    v_j = vel_i + g * sum_dt + quat_rotate(qi, dv)
    return jnp.concatenate([q_j, p_j]), v_j


def predict_state(preint: Preintegration, pose_i, vel_i, ba, bg, g_norm):
    """Forward state prediction from a preintegration (PredictState,
    frontend.cpp:437-451)."""
    g = jnp.array([0.0, 0.0, -g_norm], dtype=pose_i.dtype)  # world gravity
    dp, dq, dv = preint.corrected(ba, bg)
    qi, pi = pose_i[:4], pose_i[4:]
    t = preint.sum_dt
    p_j = pi + vel_i * t + 0.5 * g * t * t + quat_rotate(qi, dp)
    q_j = quat_normalize(quat_mul(qi, dq))
    v_j = vel_i + g * t + quat_rotate(qi, dv)
    return jnp.concatenate([q_j, p_j]), v_j
