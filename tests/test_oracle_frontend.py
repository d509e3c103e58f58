"""f64 accuracy-oracle gates for the two GN solvers not yet covered by
the window-BA / pose-graph / lidar / navsat oracles:

  * `pose_only_refine` (core/frontend.py) — the per-frame 6-DoF pose GN
    on fixed world landmarks that replaces the reference's frontend
    current-frame optimization (frontend.cpp Track -> ceres pose-only
    solve with huber loss, frontend.cpp:208-259)
  * `inertial_init` (core/imu_init.py) — the inertial-only
    initialization GN over [Rwg, bg, ba, v_0..K] (reference
    imu/tools.cpp InertialOptimization, initializer.cpp:10-130)

Same philosophy as the other oracle gates: restate the cost functional
independently in float64 (scipy Rotation / numpy — no shared math code
with the package), find the f64 optimum with scipy, and assert the f32
JAX solution's cost — measured under the f64 functional — lands within
the BASELINE 5% margin of that optimum.

For `pose_only_refine` the IRLS fixed point (weights
w = sqrt(min(1, delta/n)) recomputed at each linearization) minimizes
the exact blockwise Huber cost rho(n) = n^2 for n <= delta and
2*delta*n - delta^2 beyond, which the oracle states directly.
"""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import least_squares, minimize
from scipy.spatial.transform import Rotation

from lvio_fusion_tpu.core.frontend import pose_only_refine
from lvio_fusion_tpu.core.imu_init import inertial_init
from lvio_fusion_tpu.models.camera import Camera
from oracle_f64 import CamF64, rot

from test_imu import G, simulate
from test_imu_init import batch_preint

MARGIN = 1.05  # BASELINE: within 5% of the f64 reference solve


# ---------------------------------------------------------------------------
# pose_only_refine
# ---------------------------------------------------------------------------

def _huber_cost_pose(rv_t, lm_world, obs_px, valid, cam64, delta):
    """f64 blockwise-Huber reprojection cost at pose (rotvec, trans)."""
    R = Rotation.from_rotvec(rv_t[:3]).as_matrix()
    t = rv_t[3:]
    pred = cam64.world2pixel(lm_world, R, t)
    n2 = np.sum((pred - obs_px) ** 2, -1) + 1e-9
    n = np.sqrt(n2)
    rho = np.where(n <= delta, n2, 2.0 * delta * n - delta * delta)
    return 0.5 * float(np.sum(rho[valid]))


def test_pose_only_refine_matches_f64_oracle():
    rng = np.random.default_rng(7)
    N = 64
    cam = Camera.create(320.0, 320.0, 320.0, 240.0,
                        jnp.array([1.0, 0, 0, 0, 0.1, 0.0, 0.05]))
    cam64 = CamF64(cam)

    # true pose, landmarks in front of the camera
    rv_true = np.array([0.05, -0.08, 0.03, 0.4, -0.2, 0.1])
    R_true = Rotation.from_rotvec(rv_true[:3]).as_matrix()
    t_true = rv_true[3:]
    lm = np.stack([rng.uniform(-4, 4, N), rng.uniform(-3, 3, N),
                   rng.uniform(6, 14, N)], -1)
    # push landmarks into the world frame of the true pose
    lm_world = lm @ R_true.T + t_true

    obs = cam64.world2pixel(lm_world, R_true, t_true)
    obs += rng.normal(0, 0.4, obs.shape)           # inlier pixel noise
    obs[:6] += rng.uniform(12, 25, (6, 2))         # outliers -> Huber active
    valid = np.ones(N, bool)
    valid[-8:] = False
    lm_world[-8:] = rng.normal(0, 100, (8, 3))     # masked garbage rows

    # perturbed initial pose
    rv0 = rv_true + np.array([0.03, -0.02, 0.025, 0.15, -0.1, 0.12])
    q0 = Rotation.from_rotvec(rv0[:3]).as_quat(scalar_first=True)
    pose0 = jnp.asarray(np.concatenate([q0, rv0[3:]]), jnp.float32)

    huber = 3.0
    pose_f32, inl = pose_only_refine(pose0, jnp.asarray(lm_world, jnp.float32),
                                     jnp.asarray(obs, jnp.float32),
                                     jnp.asarray(valid), cam, iters=8,
                                     huber_px=huber)

    # f64 oracle: minimize the identical robust cost from the same init
    fun = lambda x: _huber_cost_pose(x, lm_world, obs, valid, cam64, huber)
    best = min(
        (minimize(fun, x0, method="Nelder-Mead",
                  options={"xatol": 1e-12, "fatol": 1e-14, "maxiter": 40000})
         for x0 in (rv0, rv_true)),
        key=lambda r: r.fun)

    T = np.asarray(pose_f32, np.float64)
    x_f32 = np.concatenate([rot(T[:4]).as_rotvec(), T[4:]])
    c_f32 = fun(x_f32)
    assert c_f32 <= MARGIN * best.fun + 1e-9, (c_f32, best.fun)

    # sanity: the solve lands at the f64 optimum (NOT at rv_true — the
    # exact Huber optimum of this seeded instance sits 0.0288 m from the
    # truth, so truth-distance is not what the solver controls) and the
    # initial perturbation (0.22 m) was actually corrected
    assert np.linalg.norm(x_f32[3:] - best.x[3:]) < 0.01
    assert np.linalg.norm(x_f32[3:] - rv_true[3:]) < 0.06
    assert int(np.asarray(inl).sum()) >= N - 8 - 6


# ---------------------------------------------------------------------------
# inertial_init
# ---------------------------------------------------------------------------

def _inertial_cost_f64(pre, poses, g_norm, prior_bg, prior_ba):
    """Build the f64 cost functional over x = [rv_wg(3), bg(3), ba(3),
    vel(3K)] from the same preintegration tables the f32 solver sees."""
    n = lambda a: np.asarray(a, np.float64)
    M = int(np.asarray(pre.sum_dt).shape[0])
    K = M + 1
    dp, dq, dv = n(pre.dp), n(pre.dq), n(pre.dv)
    dts, jac = n(pre.sum_dt), n(pre.jac)
    lin_ba, lin_bg = n(pre.lin_ba), n(pre.lin_bg)
    Rs = [rot(p[:4]).as_matrix() for p in n(poses)]
    ts = n(poses)[:, 4:]

    def residuals(x):
        Rwg = Rotation.from_rotvec(x[:3]).as_matrix()
        bg, ba = x[3:6], x[6:9]
        vel = x[9:].reshape(K, 3)
        g = Rwg @ np.array([0.0, 0.0, g_norm])
        out = []
        for i in range(M):
            t = dts[i]
            dba = ba - lin_ba[i]
            dbg = bg - lin_bg[i]
            cdq = rot(dq[i]) * Rotation.from_rotvec(jac[i, 3:6, 12:15] @ dbg)
            cdv = dv[i] + jac[i, 6:9, 9:12] @ dba + jac[i, 6:9, 12:15] @ dbg
            cdp = dp[i] + jac[i, 0:3, 9:12] @ dba + jac[i, 0:3, 12:15] @ dbg
            Ri = Rs[i]
            r_p = Ri.T @ (0.5 * g * t * t + ts[i + 1] - ts[i]
                          - vel[i] * t) - cdp
            q_err = (cdq.inv()
                     * Rotation.from_matrix(Ri.T @ Rs[i + 1]))
            qv = q_err.as_quat(scalar_first=True)
            if qv[0] < 0:
                qv = -qv
            r_q = 2.0 * qv[1:]
            r_v = Ri.T @ (g * t + vel[i + 1] - vel[i]) - cdv
            out.append(np.concatenate([r_p, 100.0 * r_q, r_v]))
        out.append(prior_bg * bg)
        out.append(prior_ba * ba)
        return np.concatenate(out)

    return residuals, K


def test_inertial_init_matches_f64_oracle():
    sim = simulate(T=2.0)
    K = 10
    kf = [int(i) for i in np.linspace(0, 380, K)]
    poses = jnp.asarray(np.concatenate([sim["q"][kf], sim["pos"][kf]], 1),
                        jnp.float32)
    pre = batch_preint(sim, kf, bg_extra=0.02, ba_extra=0.05)

    prior_bg, prior_ba = 1.0, 10.0
    init = inertial_init(poses, pre, jnp.float32(G), iters=12,
                         prior_bg=prior_bg, prior_ba=prior_ba)

    residuals, K_ = _inertial_cost_f64(pre, poses, G, prior_bg, prior_ba)
    cost = lambda x: 0.5 * float(residuals(x) @ residuals(x))

    # f64 optimum from a crude start (gravity along +z, zero biases,
    # finite-difference velocities)
    dpos = np.asarray(poses, np.float64)[1:, 4:] - np.asarray(
        poses, np.float64)[:-1, 4:]
    v0 = dpos / np.asarray(pre.sum_dt, np.float64)[:, None]
    v0 = np.concatenate([v0, v0[-1:]], 0)
    x0 = np.concatenate([np.zeros(6), np.zeros(3), v0.reshape(-1)])
    res = least_squares(residuals, x0, method="trf", jac="3-point",
                        xtol=1e-14, ftol=1e-14, gtol=1e-14, max_nfev=4000)
    c_opt = 0.5 * float(res.fun @ res.fun)

    # evaluate the f32 solution under the f64 functional
    x_f32 = np.concatenate([
        rot(np.asarray(init.rwg, np.float64)).as_rotvec(),
        np.asarray(init.bg, np.float64), np.asarray(init.ba, np.float64),
        np.asarray(init.vel, np.float64).reshape(-1)])
    c_f32 = cost(x_f32)
    assert c_f32 <= MARGIN * c_opt + 1e-12, (c_f32, c_opt)
