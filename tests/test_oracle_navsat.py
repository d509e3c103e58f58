"""f64 accuracy-oracle gates for the navsat GN solvers (navsat/navsat.py):

  * `_init_refine` — 6-DoF ENU->map extrinsic refinement (reference
    Navsat::Initialize second DENSE_QR pass, navsat.cpp:100-133)
  * `_bc_solve` — DoF-masked rpyxyz alignment of one section frame to its
    GPS fix points (reference Navsat::OptimizeBC, navsat.cpp:192-269)
  * `_ab_solve` — turning-segment chain smoothing with Huber GPS anchors
    (reference Navsat::OptimizeAB, navsat.cpp:271-307)

All three use IRLS Huber (weights w = sqrt(min(1, delta/n)) recomputed at
each linearization), whose fixed point minimizes the exact blockwise Huber
cost rho(n) = n^2 for n <= delta, 2*delta*n - delta^2 beyond. The oracle
states that robust cost directly in float64 (independent math, shared
conventions only) and minimizes it with scipy; the f32 solution's cost must
land within the BASELINE 5% margin of the f64 optimum.
"""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from lvio_fusion_tpu.navsat.navsat import _ab_solve, _bc_solve, _init_refine
from test_oracle_graph import (
    _qexp,
    _qlog,
    _qmul,
    _qrot,
    boxplus64,
    rpyxyz64,
    se3_apply64,
    se3_exp64,
    se3_inv64,
    se3_mul64,
)

MARGIN = 1.05
DELTA = 2.0  # Huber scale (meters) used by all three solvers


def huber(n):
    return np.where(n <= DELTA, n * n, 2.0 * DELTA * n - DELTA * DELTA)


def rpyxyz_to_se3_64(para):
    r, p, y = para[0], para[1], para[2]
    q = _qmul(_qexp(np.array([0.0, 0.0, y])),
              _qmul(_qexp(np.array([0.0, p, 0.0])),
                    _qexp(np.array([r, 0.0, 0.0]))))
    return np.concatenate([q, para[3:]])


def _apply_batch(T, pts):
    w, x, y, z = T[:4]
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return pts @ R.T + T[4:]


def _minimize(cost, x0):
    res = minimize(cost, x0, method="BFGS",
                   options={"gtol": 1e-12, "maxiter": 2000})
    # polish (BFGS with numeric gradients can stall shy of the optimum)
    res = minimize(cost, res.x, method="Nelder-Mead",
                   options={"xatol": 1e-12, "fatol": 1e-14,
                            "maxiter": 20000, "maxfev": 20000})
    return res


def _check(label, cost_f32, cost_opt):
    print(f"[{label}] oracle cost={cost_opt:.8f} f32 cost={cost_f32:.8f} "
          f"ratio={cost_f32 / max(cost_opt, 1e-12):.5f}")
    assert cost_f32 <= MARGIN * cost_opt + 1e-9


def test_init_refine_matches_f64_oracle():
    rng = np.random.default_rng(5)
    K = 14
    raw = rng.uniform(-40, 40, (K, 3))
    raw[:, 2] = rng.uniform(-2, 2, K)
    ext_gt = boxplus64(np.array([1.0, 0, 0, 0, 0, 0, 0.0]),
                       np.array([0.01, -0.02, 0.3, 2.0, -1.5, 0.4]))
    kf_p = _apply_batch(ext_gt, raw) + rng.normal(0, 0.3, (K, 3))
    kf_p[3] += np.array([4.0, -3.0, 1.0])  # outlier engages the Huber
    ext0 = boxplus64(ext_gt, np.array([0.02, 0.01, -0.05, 0.5, 0.8, -0.2]))

    out = np.asarray(_init_refine(
        jnp.asarray(ext0, jnp.float32), jnp.asarray(raw, jnp.float32),
        jnp.asarray(kf_p, jnp.float32), jnp.ones(K)))

    def cost_of_ext(T):
        n = np.linalg.norm(_apply_batch(T, raw) - kf_p, axis=-1)
        return float(np.sum(huber(n)))

    res = _minimize(lambda x: cost_of_ext(boxplus64(ext0, x)), np.zeros(6))
    _check("navsat-init", cost_of_ext(out.astype(np.float64)), res.fun)


def _bc_problem(free):
    rng = np.random.default_rng(9)
    K = 12
    rel_p = rng.uniform(-15, 15, (K, 3))
    rel_p[:, 2] = rng.uniform(-1, 1, K)
    base = boxplus64(np.array([1.0, 0, 0, 0, 0, 0, 0.0]),
                     np.array([0.0, 0.0, 0.4, 3.0, 1.0, 0.0]))
    para_gt = np.array([0.015, -0.02, 0.06, 0.9, -0.7, 0.3])
    T_gt = se3_mul64(base, rpyxyz_to_se3_64(para_gt))
    fixp = _apply_batch(T_gt, rel_p) + rng.normal(0, 0.25, (K, 3))
    fixp[5] += np.array([-3.5, 2.5, 0.8])  # outlier
    mask = np.array([1.0 if f else 0.0 for f in free])
    return base, rel_p, fixp, mask


def _bc_oracle_cost(base, rel_p, fixp, mask, z_prior_w):
    def cost(para):
        T = se3_mul64(base, rpyxyz_to_se3_64(para * mask))
        n = np.linalg.norm(_apply_batch(T, rel_p) - fixp, axis=-1)
        return float(np.sum(huber(n)) + (z_prior_w * para[5]) ** 2)
    return cost


def test_bc_solve_full_matches_f64_oracle():
    base, rel_p, fixp, mask = _bc_problem([True] * 6)
    z_w = 0.7
    out = np.asarray(_bc_solve(
        jnp.asarray(base, jnp.float32), jnp.asarray(rel_p, jnp.float32),
        jnp.asarray(fixp, jnp.float32), jnp.ones(len(rel_p)),
        jnp.asarray(mask, jnp.float32), jnp.float32(z_w)))
    cost = _bc_oracle_cost(base, rel_p, fixp, mask, z_w)
    res = _minimize(cost, np.zeros(6))
    # the f32 solve returns the pose; measure its cost via the para that
    # produced it — recover by measuring directly on the pose instead
    T64 = out.astype(np.float64)

    def cost_of_pose(T, para5):
        n = np.linalg.norm(_apply_batch(T, rel_p) - fixp, axis=-1)
        return float(np.sum(huber(n)) + (z_w * para5) ** 2)

    # para[5] of the solution: z component of base^{-1} * T
    para5 = se3_mul64(se3_inv64(base), T64)[6]
    _check("navsat-bc-full", cost_of_pose(T64, para5), res.fun)


def test_bc_solve_masked_matches_f64_oracle():
    # longitudinal-fix mask (reference mode 0b110111: x free only, plus
    # yaw here to exercise a rotation DoF)
    free = [False, False, True, True, False, False]
    base, rel_p, fixp, mask = _bc_problem(free)
    out = np.asarray(_bc_solve(
        jnp.asarray(base, jnp.float32), jnp.asarray(rel_p, jnp.float32),
        jnp.asarray(fixp, jnp.float32), jnp.ones(len(rel_p)),
        jnp.asarray(mask, jnp.float32), jnp.float32(0.0)))
    cost = _bc_oracle_cost(base, rel_p, fixp, mask, 0.0)
    res = _minimize(cost, np.zeros(6))
    rel = se3_mul64(se3_inv64(base), out.astype(np.float64))
    para = rpyxyz64(rel) * mask  # masked dims stay exactly zero
    _check("navsat-bc-masked", cost(para), res.fun)
    # masked DoF must not have moved: base^{-1}*T has zero r/p/y/z
    assert np.abs((rpyxyz64(rel) * (1 - mask))).max() < 1e-5


def test_ab_solve_matches_f64_oracle():
    rng = np.random.default_rng(3)
    C, n = 8, 7
    # a gentle arc of poses with GPS anchors pulled sideways
    poses = []
    pos = np.zeros(3)
    for i in range(n):
        q = _qexp(np.array([0.0, 0.0, 0.12 * i]))
        poses.append(np.concatenate([q, pos]))
        pos = pos + _qrot(q, np.array([6.0, 0.0, 0.0]))
    poses0 = np.zeros((C, 7))
    poses0[:, 0] = 1.0
    poses0[:n] = np.stack(poses)
    fixp = np.zeros((C, 3))
    fixp[:n] = poses0[:n, 4:] + rng.normal(0, 0.4, (n, 3))
    fixp[2] += np.array([2.5, -2.0, 0.5])  # one anchor outlier
    fix_valid = np.zeros(C, bool)
    fix_valid[:n] = True

    out = np.asarray(_ab_solve(
        jnp.asarray(poses0, jnp.float32), jnp.asarray(fixp, jnp.float32),
        jnp.asarray(fix_valid), jnp.asarray(n)))[:n]

    meas_rel = [se3_mul64(se3_inv64(poses0[i]), poses0[i + 1])
                for i in range(n - 1)]

    def cost_of_poses(ps):
        c = 0.0
        for i in range(n - 1):
            rel = se3_mul64(se3_inv64(ps[i]), ps[i + 1])
            err = rpyxyz64(se3_mul64(se3_inv64(meas_rel[i]), rel))
            tw = 10.0 if i == n - 2 else 1.0
            aw = np.array([20.0, 20.0, 20.0, tw, tw, tw])
            c += float(np.sum((aw * err) ** 2))
        for i in range(n):
            nrm = np.linalg.norm(3.0 * (ps[i][4:] - fixp[i]))
            c += float(huber(nrm))
        return c

    def cost(x):
        ps = [poses0[i].copy() for i in range(n)]
        for k, i in enumerate(range(1, n - 1)):
            ps[i] = boxplus64(poses0[i], x[6 * k:6 * k + 6])
        return cost_of_poses(ps)

    res = _minimize(cost, np.zeros(6 * (n - 2)))
    _check("navsat-ab", cost_of_poses([p.astype(np.float64) for p in out]),
           res.fun)
    # endpoints fixed
    assert np.allclose(out[0], poses0[0], atol=1e-6)
    assert np.allclose(out[-1], poses0[n - 1], atol=1e-6)
