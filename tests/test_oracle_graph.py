"""f64 accuracy-oracle gates for the two GN solvers NOT covered by
tests/test_oracle_f64.py (which gates the window BA):

  * the pose-graph section-chain solve (loop/pose_graph.py `_make_solver`,
    reference PoseGraph::Optimize, pose_graph.cpp:198-224)
  * the lidar scan-to-map DoF-split stages (lidar/mapping.py `_masked_gn`,
    reference Mapping::Optimize RPZ/YXY, mapping.cpp:139-191)

Same philosophy as the window-BA oracle: re-implement the residual math
independently in float64 numpy (no shared code with the package), solve the
identical problem with scipy least_squares, and assert the f32 JAX solution's
cost — measured under the f64 cost functional — lands within the BASELINE 5%
margin of the f64 optimum.

The lidar oracle uses exactly-planar synthetic map clouds: any coplanar 3-NN
triple then defines the same plane, so the kNN re-association inside the GN
loop reduces to a smooth analytic point-to-plane objective the oracle can
state in closed form.
"""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import least_squares

from lvio_fusion_tpu.lidar.mapping import RPZ_MASK, YXY_MASK, _masked_gn
from lvio_fusion_tpu.loop.pose_graph import PoseGraph

MARGIN = 1.05  # BASELINE: within 5% of the f64 reference solve

# ---------------------------------------------------------------------------
# independent float64 SE3 math (quat wxyz + trans; tangent [phi, rho];
# left-multiplicative retraction) — mirrors the *conventions*, not the code
# ---------------------------------------------------------------------------


def _qmul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _qconj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def _qrot(q, v):
    qv = np.concatenate([[0.0], np.atleast_1d(v)])
    return _qmul(_qmul(q, qv), _qconj(q))[1:]


def _qexp(phi):
    th = np.linalg.norm(phi)
    if th < 1e-12:
        return np.array([1.0, 0.5 * phi[0], 0.5 * phi[1], 0.5 * phi[2]])
    u = phi / th
    return np.concatenate([[np.cos(0.5 * th)], np.sin(0.5 * th) * u])


def _qlog(q):
    q = q / np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    vn = np.linalg.norm(q[1:])
    if vn < 1e-12:
        return 2.0 * q[1:]
    return 2.0 * np.arctan2(vn, q[0]) * q[1:] / vn


def _hat(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def se3_mul64(A, B):
    q = _qmul(A[:4], B[:4])
    return np.concatenate([q / np.linalg.norm(q),
                           _qrot(A[:4], B[4:]) + A[4:]])


def se3_inv64(T):
    qi = _qconj(T[:4])
    return np.concatenate([qi, -_qrot(qi, T[4:])])


def se3_apply64(T, p):
    return _qrot(T[:4], p) + T[4:]


def se3_exp64(xi):
    phi, rho = xi[:3], xi[3:]
    th = np.linalg.norm(phi)
    P = _hat(phi)
    if th < 1e-8:
        V = np.eye(3) + 0.5 * P + P @ P / 6.0
    else:
        V = (np.eye(3) + (1 - np.cos(th)) / th**2 * P
             + (th - np.sin(th)) / th**3 * P @ P)
    return np.concatenate([_qexp(phi), V @ rho])


def se3_log64(T):
    phi = _qlog(T[:4])
    th = np.linalg.norm(phi)
    P = _hat(phi)
    if th < 1e-8:
        Vi = np.eye(3) - 0.5 * P + P @ P / 12.0
    else:
        half = 0.5 * th
        c = (1.0 - half * np.cos(half) / np.sin(half)) / th**2
        Vi = np.eye(3) - 0.5 * P + c * (P @ P)
    return np.concatenate([phi, Vi @ T[4:]])


def boxplus64(T, xi):
    return se3_mul64(se3_exp64(xi), T)


def _rpy64(q):
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return np.array([
        np.arctan2(R[2, 1], R[2, 2]),
        np.arcsin(np.clip(-R[2, 0], -1.0, 1.0)),
        np.arctan2(R[1, 0], R[0, 0]),
    ])


def rpyxyz64(T):
    return np.concatenate([_rpy64(T[:4]), T[4:]])


# ---------------------------------------------------------------------------
# pose-graph section-chain oracle
# ---------------------------------------------------------------------------

AXIS_W = np.array([1.0, 1.0, 1.0, 1.0, 10.0, 10.0])


class GraphOracle:
    """f64 replica of the section-chain problem: relative-pose chain over the
    measured poses + per-anchor rotation priors, endpoints fixed."""

    def __init__(self, poses_meas, poses0):
        self.meas = np.asarray(poses_meas, np.float64)
        self.p0 = np.asarray(poses0, np.float64)
        self.n = len(self.p0)
        self.free = list(range(1, self.n - 1))
        self.meas_rel = [
            se3_mul64(se3_inv64(self.meas[i]), self.meas[i + 1])
            for i in range(self.n - 1)
        ]

    def _poses_of(self, x):
        poses = [p.copy() for p in self.p0]
        for k, i in enumerate(self.free):
            poses[i] = boxplus64(self.p0[i], x[6 * k:6 * k + 6])
        return poses

    def residuals(self, x):
        poses = self._poses_of(x)
        rs = []
        for i in range(self.n - 1):
            rel = se3_mul64(se3_inv64(poses[i]), poses[i + 1])
            err = se3_mul64(se3_inv64(self.meas_rel[i]), rel)
            rs.append(AXIS_W * rpyxyz64(err))
        for i in range(self.n):
            rel_q = se3_mul64(se3_inv64(self.meas[i]), poses[i])[:4]
            rs.append(_qlog(rel_q))
        return np.concatenate(rs)

    def cost_of_poses(self, poses_f32):
        poses = [np.asarray(p, np.float64) for p in poses_f32]
        saved, self.p0 = self.p0, poses
        c = float(np.sum(self.residuals(np.zeros(6 * len(self.free))) ** 2))
        self.p0 = saved
        return c

    def solve(self):
        res = least_squares(self.residuals, np.zeros(6 * len(self.free)),
                            method="lm", xtol=1e-15, ftol=1e-15, gtol=1e-15,
                            max_nfev=20000)
        poses = self._poses_of(res.x)
        return {"cost": float(np.sum(res.fun ** 2)), "poses": poses}


def _chain_poses():
    """6 anchors along a turning path (yaw follows heading, small roll/
    pitch), as the sectioning stage would emit them."""
    n = 6
    poses = []
    pos = np.zeros(3)
    yaw = 0.0
    for i in range(n):
        q = _qexp(np.array([0.0, 0.0, yaw]))
        q = _qmul(q, _qexp(np.array([0.01 * i, -0.008 * i, 0.0])))
        poses.append(np.concatenate([q, pos]))
        step = _qrot(q, np.array([8.0, 0.0, 0.05 * (i % 2)]))
        pos = pos + step
        yaw += 0.18
    return np.stack(poses)


def test_posegraph_section_solve_matches_f64_oracle():
    meas = _chain_poses()
    n = len(meas)
    # a loop correction moved the newest (fixed) endpoint: the solve must
    # distribute the correction over the interior anchors
    corr = se3_exp64(np.array([0.0, 0.0, 0.035, 0.8, 0.5, 0.1]))
    poses0 = meas.copy()
    poses0[-1] = se3_mul64(corr, meas[-1])

    pg = PoseGraph()
    solve = pg._make_solver()
    out = np.asarray(solve(
        jnp.asarray(pg._pad_poses(meas.astype(np.float32))),
        jnp.asarray(pg._pad_poses(poses0.astype(np.float32))),
        jnp.asarray(n)))[:n]

    oracle = GraphOracle(meas, poses0)
    ref = oracle.solve()
    cost_f32 = oracle.cost_of_poses(out)
    print(f"[posegraph] oracle cost={ref['cost']:.8f} "
          f"f32 cost={cost_f32:.8f} "
          f"ratio={cost_f32 / max(ref['cost'], 1e-12):.5f}")
    assert cost_f32 <= MARGIN * ref["cost"] + 1e-9
    dp = np.linalg.norm(out[:, 4:] - np.stack(ref["poses"])[:, 4:], axis=-1)
    dq = np.stack(ref["poses"])[:, :4]
    dd = np.abs(np.sum(out[:, :4].astype(np.float64) * dq, -1))
    dr = np.degrees(2 * np.arccos(np.clip(dd, -1, 1)))
    print(f"[posegraph] |dt| max={dp.max():.6f} m  dR max={dr.max():.4f} deg")
    assert dp.max() < 0.02
    assert dr.max() < 0.05
    # endpoints stayed fixed
    assert np.allclose(out[0], poses0[0], atol=1e-6)
    assert np.allclose(out[-1], poses0[-1], atol=1e-6)


# ---------------------------------------------------------------------------
# lidar scan-to-map DoF-split oracle
# ---------------------------------------------------------------------------


def _plane_grid(rng, axis, offset, lo, hi, step, height=None, jitter=0.12):
    """Jittered point grid on an axis-aligned plane (jitter strictly
    in-plane, so every point lies EXACTLY on the plane)."""
    u = np.arange(lo, hi, step)
    v = np.arange(*(height if height else (lo, hi)), step)
    uu, vv = np.meshgrid(u, v)
    uu = uu.ravel() + rng.uniform(-jitter, jitter, uu.size)
    vv = vv.ravel() + rng.uniform(-jitter, jitter, vv.size)
    pts = np.zeros((uu.size, 3))
    others = [i for i in range(3) if i != axis]
    pts[:, axis] = offset
    pts[:, others[0]] = uu
    pts[:, others[1]] = vv
    return pts


def _lidar_setup(seed=0):
    rng = np.random.default_rng(seed)
    # analytic planes: ground z=0; walls x=+6 and y=-5 (vehicle canyon)
    map_g = _plane_grid(rng, 2, 0.0, -9.0, 9.0, 0.6)
    wall_x = _plane_grid(rng, 0, 6.0, -9.0, 9.0, 0.35, height=(0.2, 4.0))
    wall_y = _plane_grid(rng, 1, -5.0, -9.0, 9.0, 0.35, height=(0.2, 4.0))
    # keep wall points away from the corner so 3-NN never crosses walls
    wall_x = wall_x[np.abs(wall_x[:, 1] + 5.0) > 1.5]
    wall_y = wall_y[np.abs(wall_y[:, 0] - 6.0) > 1.5]
    map_s = np.concatenate([wall_x, wall_y])

    def sample(plane_pts, n):
        return plane_pts[rng.choice(len(plane_pts), n, replace=False)]

    scan_g_w = sample(map_g, 160) * [0.97, 0.97, 1.0]  # same plane, new xy
    scan_s_w = np.concatenate([sample(wall_x, 70), sample(wall_y, 70)])

    T_true = boxplus64(
        np.array([1.0, 0, 0, 0, 0, 0, 0.0]),
        np.array([0.02, -0.015, 0.3, 1.0, -2.0, 0.0]))
    Ti = se3_inv64(T_true)
    g_body = np.stack([se3_apply64(Ti, p) for p in scan_g_w])
    s_body = np.stack([se3_apply64(Ti, p) for p in scan_s_w])

    pert = np.array([0.025, -0.02, 0.03, 0.12, -0.10, 0.08])
    pose0 = boxplus64(T_true, pert)
    return map_g, map_s, g_body, s_body, pose0


class PlaneStageOracle:
    """f64 replica of one `_masked_gn` stage: masked-twist retraction from
    the stage's starting pose, analytic point-to-plane residuals + the
    masked soft prior toward the BA pose."""

    def __init__(self, base_pose, prior_pose, pts_body, planes, mask,
                 w_point, w_prior):
        self.base = np.asarray(base_pose, np.float64)
        self.prior = np.asarray(prior_pose, np.float64)
        self.pts = np.asarray(pts_body, np.float64)
        self.planes = planes  # list of (normal, offset, point_mask)
        self.mask = np.asarray(mask, np.float64)
        self.wp = w_point
        self.wr = w_prior

    def _pose_of(self, xi):
        return boxplus64(self.base, xi * self.mask)

    def residuals_at(self, T):
        R = np.stack([_qrot(T[:4], e) for e in np.eye(3)], axis=1)
        pw = self.pts @ R.T + T[4:]
        rs = []
        for normal, offset, pm in self.planes:
            rs.append(self.wp * (pw[pm] @ normal - offset))
        dx = se3_log64(se3_mul64(T, se3_inv64(self.prior))) * self.mask
        rs.append(self.wr * dx)
        return np.concatenate(rs)

    def residuals(self, xi):
        return self.residuals_at(self._pose_of(xi))

    def cost_of_pose(self, T):
        return float(np.sum(self.residuals_at(np.asarray(T, np.float64))**2))

    def solve(self):
        res = least_squares(self.residuals, np.zeros(6), method="lm",
                            xtol=1e-15, ftol=1e-15, gtol=1e-15,
                            max_nfev=20000)
        return {"cost": float(np.sum(res.fun ** 2)),
                "pose": self._pose_of(res.x)}


def _check_stage(label, pose_f32, oracle):
    ref = oracle.solve()
    cost_f32 = oracle.cost_of_pose(pose_f32)
    print(f"[{label}] oracle cost={ref['cost']:.8f} f32 cost={cost_f32:.8f} "
          f"ratio={cost_f32 / max(ref['cost'], 1e-12):.5f}")
    assert cost_f32 <= MARGIN * ref["cost"] + 1e-9
    dp = np.linalg.norm(np.asarray(pose_f32[4:], np.float64)
                        - ref["pose"][4:])
    dd = abs(float(np.sum(np.asarray(pose_f32[:4], np.float64)
                          * ref["pose"][:4])))
    dr = np.degrees(2 * np.arccos(np.clip(dd, -1, 1)))
    print(f"[{label}] |dt|={dp:.6f} m  dR={dr:.4f} deg")
    assert dp < 0.01
    assert dr < 0.05
    return ref


def test_lidar_scan_to_map_stages_match_f64_oracle():
    map_g, map_s, g_body, s_body, pose0 = _lidar_setup()
    w_g, w_s, w_prior = 1.0, 0.5, 2.0
    thr_g = (0.2 ** 2) * 100.0  # squared-distance gates as shipped
    thr_s = (0.2 ** 2) * 25.0
    p0_f32 = jnp.asarray(pose0, jnp.float32)

    # ---- stage 1: ground -> {roll, pitch, z} ----
    pose1, _ = _masked_gn(
        p0_f32, p0_f32, jnp.asarray(g_body, jnp.float32),
        jnp.ones(len(g_body), bool), jnp.asarray(map_g, jnp.float32),
        jnp.ones(len(map_g), bool), RPZ_MASK, thr_g, w_g, w_prior, iters=4)
    ground_planes = [(np.array([0.0, 0.0, 1.0]), 0.0,
                      np.ones(len(g_body), bool))]
    o1 = PlaneStageOracle(pose0, pose0, g_body, ground_planes, RPZ_MASK,
                          w_g, w_prior)
    _check_stage("lidar-rpz", np.asarray(pose1), o1)

    # ---- stage 2: surf walls -> {yaw, x, y}, starting from stage 1 ----
    pose2, _ = _masked_gn(
        pose1, p0_f32, jnp.asarray(s_body, jnp.float32),
        jnp.ones(len(s_body), bool), jnp.asarray(map_s, jnp.float32),
        jnp.ones(len(map_s), bool), YXY_MASK, thr_s, w_s, w_prior, iters=4)
    half = len(s_body) // 2
    m1 = np.zeros(len(s_body), bool)
    m1[:half] = True
    wall_planes = [(np.array([1.0, 0.0, 0.0]), 6.0, m1),
                   (np.array([0.0, 1.0, 0.0]), -5.0, ~m1)]
    o2 = PlaneStageOracle(np.asarray(pose1, np.float64), pose0, s_body,
                          wall_planes, YXY_MASK, w_s, w_prior)
    _check_stage("lidar-yxy", np.asarray(pose2), o2)
