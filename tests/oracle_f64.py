"""Independent float64 reference solver for the window-BA factor graph.

Purpose: make the BASELINE "ATE within 5% of the Ceres reference" claim
falsifiable in-repo. This module re-implements the window-BA residuals
(visual two-frame / stereo / pose-only, pose priors, IMU preintegration
— reference ceres/visual_error.hpp, pose_error.hpp, imu_error.hpp) in
pure numpy float64 using scipy's Rotation machinery (NOT the repo's
geometry/ module), and solves the identical factor tables with
scipy.optimize.least_squares. The f32 TPU solve (solver/ba.py) is then
gated against this oracle's cost and poses.

Deliberately shares NO math code with lvio_fusion_tpu: quaternion and
SE3 operations come from scipy.spatial.transform, so a bug in
geometry/so3.py or solver/factors.py shows up as an oracle mismatch
instead of being self-consistent.

Conventions mirrored from the solver (checked against solver/ba.py):
  * pose = [qw qx qy qz | t], robot->world
  * camera extrinsic = sensor->robot; project: world ->(inv pose*extr)->
    sensor -> pinhole
  * landmark = inverse depth along the anchor kf's RIGHT-camera ray
  * residual weights multiply residuals directly
  * Huber is NOT applied here — oracle scenarios keep residuals inside
    the inlier region (|r| < HUBER_VISUAL) so robust reweighting is
    inactive in both solvers and costs are directly comparable.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import least_squares
from scipy.spatial.transform import Rotation


# ---------- f64 SE3 helpers (scipy-based, independent of the repo) ----------

def rot(q_wxyz):
    return Rotation.from_quat(np.asarray(q_wxyz, np.float64),
                              scalar_first=True)


def pose_to_Rt(T):
    T = np.asarray(T, np.float64)
    return rot(T[:4]).as_matrix(), T[4:]


def Rt_to_pose(R, t):
    q = Rotation.from_matrix(R).as_quat(scalar_first=True)
    if q[0] < 0:
        q = -q
    return np.concatenate([q, t]).astype(np.float64)


def se3_inv_Rt(R, t):
    return R.T, -R.T @ t


class CamF64:
    """Pinhole camera in f64 built from the repo's Camera pytree values."""

    def __init__(self, cam):
        self.fx = float(cam.fx)
        self.fy = float(cam.fy)
        self.cx = float(cam.cx)
        self.cy = float(cam.cy)
        self.Re, self.te = pose_to_Rt(np.asarray(cam.extrinsic))

    def sensor2pixel(self, pc):
        z = pc[..., 2]
        z = np.where(np.abs(z) < 1e-6, 1e-6, z)
        return np.stack([pc[..., 0] / z * self.fx + self.cx,
                         pc[..., 1] / z * self.fy + self.cy], -1)

    def pixel2sensor(self, pp, depth):
        x = (pp[..., 0] - self.cx) / self.fx
        y = (pp[..., 1] - self.cy) / self.fy
        return np.stack([x, y, np.ones_like(x)], -1) * depth[..., None]

    def world2pixel(self, pw, Rwb, twb):
        # world -> robot -> sensor
        pb = (pw - twb) @ Rwb  # Rwb^T (pw - twb), batched
        pc = (pb - self.te) @ self.Re
        return self.sensor2pixel(pc)

    def world2pixel_batch(self, pw, Rwb, twb):
        """Per-row pose: pw (n,3), Rwb (n,3,3), twb (n,3)."""
        pb = np.einsum("nji,nj->ni", Rwb, pw - twb)
        pc = (pb - self.te) @ self.Re
        return self.sensor2pixel(pc)

    def pixel2robot(self, pp, depth):
        return self.pixel2sensor(pp, depth) @ self.Re.T + self.te

    def robot2pixel(self, pb):
        return self.sensor2pixel((pb - self.te) @ self.Re)


# ---------- problem export ----------

class OracleProblem:
    """f64 copy of one window's factor tables + free-variable layout."""

    def __init__(self, params0, vt, pt, kf_valid, kf_fixed, cam_left,
                 cam_right, imu_tables=None, g_norm=9.81):
        n = lambda x: np.asarray(x, np.float64)
        ni = lambda x: np.asarray(x)
        self.K = int(np.asarray(params0.poses).shape[0])
        self.L = int(np.asarray(params0.inv_depth).shape[0])
        self.poses0 = n(params0.poses)
        self.vel0 = n(params0.vel)
        self.bias0 = n(params0.bias)
        self.inv_depth0 = n(params0.inv_depth)
        self.cam_l = CamF64(cam_left)
        self.cam_r = CamF64(cam_right)

        self.lm_anchor = ni(vt.lm_anchor)
        self.lm_first_ob = n(vt.lm_first_ob)
        self.lm_left_ob = n(vt.lm_left_ob)
        self.lm_valid = ni(vt.lm_valid).astype(bool)
        self.lm_weight = n(vt.lm_weight)
        self.obs_lm = ni(vt.obs_lm)
        self.obs_frame = ni(vt.obs_frame)
        self.obs_pixel = n(vt.obs_pixel)
        self.obs_weight = n(vt.obs_weight)
        self.obs_valid = (ni(vt.obs_valid).astype(bool)
                          & self.lm_valid[self.obs_lm]
                          & (self.obs_frame != self.lm_anchor[self.obs_lm]))
        self.po_frame = ni(vt.po_frame)
        self.po_pw = n(vt.po_pw)
        self.po_pixel = n(vt.po_pixel)
        self.po_weight = n(vt.po_weight)
        self.po_valid = ni(vt.po_valid).astype(bool)
        self.pr_frame = ni(pt.frame)
        self.pr_pose = n(pt.pose)
        self.pr_weight = n(pt.weight)
        self.pr_valid = ni(pt.valid).astype(bool)

        self.kf_valid = ni(kf_valid).astype(bool)
        self.free_pose = self.kf_valid & ~ni(kf_fixed).astype(bool)
        self.use_imu = imu_tables is not None
        self.free_imu = (self.kf_valid if self.use_imu
                         else np.zeros(self.K, bool))
        self.g = np.array([0.0, 0.0, 1.0]) * float(g_norm)
        if self.use_imu:
            t = imu_tables
            self.imu_i = ni(t.frame_i)
            self.imu_j = ni(t.frame_j)
            self.imu_dp = n(t.dp)
            self.imu_dq = n(t.dq)
            self.imu_dv = n(t.dv)
            self.imu_dt = n(t.sum_dt)
            self.imu_jac = n(t.jac)
            self.imu_sqrt_info = n(t.sqrt_info)
            self.imu_lin_ba = n(t.lin_ba)
            self.imu_lin_bg = n(t.lin_bg)
            self.imu_valid = ni(t.valid).astype(bool)

        # free-variable layout: rotvec+trans per free pose, vel+bias per
        # free-imu kf, inv depth per valid landmark
        self.pose_free_idx = np.where(self.free_pose)[0]
        self.imu_free_idx = np.where(self.free_imu)[0]
        self.lm_free_idx = np.where(self.lm_valid)[0]
        self.n_var = (6 * len(self.pose_free_idx)
                      + 9 * len(self.imu_free_idx)
                      + len(self.lm_free_idx))

    # -- state vector <-> full states --

    def x0(self):
        parts = []
        for k in self.pose_free_idx:
            R, t = pose_to_Rt(self.poses0[k])
            parts.append(Rotation.from_matrix(R).as_rotvec())
            parts.append(t)
        for k in self.imu_free_idx:
            parts.append(self.vel0[k])
            parts.append(self.bias0[k])
        parts.append(self.inv_depth0[self.lm_free_idx])
        return np.concatenate(parts)

    def unpack(self, x):
        Rs = np.zeros((self.K, 3, 3))
        ts = np.zeros((self.K, 3))
        for k in range(self.K):
            Rs[k], ts[k] = pose_to_Rt(self.poses0[k])
        vel = self.vel0.copy()
        bias = self.bias0.copy()
        inv_d = self.inv_depth0.copy()
        o = 0
        for k in self.pose_free_idx:
            Rs[k] = Rotation.from_rotvec(x[o:o + 3]).as_matrix()
            ts[k] = x[o + 3:o + 6]
            o += 6
        for k in self.imu_free_idx:
            vel[k] = x[o:o + 3]
            bias[k] = x[o + 3:o + 9]
            o += 9
        inv_d[self.lm_free_idx] = np.clip(x[o:o + len(self.lm_free_idx)],
                                          1e-5, 1e3)
        return Rs, ts, vel, bias, inv_d

    # -- residual vector over the identical factor set --

    def residuals(self, x):
        Rs, ts, vel, bias, inv_d = self.unpack(x)
        out = []

        # two-frame reprojection (valid rows only)
        if self.obs_valid.any():
            rows = np.where(self.obs_valid)[0]
            lm = self.obs_lm[rows]
            fr = self.obs_frame[rows]
            an = self.lm_anchor[lm]
            pb = self.cam_r.pixel2robot(self.lm_first_ob[lm],
                                        1.0 / np.maximum(inv_d[lm], 1e-12))
            pw = np.einsum("nij,nj->ni", Rs[an], pb) + ts[an]
            pred = self.cam_l.world2pixel_batch(pw, Rs[fr], ts[fr])
            out.append(((pred - self.obs_pixel[rows])
                        * self.obs_weight[rows, None]).ravel())

        # stereo factor at the anchor
        if self.lm_valid.any():
            rows = self.lm_free_idx
            pb = self.cam_r.pixel2robot(self.lm_first_ob[rows],
                                        1.0 / np.maximum(inv_d[rows], 1e-12))
            pred = self.cam_l.robot2pixel(pb)
            out.append(((pred - self.lm_left_ob[rows])
                        * self.lm_weight[rows, None]).ravel())

        # pose-only reprojection
        if self.po_valid.any():
            rows = np.where(self.po_valid)[0]
            fr = self.po_frame[rows]
            pred = self.cam_l.world2pixel_batch(self.po_pw[rows], Rs[fr],
                                                ts[fr])
            out.append(((pred - self.po_pixel[rows])
                        * self.po_weight[rows, None]).ravel())

        # pose priors: rpyxyz of prior^-1 * T
        for i in np.where(self.pr_valid)[0]:
            k = self.pr_frame[i]
            Rp, tp = pose_to_Rt(self.pr_pose[i])
            Rrel = Rp.T @ Rs[k]
            trel = Rp.T @ (ts[k] - tp)
            rpy = Rotation.from_matrix(Rrel).as_euler("ZYX")[::-1]
            out.append(self.pr_weight[i] * np.concatenate([rpy, trel]))

        # IMU preintegration factors
        if self.use_imu:
            for m in np.where(self.imu_valid)[0]:
                out.append(self._imu_residual(m, Rs, ts, vel, bias))

        return np.concatenate(out) if out else np.zeros(0)

    def _imu_residual(self, m, Rs, ts, vel, bias):
        i, j = self.imu_i[m], self.imu_j[m]
        t = self.imu_dt[m]
        J = self.imu_jac[m]
        dba = bias[i, :3] - self.imu_lin_ba[m]
        dbg = bias[i, 3:] - self.imu_lin_bg[m]
        # bias-corrected deltas (first-order, preintegration.cpp:190-245)
        cdp = self.imu_dp[m] + J[0:3, 9:12] @ dba + J[0:3, 12:15] @ dbg
        cdv = self.imu_dv[m] + J[6:9, 9:12] @ dba + J[6:9, 12:15] @ dbg
        cdq = rot(self.imu_dq[m]) * Rotation.from_rotvec(
            J[3:6, 12:15] @ dbg)
        Ri = Rs[i]
        r_p = Ri.T @ (0.5 * self.g * t * t + ts[j] - ts[i]
                      - vel[i] * t) - cdp
        q_err = cdq.inv() * Rotation.from_matrix(Ri.T @ Rs[j])
        qv = q_err.as_quat(scalar_first=True)
        if qv[0] < 0:
            qv = -qv
        r_q = 2.0 * qv[1:]
        r_v = Ri.T @ (self.g * t + vel[j] - vel[i]) - cdv
        r_b = bias[j] - bias[i]
        r = np.concatenate([r_p, r_q, r_v, r_b])
        return self.imu_sqrt_info[m] @ r

    def cost(self, x):
        r = self.residuals(x)
        return 0.5 * float(r @ r)

    def cost_of_solution(self, params):
        """Evaluate the oracle cost functional at a solver's BAParams."""
        return self.cost(self._pack(params))

    def _pack(self, params):
        poses = np.asarray(params.poses, np.float64)
        vel = np.asarray(params.vel, np.float64)
        bias = np.asarray(params.bias, np.float64)
        inv_d = np.asarray(params.inv_depth, np.float64)
        parts = []
        for k in self.pose_free_idx:
            R, t = pose_to_Rt(poses[k])
            parts.append(Rotation.from_matrix(R).as_rotvec())
            parts.append(t)
        for k in self.imu_free_idx:
            parts.append(vel[k])
            parts.append(bias[k])
        parts.append(inv_d[self.lm_free_idx])
        return np.concatenate(parts)

    def solve(self, xtol=1e-14, ftol=1e-14, gtol=1e-14, max_nfev=4000):
        res = least_squares(self.residuals, self.x0(), method="trf",
                            jac="3-point", xtol=xtol, ftol=ftol, gtol=gtol,
                            max_nfev=max_nfev)
        Rs, ts, vel, bias, inv_d = self.unpack(res.x)
        poses = np.stack([Rt_to_pose(Rs[k], ts[k]) for k in range(self.K)])
        return {
            "poses": poses, "vel": vel, "bias": bias, "inv_depth": inv_d,
            "cost": 0.5 * float(res.fun @ res.fun), "x": res.x,
        }
