"""Trajectory output + evaluation (ATE/RPE).

Output CSV matches the reference result writer byte-format
(lvio_fusion_node.cpp:295-317): ``time,x,y,z,qx,qy,qz,qw`` with fixed
5-decimal precision, one keyframe per line — directly consumable by evo.
Also includes a self-contained ATE/RPE implementation (Umeyama-free, pose
trajectories assumed in the same frame) so tests/bench need no external
evaluator.
"""

from __future__ import annotations

import numpy as np


def write_tum_csv(path: str, times, poses, t0: float = None):
    """poses: (N, 7) [qw qx qy qz x y z]; writes reference CSV format."""
    times = np.asarray(times, np.float64)
    poses = np.asarray(poses, np.float64)
    if t0 is None:
        t0 = times[0] if len(times) else 0.0
    with open(path, "w") as f:
        for t, p in zip(times, poses):
            qw, qx, qy, qz, x, y, z = p
            f.write(f"{t - t0:.5f},{x:.5f},{y:.5f},{z:.5f},"
                    f"{qx:.5f},{qy:.5f},{qz:.5f},{qw:.5f}\n")


def read_tum(path: str, delim=None):
    """Read TUM-ish trajectory (whitespace or comma separated):
    time x y z qx qy qz qw. Returns (times, poses (N,7) [qw..z])."""
    times, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            if len(parts) < 8:
                continue
            t, x, y, z, qx, qy, qz, qw = map(float, parts[:8])
            times.append(t)
            poses.append([qw, qx, qy, qz, x, y, z])
    return np.asarray(times), np.asarray(poses)


def align_umeyama(est_xyz, gt_xyz, with_scale: bool = False):
    """Least-squares rigid (optionally Sim3) alignment est -> gt."""
    mu_e = est_xyz.mean(0)
    mu_g = gt_xyz.mean(0)
    E = est_xyz - mu_e
    G = gt_xyz - mu_g
    C = G.T @ E / len(est_xyz)
    U, S, Vt = np.linalg.svd(C)
    D = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    s = (np.trace(np.diag(S) @ D) / (E ** 2).mean(0).sum()
         if with_scale else 1.0)
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(est_xyz, gt_xyz, align: bool = True):
    """Absolute trajectory error (RMSE over positions)."""
    est_xyz = np.asarray(est_xyz, np.float64)
    gt_xyz = np.asarray(gt_xyz, np.float64)
    if align:
        s, R, t = align_umeyama(est_xyz, gt_xyz)
        est_xyz = (s * (R @ est_xyz.T)).T + t
    err = est_xyz - gt_xyz
    return float(np.sqrt((err ** 2).sum(-1).mean()))


def rpe_translation(est_xyz, gt_xyz, delta: int = 1):
    """Relative pose (translation drift) error per step."""
    est_xyz = np.asarray(est_xyz, np.float64)
    gt_xyz = np.asarray(gt_xyz, np.float64)
    de = est_xyz[delta:] - est_xyz[:-delta]
    dg = gt_xyz[delta:] - gt_xyz[:-delta]
    err = np.linalg.norm(de, axis=-1) - np.linalg.norm(dg, axis=-1)
    return float(np.sqrt((err ** 2).mean()))
