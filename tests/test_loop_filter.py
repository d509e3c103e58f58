"""Loop-closure parity nuances:

  * FilterOldSubmaps (pose_graph.cpp:24-50): a second loop pass over an
    already-corrected stretch must not re-correct those sections.
  * Backend::UpdateFrontend forward re-solve (backend.cpp:248-293): after
    a big mid-window correction, one GN iteration against the refreshed
    landmarks beats the rigid-only forward propagation.
"""

import numpy as np
import jax.numpy as jnp

from lvio_fusion_tpu.loop.pose_graph import PoseGraph, Section


class _FakeMap:
    num_kfs = 100


def make_pg(sections):
    pg = PoseGraph()
    pg._processed = _FakeMap.num_kfs  # sectioning already done
    pg.sections = {a: Section(a, b, c) for a, b, c in sections}
    return pg


def test_filter_old_submaps_no_submaps_passthrough():
    pg = make_pg([(10, 12, 20), (20, 22, 30), (30, 32, 40), (40, 42, 50)])
    got = [s.A for s in pg.filter_old_submaps(_FakeMap, 5, 45)]
    assert got == [10, 20, 30, 40]


def test_filter_old_submaps_inner():
    """A previous loop anchored kfs 22..35 at old kf 20 (anchor INSIDE the
    active range): sections starting in (20, 35] are already corrected and
    must be dropped; the anchor section itself stays."""
    pg = make_pg([(10, 12, 20), (20, 22, 30), (30, 32, 40), (40, 42, 50)])
    pg.add_submap(20, 22, 35)
    got = [s.A for s in pg.filter_old_submaps(_FakeMap, 5, 45)]
    assert got == [10, 20, 40], got


def test_filter_old_submaps_outer():
    """A previous loop anchored to BEFORE the active range start: every
    section up to that submap's end is pinned by the older (stronger)
    loop and must not be re-corrected."""
    pg = make_pg([(10, 12, 20), (20, 22, 30), (30, 32, 40), (40, 42, 50)])
    pg.add_submap(3, 8, 25)
    got = [s.A for s in pg.filter_old_submaps(_FakeMap, 5, 45)]
    assert got == [30, 40], got


def test_filter_old_submaps_combined():
    pg = make_pg([(10, 12, 20), (20, 22, 30), (30, 32, 40), (40, 42, 50)])
    pg.add_submap(3, 8, 25)    # outer: drops 10, 20
    pg.add_submap(20, 28, 35)  # inner: drops 30
    got = [s.A for s in pg.filter_old_submaps(_FakeMap, 5, 45)]
    assert got == [40], got
    # out-of-range submaps are ignored
    pg.add_submap(60, 62, 70)
    got = [s.A for s in pg.filter_old_submaps(_FakeMap, 5, 45)]
    assert got == [40], got


def test_forward_resolve_beats_rigid_only():
    """Mid-window big-correction scenario: window BA snaps the window to
    ground truth, the forward keyframe receives only the rigid correction
    of the window's NEWEST kf — but its own drift differs, so rigid-only
    leaves a residual error that the 1-iteration re-solve removes."""
    from lvio_fusion_tpu.core.backend import pose_only_refine_np
    from lvio_fusion_tpu.geometry.se3 import se3_identity
    from lvio_fusion_tpu.models.camera import Camera
    from lvio_fusion_tpu.utils import np_se3

    cam = Camera.create(400.0, 400.0, 320.0, 240.0, se3_identity())
    rng = np.random.default_rng(2)

    # ground truth: window newest kf at origin-ish, forward kf ahead
    gt_N = np.array([1, 0, 0, 0, 0.0, 0.0, 0.0], np.float32)
    gt_F = np.array([1, 0, 0, 0, 0.05, 0.0, 0.4], np.float32)
    # pre-BA drifted poses: a big loop-style correction (0.5 m + 3 deg),
    # PLUS per-kf drift that differs between N and F
    big = np_se3.se3_exp(np.array([0.0, 0.05, 0.0, 0.5, 0.2, -0.3]))
    drift_N = np_se3.se3_exp(rng.normal(0, 1, 6) * 0.01)
    drift_F = np_se3.se3_exp(rng.normal(0, 1, 6) * [0.02, 0.02, 0.02,
                                                    0.08, 0.08, 0.08])
    old_N = np_se3.se3_mul(big, np_se3.se3_mul(drift_N, gt_N))
    old_F = np_se3.se3_mul(big, np_se3.se3_mul(drift_F, gt_F))

    # BA result: window kfs + landmarks snapped to ground truth
    corr = np_se3.se3_mul(gt_N, np_se3.se3_inv(old_N))

    # landmarks + observed pixels of the forward kf (under its gt pose)
    pw = np.stack([rng.uniform(-4, 4, 120), rng.uniform(-3, 3, 120),
                   rng.uniform(5, 25, 120)], 1)
    Tcw = np_se3.se3_inv(gt_F)
    pc = np_se3.se3_apply_batch(Tcw, pw).astype(np.float64)
    px = np.stack([pc[:, 0] / pc[:, 2] * 400 + 320,
                   pc[:, 1] / pc[:, 2] * 400 + 240], 1)
    px += rng.normal(0, 0.3, px.shape)  # measurement noise

    rigid_only = np_se3.se3_mul(corr, old_F)
    resolved = pose_only_refine_np(rigid_only, pw, px,
                                   np.ones(len(pw), bool), cam, iters=1)

    e_rigid = np.linalg.norm(rigid_only[4:] - gt_F[4:])
    e_resolved = np.linalg.norm(resolved[4:] - gt_F[4:])
    print(f"rigid-only err={e_rigid:.4f} m, re-solved err={e_resolved:.4f} m")
    assert e_rigid > 0.02, "scenario degenerate: rigid-only already exact"
    assert e_resolved < 0.5 * e_rigid, (e_rigid, e_resolved)
