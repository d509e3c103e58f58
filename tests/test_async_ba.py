"""Asynchronous backend: the window solve dispatched at keyframe N is
fetched and written back at keyframe N+1 (reference backend.cpp:28-40 —
the backend thread never blocks the frontend). The one-keyframe-late
correction must not cost accuracy on a well-tracked sequence, and the
final map must be fully solved (no pending writeback left)."""

import numpy as np
import pytest

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.utils.trajectory import ate_rmse


@pytest.fixture(scope="module")
def seq():
    return make_sequence(num_frames=25, H=240, W=360, num_points=400, seed=3)


def run(seq, **cfg_overrides):
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10, **cfg_overrides)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    for fr in seq.frames:
        est.input_image(fr.time, fr.left, fr.right)
    est.finalize()
    return est


def ate_of(est, seq):
    times, poses = est.trajectory()
    idx = np.searchsorted(seq.gt_times, times)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    return ate_rmse(poses[:, 4:], gt[:, 4:], align=False), gt


def test_async_matches_sync_accuracy(seq):
    est_async = run(seq, async_ba=True)
    est_sync = run(seq, async_ba=False)
    # the pending solve must be drained by finalize()
    assert est_async._pending_ba is None

    ate_a, gt = ate_of(est_async, seq)
    ate_s, _ = ate_of(est_sync, seq)
    total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
    print(f"ATE async={ate_a:.4f} sync={ate_s:.4f} over {total:.1f} m")
    # both must hit the pipeline accuracy bar; async may differ but not
    # meaningfully degrade
    assert ate_a < 0.05 * total, f"async ATE {ate_a} too large"
    assert ate_a < max(2.0 * ate_s, 0.02 * total), \
        f"async ATE {ate_a} much worse than sync {ate_s}"


def test_async_dispatch_outstanding_between_keyframes(seq):
    """Mid-sequence (before finalize) a dispatched-but-unfetched solve may
    exist; finishing it applies a rigid correction to the newest kf."""
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10, async_ba=True)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    saw_pending = False
    for fr in seq.frames:
        est.input_image(fr.time, fr.left, fr.right)
        saw_pending = saw_pending or est._pending_ba is not None
    assert saw_pending, "async mode never left a solve in flight"
    est.finalize()
    assert est._pending_ba is None
