"""Tracking-loss recovery (frontend.cpp:121-137 LOST handling): blank
frames collapse LK; the estimator must disable the IMU, re-initialize the
map in place from the speculative detection once imagery returns, and
continue tracking — in the per-frame, batched, and pipelined paths."""

import numpy as np
import pytest

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence


@pytest.fixture(scope="module")
def seq():
    return make_sequence(num_frames=30, H=240, W=360, num_points=400,
                        seed=21)


def _cfg(**over):
    base = dict(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10)
    base.update(over)
    return EstimatorConfig(**base)


def _run_with_blackout(seq, cfg, black_at=12, black_n=3):
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    blank = np.zeros_like(seq.frames[0].left)
    saw_nontracking = False
    for i, fr in enumerate(seq.frames):
        if black_at <= i < black_at + black_n:
            est.input_image(fr.time, blank, blank)
        else:
            est.input_image(fr.time, fr.left, fr.right)
        if est.status != est.TRACKING:
            saw_nontracking = True
    est.finalize()
    return est, saw_nontracking


@pytest.mark.parametrize("mode", ["frame", "batch", "pipe"])
def test_blackout_recovery(seq, mode):
    cfg = _cfg() if mode == "frame" else _cfg(
        frame_batch=4, pipelined_flush=(mode == "pipe"))
    est, saw_nontracking = _run_with_blackout(seq, cfg)

    assert saw_nontracking, "blackout never perturbed tracking"
    assert est.status == est.TRACKING, \
        f"[{mode}] did not recover from blackout (status {est.status})"
    # the map kept growing after recovery and the trajectory is usable
    times, poses = est.trajectory()
    assert times[-1] > seq.frames[16].time, \
        f"[{mode}] no keyframes after the blackout"
    assert np.all(np.isfinite(poses)), f"[{mode}] non-finite poses"
    # tracked features are live again
    assert est.feat_valid.sum() >= cfg.num_features_init
