"""Histogram equalization (reference lvio_fusion_node.cpp:94): tracking
must survive dynamic-range compression that kills the raw pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.ops.image import equalize_hist
from lvio_fusion_tpu.utils.trajectory import ate_rmse


def test_equalize_hist_restores_dynamic_range():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    # compress to 8 gray levels in a narrow dark band
    low = (img // 32 + 96).astype(np.uint8)
    assert int(low.max()) - int(low.min()) <= 8
    eq = np.asarray(equalize_hist(jnp.asarray(low)))
    assert eq.dtype == np.uint8
    # full range restored; darkest occupied level maps to 0
    assert eq.min() == 0 and eq.max() >= 240
    # monotone: equalization must preserve intensity ordering
    order = np.argsort(low.reshape(-1), kind="stable")
    assert np.all(np.diff(eq.reshape(-1)[order].astype(np.int32)) >= 0)
    # constant image stays finite/sane (denominator guard)
    flat = np.full((32, 32), 77, np.uint8)
    out = np.asarray(equalize_hist(jnp.asarray(flat)))
    assert np.all(np.isfinite(out.astype(np.float64)))


def _run(seq, equalize, div=32, off=96):
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10, max_keyframe_interval=0.3,
        equalize_hist=equalize)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    for fr in seq.frames:
        u8l = np.clip(fr.left * 255.0, 0, 255).astype(np.uint8)
        u8r = np.clip(fr.right * 255.0, 0, 255).astype(np.uint8)
        est.input_image(fr.time, (u8l // div + off).astype(np.uint8),
                        (u8r // div + off).astype(np.uint8))
    est.finalize()
    times, poses = est.trajectory()
    if len(times) < 2:
        return len(times), float("inf")
    idx = np.searchsorted(seq.gt_times, times)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    return len(times), ate_rmse(poses[:, 4:], gt[:, 4:], align=False)


def test_tracking_survives_low_contrast_only_with_equalization():
    """Compress the synthetic stereo stream to ~8 gray levels (measured:
    the raw pipeline cannot even initialize its map — 0 keyframes — while
    the reference's equalizeHist preprocessing restores normal-ATE
    tracking)."""
    seq = make_sequence(num_frames=16, H=240, W=360, num_points=400, seed=5)
    kfs_raw, ate_raw = _run(seq, equalize=False)
    kfs_eq, ate_eq = _run(seq, equalize=True)
    total = np.linalg.norm(np.diff(seq.gt_poses[:, 4:], axis=0),
                           axis=-1).sum()
    print(f"raw: kfs={kfs_raw} ate={ate_raw}; "
          f"equalized: kfs={kfs_eq} ate={ate_eq} over {total:.1f} m")
    assert kfs_eq >= 4, "equalized pipeline failed to track"
    assert ate_eq < 0.06 * max(total, 1.0), ate_eq
    # without equalization the low-contrast stream is fatal (or at least
    # far worse): no map init, or ATE blown up
    assert kfs_raw == 0 or ate_raw > 2.0 * ate_eq
