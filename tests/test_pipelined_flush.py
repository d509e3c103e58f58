"""Lag-1 pipelined frontend: the device chain runs one batch ahead of
the host mirror (keyframe decision + feature merge on-device, host
processing overlapped with device compute). The trajectory must match
the synchronous batched mode's accuracy."""

import numpy as np
import pytest

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.utils.trajectory import ate_rmse


def _cfg(**over):
    base = dict(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10)
    base.update(over)
    return EstimatorConfig(**base)


def _run(seq, cfg, with_imu=False):
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    imu_i = 0
    for fr in seq.frames:
        if with_imu:
            while (imu_i < len(seq.imu_times)
                   and seq.imu_times[imu_i] <= fr.time):
                est.input_imu(seq.imu_times[imu_i], seq.imu_acc[imu_i],
                              seq.imu_gyr[imu_i])
                imu_i += 1
        est.input_image(fr.time, fr.left, fr.right)
    est.finalize()
    return est


def _ate(est, seq, align=False):
    t, p = est.trajectory()
    idx = np.searchsorted(seq.gt_times, t)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
    return ate_rmse(p[:, 4:], gt[:, 4:], align=align), total, len(t)


def test_pipelined_matches_batched_vo():
    seq = make_sequence(num_frames=28, H=240, W=360, num_points=400,
                        seed=11)
    est_p = _run(seq, _cfg(frame_batch=4, pipelined_flush=True))
    est_b = _run(seq, _cfg(frame_batch=4, pipelined_flush=False))
    assert est_p._pending_flush is None  # drained by finalize

    ate_p, total, k_p = _ate(est_p, seq)
    ate_b, _, k_b = _ate(est_b, seq)
    print(f"pipelined ATE={ate_p:.4f} ({k_p} kfs) "
          f"batched ATE={ate_b:.4f} ({k_b} kfs) over {total:.1f} m")
    assert ate_p < 0.05 * max(total, 1.0), f"pipelined ATE {ate_p}"
    # pipelined lag must not meaningfully degrade vs synchronous batching
    assert ate_p < max(2.0 * ate_b, 0.02 * total)


def test_pipelined_vio_initializes():
    seq = make_sequence(num_frames=48, H=240, W=360, num_points=400,
                        seed=1, with_imu=True, imu_rate=200.0)
    cfg = _cfg(frame_batch=4, pipelined_flush=True, use_imu=True,
               init_kfs=8, max_keyframe_interval=0.25)
    est = _run(seq, cfg, with_imu=True)
    assert est.imu_initialized, "VI init never fired (pipelined)"
    ate, total, k = _ate(est, seq, align=True)
    print(f"pipelined-VIO kfs={k} ATE={ate:.4f} over {total:.1f} m")
    assert ate < 0.05 * max(total, 1.0), f"ATE {ate} too large"


def test_scan_unroll_parity():
    """scan_unroll changes how XLA unrolls the B-frame lax.scan. The
    math is the same but unrolling lets XLA reassociate f32 reductions,
    so results drift at roundoff scale and compound through the
    sequential pipeline (measured: <= 7 mm over 24 frames on CPU). The
    contract is trajectory EQUIVALENCE (same keyframes, poses within
    noise), not bit-identity — asserted here so non-default unroll
    values stay guarded in the suite."""
    seq = make_sequence(num_frames=24, H=240, W=360, num_points=400,
                        seed=13)
    est1 = _run(seq, _cfg(frame_batch=4, pipelined_flush=True,
                          scan_unroll=1))
    est3 = _run(seq, _cfg(frame_batch=4, pipelined_flush=True,
                          scan_unroll=3))
    t1, p1 = est1.trajectory()
    t3, p3 = est3.trajectory()
    assert len(t1) == len(t3), "unroll changed the keyframe schedule"
    np.testing.assert_allclose(t1, t3, atol=0)
    np.testing.assert_allclose(p1, p3, atol=0.02)


def test_pipelined_checkpoint_roundtrip(tmp_path):
    """save_state must drain the pipeline; the resumed estimator
    continues in pipelined mode."""
    seq = make_sequence(num_frames=24, H=240, W=360, num_points=400,
                        seed=12)
    cfg = _cfg(frame_batch=4, pipelined_flush=True)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    for fr in seq.frames[:12]:
        est.input_image(fr.time, fr.left, fr.right)
    ck = tmp_path / "pipe.ckpt"
    est.save_state(str(ck))
    assert est._pending_flush is None

    est2 = Estimator(seq.cam_left, seq.cam_right, cfg)
    est2.load_state(str(ck))
    for fr in seq.frames[12:]:
        est2.input_image(fr.time, fr.left, fr.right)
    est2.finalize()
    ate, total, k = _ate(est2, seq)
    print(f"resumed pipelined kfs={k} ATE={ate:.4f} over {total:.1f} m")
    assert ate < 0.05 * max(total, 1.0)
