"""Bench-scale e2e accuracy probe: the kf-RMSE ATE (unaligned) of the
EXACT bench configuration over the bench synthetic stream — the
reconciled accuracy record's method (PARITY.md table). Use to
accuracy-gate any bench default change (batch, levels, DCT bits):

    BENCH_BATCH=16 BENCH_LEVELS=3 PYTHONPATH=/root/.axon_site:/root/repo \
        /opt/venv/bin/python misc/bench_ate.py

Env knobs are bench.py's (BENCH_BATCH, BENCH_LEVELS, BENCH_DCT,
BENCH_DCT_BITS, BENCH_PIPE, BENCH_FRAMES...).
"""

import os

import numpy as np


def main():
    from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
    from lvio_fusion_tpu.datasets.synthetic import make_sequence
    from lvio_fusion_tpu.utils.cache import enable_persistent_cache
    from lvio_fusion_tpu.utils.trajectory import ate_rmse

    enable_persistent_cache()
    H, W = int(os.environ.get("BENCH_H", 376)), int(
        os.environ.get("BENCH_W", 1241))
    batch = int(os.environ.get("BENCH_BATCH", 20))  # bench.py default
    n_frames = int(os.environ.get("BENCH_FRAMES", 124))
    seq = make_sequence(num_frames=n_frames, H=H, W=W, num_points=3000,
                        fps=10.0, speed=1.4, seed=0)
    cfg = EstimatorConfig(
        height=H, width=W, num_features=400, num_features_init=50,
        num_features_tracking_bad=20, num_features_needed_for_keyframe=120,
        window_kfs=8, landmark_slots=512, obs_slots=2048, po_slots=1024,
        ba_iters=5, frame_batch=batch,
        pipelined_flush=os.environ.get("BENCH_PIPE", "1") == "1"
        and batch > 1,
        dct_k=int(os.environ.get("BENCH_DCT", 16)),
        dct_quality=int(os.environ.get("BENCH_DCTQ", 100)),
        dct_bits=int(os.environ.get("BENCH_DCT_BITS", 4)),
        cond_kf_stage=os.environ.get("BENCH_COND_KF", "1") == "1",
        scan_unroll=int(os.environ.get("BENCH_UNROLL", 1)),
        levels=int(os.environ.get("BENCH_LEVELS", 4)))
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    for fr in seq.frames:
        est.input_image(fr.time,
                        np.clip(fr.left * 255, 0, 255).astype(np.uint8),
                        np.clip(fr.right * 255, 0, 255).astype(np.uint8))
    est.finalize()
    t, p = est.trajectory()
    idx = np.searchsorted(seq.gt_times, t)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
    ate = ate_rmse(p[:, 4:], gt[:, 4:], align=False)
    print(f"b{batch} L{os.environ.get('BENCH_LEVELS', 4)} "
          f"dct{cfg.dct_k}b{cfg.dct_bits} "
          f"pipe={cfg.pipelined_flush}: kfs={len(t)} "
          f"ATE={ate:.4f} m over {total:.1f} m "
          f"({100 * ate / max(total, 1e-9):.2f}%)")


if __name__ == "__main__":
    main()
