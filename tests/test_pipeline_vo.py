"""End-to-end stereo visual odometry on a synthetic rendered sequence:
the estimated keyframe trajectory must match ground truth (small ATE)."""

import numpy as np
import pytest

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.utils.trajectory import ate_rmse, write_tum_csv


@pytest.fixture(scope="module")
def seq():
    return make_sequence(num_frames=25, H=240, W=360, num_points=400, seed=0)


def run_vo(seq, **cfg_overrides):
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10,
        **cfg_overrides)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    for fr in seq.frames:
        est.input_image(fr.time, fr.left, fr.right)
    return est


def test_vo_tracks_synthetic_sequence(seq, tmp_path):
    est = run_vo(seq)
    times, poses = est.trajectory()
    assert len(times) >= 3, f"too few keyframes: {len(times)}"

    # ground-truth poses at keyframe times
    idx = np.searchsorted(seq.gt_times, times)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    ate = ate_rmse(poses[:, 4:], gt[:, 4:], align=False)
    total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
    print(f"keyframes={len(times)} ATE={ate:.4f} m over {total:.1f} m")
    assert ate < 0.05 * total, f"ATE {ate} too large for {total} m"

    # output format parity: time,x,y,z,qx,qy,qz,qw
    out = tmp_path / "traj.csv"
    write_tum_csv(str(out), times, poses)
    first = out.read_text().splitlines()[0].split(",")
    assert len(first) == 8
    assert abs(float(first[0])) < 1e-9
