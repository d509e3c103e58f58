"""Checkpoint/resume: the full host-side SLAM state round-trips through
one file; a run split in half and resumed in a FRESH estimator must end
with (near-)identical keyframe trajectory to an uninterrupted run.
Additive over the reference, which persists nothing."""

import numpy as np
import pytest

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.core.hostmap import HostMap
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


def test_hostmap_roundtrip(tmp_path):
    m = HostMap()
    k = m.add_keyframe(0.0, np.array([1, 0, 0, 0, 1, 2, 3], np.float32))
    ids = m.add_landmarks(k, [[5, 6]], [[7, 8]], [0.1],
                          [[0, 0, 10]], descs=[np.arange(8, dtype=np.uint32)])
    m.add_observations(k, ids, [[7, 8]])
    p = tmp_path / "map.pkl"
    m.save(str(p))
    m2 = HostMap.load(str(p))
    assert m2.num_kfs == 1 and m2.num_landmarks == 1
    np.testing.assert_array_equal(m2.kf_pose[0], m.kf_pose[0])
    np.testing.assert_array_equal(m2.lm_desc[0], m.lm_desc[0])
    np.testing.assert_array_equal(m2.obs_lm[0], m.obs_lm[0])


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    seq = make_sequence(num_frames=24, H=240, W=360, num_points=400, seed=5)
    cut = 12

    # uninterrupted reference run
    est_ref = Estimator(seq.cam_left, seq.cam_right, _cfg())
    for fr in seq.frames:
        est_ref.input_image(fr.time, fr.left, fr.right)
    est_ref.finalize()
    t_ref, p_ref = est_ref.trajectory()

    # first half -> checkpoint
    est_a = Estimator(seq.cam_left, seq.cam_right, _cfg())
    for fr in seq.frames[:cut]:
        est_a.input_image(fr.time, fr.left, fr.right)
    ck = tmp_path / "state.ckpt"
    est_a.save_state(str(ck))

    # resume in a FRESH estimator -> second half
    est_b = Estimator(seq.cam_left, seq.cam_right, _cfg())
    est_b.load_state(str(ck))
    assert est_b.map.num_kfs == est_a.map.num_kfs
    assert est_b.status == est_a.status
    for fr in seq.frames[cut:]:
        est_b.input_image(fr.time, fr.left, fr.right)
    est_b.finalize()
    t_res, p_res = est_b.trajectory()

    # same keyframe cadence and near-identical trajectory (the async BA
    # flush at the checkpoint may shift late-window solutions slightly)
    assert abs(len(t_res) - len(t_ref)) <= 1, (len(t_res), len(t_ref))
    n = min(len(t_res), len(t_ref))
    err = ate_rmse(p_res[:n, 4:], p_ref[:n, 4:], align=False)
    print(f"resume-vs-uninterrupted ATE {err:.4f} over {n} kfs")
    assert err < 0.05, f"resumed trajectory diverged: {err}"

    # GT accuracy must hold end-to-end on the resumed run
    idx = np.searchsorted(seq.gt_times, t_res)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    ate = ate_rmse(p_res[:, 4:], gt[:, 4:], align=False)
    total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
    assert ate < 0.05 * max(total, 1.0), f"resumed ATE {ate} too large"


def test_checkpoint_config_mismatch_rejected(tmp_path):
    seq = make_sequence(num_frames=3, H=240, W=360, num_points=300, seed=6)
    est = Estimator(seq.cam_left, seq.cam_right, _cfg())
    for fr in seq.frames:
        est.input_image(fr.time, fr.left, fr.right)
    ck = tmp_path / "s.ckpt"
    est.save_state(str(ck))
    other = Estimator(seq.cam_left, seq.cam_right,
                      _cfg(num_features=100))
    with pytest.raises(ValueError, match="num_features"):
        other.load_state(str(ck))
