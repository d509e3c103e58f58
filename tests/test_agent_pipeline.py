"""Online adaptive-weight agent wired into the pipeline: the TD3 actor
sets per-keyframe weights and the estimator stays stable (the reference's
Agent never actually fires due to its override-name bug; ours must)."""

import numpy as np

from lvio_fusion_tpu.adapt.agent import Agent
from lvio_fusion_tpu.adapt.observation import WEIGHT_HIGH, WEIGHT_LOW
from lvio_fusion_tpu.adapt.td3 import TD3
from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.utils.trajectory import ate_rmse


def test_agent_sets_keyframe_weights():
    seq = make_sequence(num_frames=16, H=240, W=360, num_points=400, seed=6)
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10, max_keyframe_interval=0.3)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    est.set_agent(Agent(TD3(seed=2)))

    for fr in seq.frames:
        est.input_image(fr.time, fr.left, fr.right)

    # every keyframe after the first must carry actor-produced weights
    w = np.stack(est.map.kf_weights[1:])
    assert np.all(w >= WEIGHT_LOW - 1e-6) and np.all(w <= WEIGHT_HIGH + 1e-6)
    # actor output differs from the config defaults [1, 1, 0.01]
    assert not np.allclose(w, np.array([1.0, 1.0, 0.01]), atol=1e-3)

    times, poses = est.trajectory()
    idx = np.searchsorted(seq.gt_times, times)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    ate = ate_rmse(poses[:, 4:], gt[:, 4:], align=False)
    assert ate < 0.15, f"agent-weighted run unstable: ATE {ate}"
