"""Multi-stream scale-out (parallel/replicas.py): N SLAM instances on N
mesh devices must (a) land their device state on their assigned chips
and (b) produce exactly the trajectories the same sequences produce on
a single instance."""

import jax
import numpy as np

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.parallel.replicas import ReplicaRunner, run_streams


def _cfg():
    return EstimatorConfig(
        height=120, width=160, num_features=60, num_features_init=20,
        num_features_tracking_bad=8, num_features_needed_for_keyframe=30,
        window_kfs=4, landmark_slots=96, obs_slots=256, po_slots=128,
        ba_iters=3, cell=20, occupy_radius=8, frame_batch=4)


def _seqs(n):
    return [make_sequence(num_frames=12, H=120, W=160, num_points=200,
                          seed=3 + i) for i in range(n)]


def test_two_streams_match_single_instance_runs():
    seqs = _seqs(2)
    runner = ReplicaRunner(
        lambda: Estimator(seqs[0].cam_left, seqs[0].cam_right, _cfg()),
        n_replicas=2)
    trajs = run_streams(
        runner,
        [[(fr.time, fr.left, fr.right) for fr in s.frames] for s in seqs])

    # device placement: each replica's chained state lives on its chip
    for i, (d, est) in enumerate(zip(runner.devices, runner.replicas)):
        dev_state = est._dev
        if dev_state is not None:
            assert dev_state["pose"].devices() == {d}, (
                f"replica {i} state on {dev_state['pose'].devices()}, "
                f"expected {d}")

    # exactness: same sequence through a lone estimator, same answers
    for i, s in enumerate(seqs):
        est = Estimator(s.cam_left, s.cam_right, _cfg())
        for fr in s.frames:
            est.input_image(fr.time, fr.left, fr.right)
        est.finalize()
        t_ref, p_ref = est.trajectory()
        t_i, p_i = trajs[i]
        np.testing.assert_allclose(t_i, t_ref, atol=0)
        np.testing.assert_allclose(p_i, p_ref, atol=1e-5)
        assert np.all(np.isfinite(p_i)) and len(t_i) >= 2


def test_too_many_replicas_raises():
    import pytest
    n = len(jax.devices())
    with pytest.raises(ValueError):
        ReplicaRunner(lambda: None, n_replicas=n + 1)
