"""RL adapt subsystem: observation grid, batched environment, TD3 update
mechanics, and a short end-to-end training run over a finished map."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.adapt.environment import VectorEnv, tables_from_map
from lvio_fusion_tpu.adapt.observation import (
    OBS_DIM, action_to_weights, observation_grid,
)
from lvio_fusion_tpu.adapt.td3 import TD3, make_replay, replay_add, train_td3
from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence


def test_observation_grid():
    px = jnp.asarray([[10.0, 10.0], [350.0, 230.0], [10.0, 12.0]])
    prev = px - jnp.asarray([[2.0, 0.0], [0.0, 3.0], [2.0, 0.0]])
    valid = jnp.ones(3, bool)
    g = observation_grid(px, prev, valid, 240, 360)
    assert g.shape == (4, 12, 3)
    assert float(g[0, 0, 0]) == 2.0       # two features in cell (0,0)
    assert abs(float(g[0, 0, 1]) - 2.0) < 1e-6   # mean dx
    assert float(g[3, 11, 0]) == 1.0
    assert abs(float(g[3, 11, 2]) - 3.0) < 1e-6


def test_action_mapping():
    # log-uniform over [1e-4, 100]: midpoint action hits the geometric
    # mean, and defaults are representable (exact round trip)
    w = action_to_weights(jnp.asarray([-1.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(w), [1e-4, 0.1, 100.0],
                               rtol=1e-4)
    from lvio_fusion_tpu.adapt.observation import (
        default_weights, weights_to_action,
    )
    dw = default_weights(500.0)
    np.testing.assert_allclose(
        np.asarray(action_to_weights(weights_to_action(dw))),
        np.asarray(dw), rtol=1e-5)


def test_td3_update_runs():
    agent = TD3(seed=0)
    replay = make_replay(512)
    rng = np.random.default_rng(0)
    obs = jnp.asarray(rng.normal(0, 1, (64, OBS_DIM)), jnp.float32)
    act = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    rew = jnp.asarray(rng.uniform(0, 10, 64), jnp.float32)
    replay = replay_add(replay, obs, act, rew, obs, jnp.zeros(64, bool))
    for i in range(5):
        closs, aloss = agent.update(replay, jax.random.PRNGKey(i), 32)
        assert np.isfinite(closs) and np.isfinite(aloss)


def test_env_training_end_to_end():
    # 1) run the odometry pipeline to build a map
    seq = make_sequence(num_frames=20, H=240, W=360, num_points=400, seed=7)
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10, max_keyframe_interval=0.2)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    for fr in seq.frames:
        est.input_image(fr.time, fr.left, fr.right)
    assert est.map.num_kfs >= 8

    # 2) environment over the finished run with ground truth
    tables = tables_from_map(est.map, seq.gt_times, seq.gt_poses,
                             seq.cam_right, height=240, width=360)
    env = VectorEnv(tables, est.cam_left, num_envs=4, horizon=5)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, OBS_DIM)  # flat grids, TD3-ready
    state, nobs, rew, done = env.step(
        state, jnp.zeros((4, 3)))
    assert bool(jnp.all(jnp.isfinite(rew))), rew
    assert float(rew.min()) >= 0.0

    # 3) short TD3 training: must run and produce finite rewards
    agent = TD3(seed=1)
    agent, hist = train_td3(env, agent, epochs=2, steps_per_epoch=10,
                            batch_size=16, warmup=20, replay_capacity=1024)
    assert len(hist) == 2 and all(np.isfinite(h) for h in hist), hist
    print("reward history:", hist)
