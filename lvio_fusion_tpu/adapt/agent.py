"""Online weight-inference agent.

Functional equivalent of the reference Agent (agent.cpp + adapt/agent.h):
instead of a 10 ms polling thread calling a ROS service into PyTorch, the
estimator invokes the jitted actor directly at keyframe creation to fill
the frame's factor weights. (Note: the reference has a latent bug —
RealCore::Update never overrides Core::UpdateWeights, so its weights stay
at defaults in practice; here the wiring actually works.)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.adapt.observation import action_to_weights


class Agent:
    def __init__(self, td3):
        self.td3 = td3

    def update_weights(self, obs_grid) -> np.ndarray:
        """obs (4,12,3) -> weights [visual, lidar_ground, lidar_surf]."""
        obs = jnp.asarray(obs_grid).reshape(1, -1)
        a = self.td3.act(self.td3.state.actor, obs)[0]
        return np.asarray(action_to_weights(a))


def save_policy(td3, path: str):
    import pickle
    import jax
    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, td3.state), f)


def load_policy(td3, path: str):
    import pickle
    with open(path, "rb") as f:
        state = pickle.load(f)
    td3.state = type(td3.state)(*state)
    return td3
