"""RL observation + weights types.

Parity: reference `Frame::GetObservation` (frame.cpp:45-74) — a 4x12x3
grid over the image: per cell [tracked-feature count, mean dx, mean dy]
of features also seen in the previous keyframe — and `adapt/weights.h`
(visual / lidar_ground / lidar_surf scalars; per-frame defaults
visual=fx/10, ground=1, surf=0.01, frame.cpp:11-16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

OBS_ROWS, OBS_COLS, OBS_CH = 4, 12, 3
OBS_DIM = OBS_ROWS * OBS_COLS * OBS_CH

# action/weight bounds (reference env.py:16-17 Box[1e-4, 100])
WEIGHT_LOW, WEIGHT_HIGH = 1e-4, 100.0


def default_weights(fx: float):
    return jnp.asarray([fx / 10.0, 1.0, 0.01], jnp.float32)


def observation_grid(px, prev_px, valid, height: int, width: int):
    """Build the (4, 12, 3) observation grid from tracked features.

    px/prev_px: (N, 2) current & previous-keyframe pixel positions;
    valid: (N,) features tracked from the previous keyframe.
    """
    cell_h = height / OBS_ROWS
    cell_w = width / OBS_COLS
    row = jnp.clip((px[:, 1] / cell_h).astype(jnp.int32), 0, OBS_ROWS - 1)
    col = jnp.clip((px[:, 0] / cell_w).astype(jnp.int32), 0, OBS_COLS - 1)
    flat = row * OBS_COLS + col
    v = valid.astype(jnp.float32)
    d = (px - prev_px) * v[:, None]

    cnt = jnp.zeros(OBS_ROWS * OBS_COLS).at[flat].add(v)
    dx = jnp.zeros(OBS_ROWS * OBS_COLS).at[flat].add(d[:, 0])
    dy = jnp.zeros(OBS_ROWS * OBS_COLS).at[flat].add(d[:, 1])
    n = jnp.maximum(cnt, 1.0)
    obs = jnp.stack([cnt, dx / n, dy / n], axis=-1)
    return obs.reshape(OBS_ROWS, OBS_COLS, OBS_CH)


_LOG_LOW, _LOG_HIGH = -4.0, 2.0  # log10 of the weight bounds


def action_to_weights(a):
    """Map a tanh action in [-1, 1]^3 to weights in [1e-4, 100],
    LOG-uniformly: every decade of the bounded range is equally
    reachable. (The reference's linear Box mapping, env.py:16-17, makes
    weights < 1 occupy ~1e-6 of the action space — its policy can never
    express the default surf weight 0.01, which measurably degrades
    end-to-end ATE when the trained policy drives the real pipeline.)"""
    t = (jnp.clip(a, -1.0, 1.0) + 1.0) * 0.5
    return 10.0 ** (_LOG_LOW + t * (_LOG_HIGH - _LOG_LOW))


def weights_to_action(w):
    """Inverse of :func:`action_to_weights` (exact on [1e-4, 100])."""
    t = (jnp.log10(jnp.clip(w, WEIGHT_LOW, WEIGHT_HIGH)) - _LOG_LOW) \
        / (_LOG_HIGH - _LOG_LOW)
    return 2.0 * t - 1.0
