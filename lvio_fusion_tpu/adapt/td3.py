"""Native JAX TD3 (flax/optax) — replaces the reference's PyTorch/tianshou
sidecar (rl_fusion/td3.py) and its ROS-service RPC with in-process jitted
calls.

Hyperparameters mirror td3.py:26-53: actor/critic lr 3e-4/1e-3, gamma
0.99, tau 0.005, exploration noise 0.1, policy noise 0.2 clipped at 0.5,
actor update every 2 critic updates. The replay buffer lives in device
arrays; the whole update step is one jitted program, and batched env
rollouts shard across the device mesh (DP) instead of DummyVectorEnv
processes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from lvio_fusion_tpu.utils.memo import builder_memo

from lvio_fusion_tpu.adapt.observation import OBS_DIM

ACT_DIM = 3  # visual, lidar_ground, lidar_surf (adapt/weights.h)


class Actor(nn.Module):
    """``init_action``: the tanh output the freshly-initialized actor
    produces for ANY observation (small final kernel + atanh bias). Set
    to the action encoding the per-frame DEFAULT weights so the policy
    starts at the reference's hand-tuned operating point and learns
    deviations — a randomly-initialized actor starts ~9 exploration-noise
    sigmas from the defaults and TD3 never finds its way there."""

    hidden: int = 128
    init_action: tuple = (0.0, 0.0, 0.0)

    @nn.compact
    def __call__(self, obs):
        # the observation grid is unnormalized (per-cell feature counts
        # up to ~50, pixel-delta means up to ~±30 px): scale it so the
        # default-initialized actor's output actually sits AT
        # init_action instead of drifting with the input magnitude
        x = nn.relu(nn.Dense(self.hidden)(obs * 0.1))
        x = nn.relu(nn.Dense(self.hidden)(x))
        a0 = np.arctanh(np.clip(np.asarray(self.init_action, np.float32),
                                -0.999, 0.999))
        out = nn.Dense(
            ACT_DIM,
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_in", "truncated_normal"),
            bias_init=lambda key, shape, dtype=jnp.float32:
                jnp.asarray(a0, dtype))(x)
        return nn.tanh(out)


class Critic(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs * 0.1, act], axis=-1)
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(x)[..., 0]


class TD3State(NamedTuple):
    actor: dict
    actor_target: dict
    critic1: dict
    critic2: dict
    critic1_target: dict
    critic2_target: dict
    opt_actor: optax.OptState
    opt_critic: optax.OptState
    step: jnp.ndarray


class Replay(NamedTuple):
    obs: jnp.ndarray
    act: jnp.ndarray
    rew: jnp.ndarray
    nobs: jnp.ndarray
    done: jnp.ndarray
    ptr: jnp.ndarray
    size: jnp.ndarray


def make_replay(capacity: int):
    return Replay(
        obs=jnp.zeros((capacity, OBS_DIM)),
        act=jnp.zeros((capacity, ACT_DIM)),
        rew=jnp.zeros((capacity,)),
        nobs=jnp.zeros((capacity, OBS_DIM)),
        done=jnp.zeros((capacity,), bool),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


@jax.jit
def replay_add(r: Replay, obs, act, rew, nobs, done):
    """Add a batch of B transitions (wraps around)."""
    B = obs.shape[0]
    cap = r.obs.shape[0]
    idx = (r.ptr + jnp.arange(B)) % cap
    return r._replace(
        obs=r.obs.at[idx].set(obs), act=r.act.at[idx].set(act),
        rew=r.rew.at[idx].set(rew), nobs=r.nobs.at[idx].set(nobs),
        done=r.done.at[idx].set(done),
        ptr=(r.ptr + B) % cap,
        size=jnp.minimum(r.size + B, cap))



@builder_memo
def _make_td3_fns(actor_def, critic_def, gamma, tau, policy_noise,
                  noise_clip, policy_delay, actor_delay, anchor_weight,
                  anchor, actor_lr, critic_lr):
    """Jitted (act, update) shared across TD3 instances with identical
    hyperparameters (per-instance jit wrappers re-trace; utils/memo.py).
    The flax Module defs hash by their config, the anchor by value."""
    opt_a = optax.adam(actor_lr)
    opt_c = optax.adam(critic_lr)

    act = jax.jit(lambda p, o: actor_def.apply(p, o))

    @jax.jit
    def update(state: TD3State, batch, key):
        obs, act_b, rew, nobs, done = batch

        # --- critic update ---
        noise = jnp.clip(
            policy_noise * jax.random.normal(key, act_b.shape),
            -noise_clip, noise_clip)
        next_a = jnp.clip(
            actor_def.apply(state.actor_target, nobs) + noise,
            -1.0, 1.0)
        q1t = critic_def.apply(state.critic1_target, nobs, next_a)
        q2t = critic_def.apply(state.critic2_target, nobs, next_a)
        target = rew + gamma * (1.0 - done.astype(jnp.float32)) \
            * jnp.minimum(q1t, q2t)
        target = jax.lax.stop_gradient(target)

        def critic_loss(params):
            p1, p2 = params
            q1 = critic_def.apply(p1, obs, act_b)
            q2 = critic_def.apply(p2, obs, act_b)
            return jnp.mean((q1 - target) ** 2) + jnp.mean((q2 - target) ** 2)

        closs, grads = jax.value_and_grad(critic_loss)(
            (state.critic1, state.critic2))
        updates, opt_c_state = opt_c.update(grads, state.opt_critic,
                                            (state.critic1, state.critic2))
        critic1, critic2 = optax.apply_updates(
            (state.critic1, state.critic2), updates)

        # --- delayed actor update ---
        def actor_loss(pa):
            a = actor_def.apply(pa, obs)
            q = jnp.mean(critic_def.apply(critic1, obs, a))
            bc = jnp.mean(jnp.sum((a - anchor) ** 2, -1))
            return -q + anchor_weight * bc

        do_actor = ((state.step % policy_delay) == 0) \
            & (state.step >= actor_delay)
        aloss, agrads = jax.value_and_grad(actor_loss)(state.actor)
        agrads = jax.tree.map(
            lambda g: jnp.where(do_actor, g, jnp.zeros_like(g)), agrads)
        aupd, opt_a_state = opt_a.update(agrads, state.opt_actor,
                                         state.actor)
        actor = optax.apply_updates(state.actor, aupd)

        # --- soft target updates ---
        def soft(t, s):
            return jax.tree.map(
                lambda a, b: (1 - tau) * a + tau * b, t, s)

        new = TD3State(
            actor=actor,
            actor_target=soft(state.actor_target, actor),
            critic1=critic1, critic2=critic2,
            critic1_target=soft(state.critic1_target, critic1),
            critic2_target=soft(state.critic2_target, critic2),
            opt_actor=opt_a_state, opt_critic=opt_c_state,
            step=state.step + 1)
        return new, closs, aloss

    return act, update


class TD3:
    def __init__(self, seed=0, actor_lr=3e-4, critic_lr=1e-3, gamma=0.99,
                 tau=0.005, policy_noise=0.2, noise_clip=0.5,
                 explore_noise=0.1, policy_delay=2, init_action=None,
                 actor_delay=0, anchor_weight=0.0):
        self.gamma, self.tau = gamma, tau
        self.policy_noise, self.noise_clip = policy_noise, noise_clip
        self.explore_noise = explore_noise
        self.policy_delay = policy_delay
        # critic-first schedule: freeze the actor for the first
        # ``actor_delay`` updates. A freshly-initialized critic's gradient
        # is noise — chasing it destroys a good actor init (we initialize
        # at the default weights) before the critic has learned anything.
        self.actor_delay = actor_delay
        # TD3+BC-style anchor: actor loss gains
        # anchor_weight * ||a - init_action||^2, so the actor leaves the
        # (near-optimal) default operating point only where the critic's
        # predicted gain beats the penalty — guards against Q
        # extrapolation error in barely-explored action regions
        self.anchor_weight = anchor_weight
        self._anchor = jnp.asarray(
            np.zeros(ACT_DIM, np.float32) if init_action is None
            else np.asarray(init_action, np.float32))
        self.actor_def = Actor(
            init_action=(0.0, 0.0, 0.0) if init_action is None
            else tuple(float(a) for a in np.asarray(init_action)))
        self.critic_def = Critic()
        self.opt_a = optax.adam(actor_lr)
        self.opt_c = optax.adam(critic_lr)

        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        obs0 = jnp.zeros((1, OBS_DIM))
        act0 = jnp.zeros((1, ACT_DIM))
        pa = self.actor_def.init(k1, obs0)
        pc1 = self.critic_def.init(k2, obs0, act0)
        pc2 = self.critic_def.init(k3, obs0, act0)
        self.state = TD3State(
            actor=pa, actor_target=pa, critic1=pc1, critic2=pc2,
            critic1_target=pc1, critic2_target=pc2,
            opt_actor=self.opt_a.init(pa),
            opt_critic=self.opt_c.init((pc1, pc2)),
            step=jnp.zeros((), jnp.int32))

        self.act, self._update = _make_td3_fns(
            self.actor_def, self.critic_def, gamma, tau, policy_noise,
            noise_clip, policy_delay, actor_delay, anchor_weight,
            self._anchor, actor_lr, critic_lr)

    def explore(self, key, obs):
        a = self.act(self.state.actor, obs)
        noise = self.explore_noise * jax.random.normal(key, a.shape)
        return jnp.clip(a + noise, -1.0, 1.0)

    def update(self, replay: Replay, key, batch_size=64):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (batch_size,), 0,
                                 jnp.maximum(replay.size, 1))
        batch = (replay.obs[idx], replay.act[idx], replay.rew[idx],
                 replay.nobs[idx], replay.done[idx])
        self.state, closs, aloss = self._update(self.state, batch, k2)
        return float(closs), float(aloss)


def evaluate_policy(env, agent: TD3, episodes: int = 2, seed: int = 123):
    """Deterministic (noise-free) rollouts on a held-out env; returns the
    mean per-step reward (the reference's test_envs pass,
    td3.py:100-115)."""
    key = jax.random.PRNGKey(seed)
    total, steps = 0.0, 0
    for ep in range(episodes):
        key, kr = jax.random.split(key)
        state, obs = env.reset(kr)
        obs = obs.reshape(obs.shape[0], -1)
        done = jnp.zeros(env.B, bool)
        for _ in range(env.horizon):
            act = agent.act(agent.state.actor, obs)
            state, obs, rew, done = env.step(state, act)
            obs = obs.reshape(obs.shape[0], -1)
            total += float(rew.mean())
            steps += 1
            if bool(done.all()):
                break
    return total / max(steps, 1)


def train_td3(env, agent: TD3, epochs=20, steps_per_epoch=80,
              batch_size=64, replay_capacity=20000, warmup=200, seed=0,
              log=None, eval_env=None):
    """Off-policy training loop (td3.py:56-124 hyperscale defaults; batch
    64 instead of the reference's 8 — batched updates are free on TPU).

    With ``eval_env`` (held-out instances), the policy is evaluated
    noise-free after every epoch and the BEST-reward actor parameters are
    restored at the end (reference best-checkpoint save, td3.py:100-115).
    """
    key = jax.random.PRNGKey(seed + 1)
    replay = make_replay(replay_capacity)
    key, kr = jax.random.split(key)
    state, obs = env.reset(kr)
    obs = obs.reshape(obs.shape[0], -1)
    rewards_hist = []

    total = 0
    best_eval, best_actor = -np.inf, None
    for epoch in range(epochs):
        ep_rew = []
        for _ in range(steps_per_epoch):
            key, ka, ku, kr2 = jax.random.split(key, 4)
            if total < warmup:
                act = jax.random.uniform(ka, (env.B, ACT_DIM),
                                         minval=-1.0, maxval=1.0)
            else:
                act = agent.explore(ka, obs)
            state, nobs, rew, done = env.step(state, act)
            nobs = nobs.reshape(nobs.shape[0], -1)
            replay = replay_add(replay, obs, act, rew, nobs, done)
            ep_rew.append(float(rew.mean()))
            obs = nobs
            total += env.B
            if bool(done.any()):
                key, kr3 = jax.random.split(key)
                state, obs = env.reset(kr3)
                obs = obs.reshape(obs.shape[0], -1)
            if total >= warmup:
                agent.update(replay, ku, batch_size)
        rewards_hist.append(float(jnp.mean(jnp.asarray(ep_rew))))
        msg = f"epoch {epoch}: mean reward {rewards_hist[-1]:.3f}"
        if eval_env is not None:
            ev = evaluate_policy(eval_env, agent, seed=seed + 77)
            msg += f"  eval {ev:.3f}"
            if ev > best_eval:
                best_eval, best_actor = ev, jax.tree.map(
                    lambda x: x.copy(), agent.state.actor)
                msg += " (best)"
        if log:
            log(msg)
    if best_actor is not None:
        agent.state = agent.state._replace(actor=best_actor)
    return agent, rewards_hist
