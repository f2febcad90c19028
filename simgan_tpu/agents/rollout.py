"""On-device rollout collection: lax.scan over (policy act -> vmapped env step).

Replaces the reference's ShmemVecEnv worker processes + VecPyTorch tensor
glue + RolloutStorage insert loop (SURVEY §3.1 HOT LOOP #1): the policy MLP,
the physics, the windows and the reward filter all live in one XLA program;
nothing crosses the host boundary during an update's 1000x8 env steps.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from simgan_tpu.agents import networks
from simgan_tpu.agents.running_stats import RunningMeanStd


class VectorEnv:
    """vmap-based vector env over a pure single env (usually AutoResetEnv)."""

    def __init__(self, env, num_envs: int):
        self.env = env
        self.num_envs = num_envs

    def reset(self, key):
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self.env.reset)(keys)

    def step(self, states, actions):
        return jax.vmap(self.env.step)(states, actions)


@struct.dataclass
class RewardNorm:
    """baselines VecNormalize(ret=True) reward filter (vec_normalize.py):
    rewards scaled by the std of the running discounted return, clip +-10."""

    ret: jax.Array          # (N,) running discounted return
    rms: RunningMeanStd
    gamma: float = struct.field(pytree_node=False, default=0.99)
    clip: float = struct.field(pytree_node=False, default=10.0)

    @classmethod
    def create(cls, num_envs: int, gamma: float) -> "RewardNorm":
        return cls(ret=jnp.zeros(num_envs), rms=RunningMeanStd.create(), gamma=gamma)

    def __call__(self, reward, done):
        ret = self.ret * self.gamma + reward
        rms = self.rms.update(ret)
        out = jnp.clip(reward / jnp.sqrt(rms.var + 1e-8), -self.clip, self.clip)
        ret = jnp.where(done, 0.0, ret)
        return self.replace(ret=ret, rms=rms), out


class Transition(NamedTuple):
    """One rollout step across N envs (stacked to (T, N, ...) by scan)."""

    obs: jax.Array
    action: jax.Array
    log_prob: jax.Array
    value: jax.Array
    reward: jax.Array        # post reward-filter (what PPO consumes)
    raw_reward: jax.Array
    mask: jax.Array          # 1 - done
    bad_mask: jax.Array      # 0 only at time-limit truncation
    feat: jax.Array          # merged (s,a,s') D features (zeros if unused)
    ep_return: jax.Array     # episode return at this step (valid when ep_done)
    ep_length: jax.Array     # episode length at this step (valid when ep_done)
    ep_done: jax.Array


class RolloutCarry(NamedTuple):
    states: Any
    obs: jax.Array
    key: jax.Array
    reward_norm: Optional[RewardNorm]


def collect(
    venv: VectorEnv,
    model,
    params,
    carry: RolloutCarry,
    num_steps: int,
    feat_fn: Callable | None = None,
    deterministic: bool = False,
) -> tuple[RolloutCarry, Transition]:
    """Roll `num_steps` across the vector env; returns (T, N, ...) arrays."""

    def body(c: RolloutCarry, _):
        key, k_act = jax.random.split(c.key)
        value, action, log_prob = networks.policy_act(
            model, params, c.obs, k_act, deterministic=deterministic)
        s = venv.step(c.states, action)

        if feat_fn is not None:
            feat = feat_fn(s.window)
        else:
            feat = jnp.zeros((venv.num_envs, 0))

        if c.reward_norm is not None:
            rn, reward = c.reward_norm(s.reward, s.done)
        else:
            rn, reward = None, s.reward

        t = Transition(
            obs=c.obs,
            action=action,
            log_prob=log_prob,
            value=value,
            reward=reward,
            raw_reward=s.reward,
            mask=1.0 - s.done.astype(jnp.float32),
            bad_mask=1.0 - s.truncated.astype(jnp.float32),
            feat=feat,
            ep_return=s.metrics["episode_return"],
            ep_length=s.metrics["episode_length"],
            ep_done=s.done,
        )
        return RolloutCarry(s.state, s.obs, key, rn), t

    return jax.lax.scan(body, carry, None, length=num_steps)
