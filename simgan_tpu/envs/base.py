"""Functional env layer: shared state structures and window/noise helpers.

The reference's env stack (gym.Env subclasses + TimeLimit + Monitor +
ShmemVecEnv worker processes, SURVEY §2.1/§2.3) collapses here into pure
functions ``reset(key) -> (state, obs)`` / ``step(state, a) -> Step`` over
pytrees, ``vmap``-ed into an on-device vector env.  Auto-reset (the
ShmemVecEnv worker's reset-on-done, baselines shmem_vec_env.py:152-154),
time limits (gym TimeLimit + TimeLimitMask bad_transition flag,
third_party/a2c_ppo_acktr/envs.py:137-145), and episode statistics
(bench.Monitor, baselines/bench/monitor.py:82-101) are wrappers around the
pure step.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from simgan_tpu.core.system import DomainParams, PhysState

MAX_EPISODE_STEPS = 500  # my_pybullet_envs/__init__.py:34-56
WINDOW = 10              # deque(maxlen=10) obs/act history


@struct.dataclass
class SasWindow:
    """The 21-slot past-trajectory window ``[s_t..s_t-9, a_t..a_t-9, s_t+1]``
    emitted in info["sas_window"] (hopper_env_v3.py:193-198, 253)."""

    obs: jax.Array       # (10, obs_dim) s_t .. s_t-9
    act: jax.Array       # (10, act_dim) a_t .. a_t-9
    next_obs: jax.Array  # (obs_dim,) s_t+1

    def select_and_merge(self, s_idx=(0,), a_idx=(0,)) -> jax.Array:
        """utils.select_and_merge_sas (my_pybullet_envs/utils.py:233-263)."""
        parts = [self.obs[..., i, :] for i in s_idx]
        parts += [self.act[..., j, :] for j in a_idx]
        parts.append(self.next_obs)
        return jnp.concatenate(parts, axis=-1)


class Step(NamedTuple):
    state: Any
    obs: jax.Array
    reward: jax.Array
    done: jax.Array          # terminal OR truncated
    truncated: jax.Array     # time-limit hit (drives bad_masks GAE handling)
    window: SasWindow
    metrics: dict


def push_window(window: jax.Array, value: jax.Array, empty: jax.Array) -> jax.Array:
    """utils.push_recent_value (my_pybullet_envs/utils.py:280-288): newest at
    index 0; the first push after reset pads the whole window."""
    rolled = jnp.concatenate([value[None], window[:-1]], axis=0)
    padded = jnp.broadcast_to(value[None], window.shape)
    return jnp.where(empty, padded, rolled)


def fill_window(value: jax.Array) -> jax.Array:
    return jnp.broadcast_to(value[None], (WINDOW,) + value.shape)


def perturb(key: jax.Array, x: jax.Array, r: float | jax.Array) -> jax.Array:
    """Uniform(-r, r) additive noise (utils.perturb, utils.py:102-106)."""
    return x + jax.random.uniform(key, jnp.shape(x), minval=-1.0, maxval=1.0) * r


def latency_interp(w: jax.Array, latency: jax.Array) -> jax.Array:
    """Two-frame latency interpolation (hopper_env_v3.py:227-231, 306-310):
    ``s = s0*(1-latency/0.02) + s1*(latency/0.02)`` over a (10, d) window."""
    interp = latency / 0.02
    return w[0] * (1.0 - interp) + w[1] * interp


def joints_at_limit_count(q: jax.Array, ll: jax.Array, ul: jax.Array) -> jax.Array:
    """count(|2(q-mid)/(ul-ll)| > 0.97) (hopper_env_v3.py:263-266)."""
    mid = 0.5 * (ll + ul)
    q_scaled = 2.0 * (q - mid) / (ul - ll)
    return jnp.sum((jnp.abs(q_scaled) > 0.97).astype(jnp.float32), axis=-1)


def tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


# ---------------------------------------------------------------------------
# Wrappers (auto-reset + episode statistics), applied around a pure env
# ---------------------------------------------------------------------------


@struct.dataclass
class EpisodeStats:
    """bench.Monitor equivalent: per-episode return/length bookkeeping."""

    episode_return: jax.Array
    episode_length: jax.Array
    # values of the episode that *just finished* (valid when done)
    last_return: jax.Array
    last_length: jax.Array


@struct.dataclass
class AutoResetState:
    env: Any
    stats: EpisodeStats
    reset_key: jax.Array


class AutoResetEnv:
    """ShmemVecEnv-worker semantics: on done, return the obs of a fresh
    episode while reward/done/window refer to the terminal step."""

    def __init__(self, env):
        self.env = env

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        st, obs = self.env.reset(k1)
        stats = EpisodeStats(
            episode_return=jnp.asarray(0.0),
            episode_length=jnp.asarray(0, dtype=jnp.int32),
            last_return=jnp.asarray(0.0),
            last_length=jnp.asarray(0, dtype=jnp.int32),
        )
        return AutoResetState(env=st, stats=stats, reset_key=k2), obs

    def step(self, state: AutoResetState, action):
        s = self.env.step(state.env, action)
        ep_ret = state.stats.episode_return + s.reward
        ep_len = state.stats.episode_length + 1

        k_next, k_reset = jax.random.split(state.reset_key)
        fresh_env, fresh_obs = self.env.reset(k_reset)

        env_state = tree_where(s.done, fresh_env, s.state)
        obs = jnp.where(s.done, fresh_obs, s.obs)
        stats = EpisodeStats(
            episode_return=jnp.where(s.done, 0.0, ep_ret),
            episode_length=jnp.where(s.done, 0, ep_len),
            last_return=jnp.where(s.done, ep_ret, state.stats.last_return),
            last_length=jnp.where(s.done, ep_len, state.stats.last_length),
        )
        new_state = AutoResetState(env=env_state, stats=stats, reset_key=k_next)
        metrics = dict(s.metrics)
        metrics["episode_return"] = ep_ret
        metrics["episode_length"] = ep_len
        metrics["episode_done"] = s.done
        return Step(new_state, obs, s.reward, s.done, s.truncated, s.window, metrics)
