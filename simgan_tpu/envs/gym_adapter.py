"""Stateful gym-style adapter over the pure functional envs.

For users of the reference who expect ``env.reset() -> obs`` /
``env.step(a) -> (obs, reward, done, info)`` with numpy arrays and an
``info["sas_window"]`` 21-slot list (hopper_env_v3.py:283), plus ``seed``,
``get_dist`` and ``getSourceCode`` (SURVEY §1 L2 interface).  Jit-compiled
under the hood; single-env convenience only — training uses the vectorized
pure API.
"""

from __future__ import annotations

import inspect

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu import envs as registry


class GymEnv:
    metadata = {"render.modes": [], "video.frames_per_second": 50}

    def __init__(self, env_id: str, seed: int = 0, **kwargs):
        self._env = registry.make(env_id, **kwargs)
        self._reset = jax.jit(self._env.reset)
        self._step = jax.jit(self._env.step)
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self.env_id = env_id

        self.action_dim = self._env.act_dim
        self.obs_dim = self._env.obs_dim
        self.action_space = _Box(-np.ones(self.action_dim), np.ones(self.action_dim))
        self.observation_space = _Box(
            -np.inf * np.ones(self.obs_dim), np.inf * np.ones(self.obs_dim))

    def seed(self, seed=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        return [seed]

    def reset(self):
        self._key, k = jax.random.split(self._key)
        self._state, obs = self._reset(k)
        return np.asarray(obs)

    def step(self, action):
        s = self._step(self._state, jnp.asarray(action, dtype=jnp.float32))
        self._state = s.state
        window = jax.device_get(s.window)
        sas_window = [list(o) for o in window.obs] + \
                     [list(a) for a in window.act] + [list(window.next_obs)]
        info = {"sas_window": sas_window}
        if bool(s.truncated):
            info["bad_transition"] = True
        return np.asarray(s.obs), float(s.reward), bool(s.done), info

    def get_dist(self):
        phys = getattr(self._state, "phys", None)
        if phys is None:
            return 0.0
        if self._env.sys.fixed_base:
            return float(phys.q[0])       # hopper: root prismatic x
        # floating base (laikago): x of the base-link COM, matching the
        # reference's get_dist (root body position, laikago_env_v4.py)
        from simgan_tpu.core import maths
        com = phys.q[0:3] + maths.quat_rotate(phys.q[3:7], self._env.sys.com[0])
        return float(com[0])

    def getSourceCode(self):
        return inspect.getsource(type(self._env)) + inspect.getsource(type(self))

    def close(self):
        pass


class _Box:
    """Minimal gym.spaces.Box stand-in (gym is not a dependency)."""

    def __init__(self, low, high):
        self.low = np.asarray(low, dtype=np.float32)
        self.high = np.asarray(high, dtype=np.float32)
        self.shape = self.low.shape
        self.dtype = np.float32

    def sample(self, rng=np.random):
        return rng.uniform(-1.0, 1.0, size=self.shape).astype(np.float32)
