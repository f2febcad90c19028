"""Env registry: the four reference gym ids -> pure JAX envs.

Reference registry: my_pybullet_envs/__init__.py:34-56 (all registered with
max_episode_steps=500).  ``make`` accepts the same keyword knobs the
reference forwards through ``parse_args_with_unknown`` -> ``gym.make``
(floats standing in for bools, e.g. ``train_dyn=1``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

from simgan_tpu.envs.base import AutoResetEnv, SasWindow, Step
from simgan_tpu.envs.hopper_combined import HopperCombinedConfig, HopperCombinedEnv
from simgan_tpu.envs.hopper_env import HopperConfig, HopperEnv
from simgan_tpu.envs.laikago_combined import LaikagoCombinedConfig, LaikagoCombinedEnv
from simgan_tpu.envs.laikago_env import LaikagoConfig, LaikagoEnv

_REGISTRY = {
    "HopperURDFEnv-v3": (HopperEnv, HopperConfig),
    "LaikagoBulletEnv-v4": (LaikagoEnv, LaikagoConfig),
    "HopperCombinedEnv-v1": (HopperCombinedEnv, HopperCombinedConfig),
    "LaikagoCombinedEnv-v1": (LaikagoCombinedEnv, LaikagoCombinedConfig),
}

# reference env kwargs that have no analog in the rebuilt envs (host-side
# rendering / checkpoint-dir plumbing handled by the train layer instead)
_IGNORED_KEYS = {
    "render", "cuda_env", "behavior_dir", "behavior_env_name", "behavior_iter",
    "dyn_dir", "dyn_env_name", "dyn_iter", "src_env_name",
}


def make(env_id: str, **kwargs) -> Any:
    """Build an env.  Combined envs additionally accept behavior_model/
    behavior_params/dyn_model/dyn_ensemble_params (policy pytrees)."""
    cls, cfg_cls = _REGISTRY[env_id]
    policy_kwargs = {}
    cfg_kwargs = {}
    fields = {f.name for f in dataclasses.fields(cfg_cls)}
    for k, v in kwargs.items():
        k_norm = k.replace("-", "_")
        if k_norm in ("behavior_model", "behavior_params", "dyn_model",
                      "dyn_ensemble_params"):
            policy_kwargs[k_norm] = v
        elif k_norm in fields:
            f = next(f for f in dataclasses.fields(cfg_cls) if f.name == k_norm)
            if f.type in ("bool", bool):
                v = bool(v)
            elif f.type in ("int", int):
                v = int(v)
            cfg_kwargs[k_norm] = v
        elif k_norm in _IGNORED_KEYS:
            continue
        else:
            raise TypeError(f"unknown env kwarg {k!r} for {env_id}")
    cfg = cfg_cls(**cfg_kwargs)
    if policy_kwargs:
        return cls(cfg, **policy_kwargs)
    return cls(cfg)


__all__ = [
    "AutoResetEnv", "SasWindow", "Step", "make",
    "HopperEnv", "HopperConfig", "LaikagoEnv", "LaikagoConfig",
    "HopperCombinedEnv", "HopperCombinedConfig",
    "LaikagoCombinedEnv", "LaikagoCombinedConfig",
]
