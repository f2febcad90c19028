"""Checkpoint IO with per-iteration history (flat npz pytrees).

Mirrors the reference layout (main.py:260-269, main_gail_dyn_ppo.py:307-320,
my_pybullet_envs/utils.py:24-82): every save writes both ``<ENV>`` (latest)
and ``<ENV>_<iter>``; discriminators as ``<ENV>_D`` / ``<ENV>_<iter>_D``.
The per-iteration history is load-bearing — stage-2 refinement builds its
5-member dynamics ensemble from specific historical iterations
(hopper_env_combined_policy.py:113-140: iters 80..160;
laikago_env_combined_policy.py:126-153: iters 550..950).

Unlike the reference (whole pickled nn.Modules), checkpoints here are pure
param pytrees + a metadata dict (model class / sizes), so they are
forward-compatible and device-agnostic.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

from simgan_tpu.agents.networks import Discriminator, MLPPolicy, SplitPolicy


def _ckpt_dir(policy_dir: str, env_name: str, iter_num=None, disc=False) -> str:
    name = env_name
    if iter_num is not None and iter_num >= 0:
        name = f"{env_name}_{int(iter_num)}"
    if disc:
        name = name + "_D"
    return os.path.join(policy_dir, name + ".npz")


def _flatten(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return tree


def save_policy(policy_dir: str, env_name: str, model, params, iter_num=None, disc=False):
    os.makedirs(policy_dir, exist_ok=True)
    fields = {f for f in getattr(model, "__dataclass_fields__", {})
              if f not in ("parent", "name")}
    meta = {
        "model": type(model).__name__,
        "kwargs": {k: getattr(model, k) for k in ("action_dim", "hidden", "num_feet",
                                                  "contact_dims")
                   if k in fields},
    }
    path = _ckpt_dir(policy_dir, env_name, iter_num, disc)
    flat = _flatten(jax.device_get(params))
    np.savez(path, __meta__=json.dumps(meta), **flat)
    return path


_MODELS = {"MLPPolicy": MLPPolicy, "SplitPolicy": SplitPolicy, "Discriminator": Discriminator}


def load_policy(policy_dir: str, env_name: str, iter_num=None, disc=False):
    """Returns (model, params).  Analog of utils.load /
    load_gail_discriminator (my_pybullet_envs/utils.py:24-82)."""
    path = _ckpt_dir(policy_dir, env_name, iter_num, disc)
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    flat = {k: data[k] for k in data.files if k != "__meta__"}
    params = jax.tree.map(lambda x: x, _unflatten(flat))
    model = _MODELS[meta["model"]](**meta["kwargs"])
    return model, params


def load_ensemble(policy_dir: str, env_name: str, iters: list[int]):
    """Stack per-iteration checkpoints into an ensemble pytree with a leading
    member axis (for per-step member gathers inside the combined envs)."""
    models_params = [load_policy(policy_dir, env_name, i) for i in iters]
    model = models_params[0][0]
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *[p for _, p in models_params])
    return model, stacked


def load_cross_ensemble(policy_dirs: list[str], env_name: str, iter_num=None):
    """Cross-run ensemble: the SAME iteration from each of several
    identification runs (e.g. independent seeds), stacked on a member axis.

    Framework extension beyond the reference, whose 5-member ensemble is
    five iterations of ONE run (hopper_env_combined_policy.py:113-140,
    laikago_env_combined_policy.py:126-153) and therefore shares one
    training trajectory's blind spots.  Independently-trained members give
    the refinement ensemble bagging-style diversity; see the RESULTS.md
    seed study for why that matters (refinement-exploitation variance)."""
    models_params = [load_policy(d, env_name, iter_num) for d in policy_dirs]
    model = models_params[0][0]
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *[p for _, p in models_params])
    return model, stacked
