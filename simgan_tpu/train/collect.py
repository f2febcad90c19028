"""Trajectory collection / final-test evaluation (collect_tarsim_traj rebuilt).

The reference rolls one env serially for N trajectories
(collect_tarsim_traj.py:206-259).  Here all N trajectories roll in parallel
on device: ``vmap`` over trajectories, ``lax.scan`` over the 500-step
horizon, with done-latching so each trajectory freezes at termination.  The
pickle written by ``--save-traj`` is byte-compatible with the reference
format (dict{traj_idx: [21-slot sas_window rows]}), so expert data is
interchangeable in both directions.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu import envs as env_registry
from simgan_tpu.agents import networks
from simgan_tpu.envs.base import SasWindow
from simgan_tpu.train import checkpoints
from simgan_tpu.utils import pickle_io


@dataclasses.dataclass
class CollectConfig:
    env_name: str = "HopperURDFEnv-v3"
    src_env_name: str = ""
    load_dir: str = "./trained_models/"
    save_traj: bool = False
    num_trajs: int = 200
    save_path: str = "./tmp.pkl"
    reset_logstd: Optional[float] = None
    non_det: bool = False
    iter: Optional[int] = None
    r_thres: float = 4000.0
    seed: int = 1
    max_steps: int = 500
    # discriminator-probability diagnostics (collect_tarsim_traj.py:37-63):
    # load <dis_dir>/<env>_D[.iter].npz and plot avg per-step sigmoid(D)
    dis_dir: str = ""
    dis_iter: Optional[int] = None
    d_plot_path: str = ""
    # rollout visualization (the reference renders live via the PyBullet GUI,
    # collect_tarsim_traj.py:146-157): write render_trajs skeleton/trace PNGs
    # under this directory (utils/render.py)
    render_path: str = ""
    render_trajs: int = 3


def rollout_trajs(env, model, params, key, num_trajs: int, max_steps: int,
                  deterministic: bool):
    """Returns per-traj (rewards (B,T), dones-latch valid (B,T), windows,
    lengths (B,), x-dist (B,)) — one jitted program."""

    def single(key):
        k_reset, k_steps = jax.random.split(key)
        state, obs = env.reset(k_reset)

        def body(carry, k):
            state, obs, alive = carry
            _, action, _ = networks.policy_act(model, params, obs, k,
                                               deterministic=deterministic)
            s = env.step(state, action)
            # latch: once done, stop advancing state
            from simgan_tpu.envs.base import tree_where
            new_state = tree_where(alive, s.state, state)
            new_obs = jnp.where(alive, s.obs, obs)
            valid = alive
            alive = alive & ~s.done
            out = (s.reward, valid, s.window, s.metrics.get("x", jnp.asarray(0.0)))
            return (new_state, new_obs, alive), out

        keys = jax.random.split(k_steps, max_steps)
        (_, _, _), (rewards, valid, windows, xs) = jax.lax.scan(
            body, (state, obs, jnp.asarray(True)), keys)
        valid_f = valid.astype(jnp.float32)
        length = jnp.sum(valid_f).astype(jnp.int32)
        total_r = jnp.sum(rewards * valid_f)
        last_x = xs[jnp.maximum(length - 1, 0)]
        return rewards, valid, windows, length, total_r, last_x

    keys = jax.random.split(key, num_trajs)
    return jax.vmap(single)(keys)


def collect(cfg: CollectConfig, env_kwargs: dict | None = None,
            env_extra: dict | None = None):
    env_kwargs = dict(env_kwargs or {})
    env_kwargs.update(env_extra or {})
    env = env_registry.make(cfg.env_name, **env_kwargs)

    env_name_transfer = cfg.src_env_name or cfg.env_name
    model, params = checkpoints.load_policy(cfg.load_dir, env_name_transfer, cfg.iter)
    if cfg.reset_logstd is not None:
        params = networks.reset_logstd(model, params, cfg.reset_logstd)

    key = jax.random.PRNGKey(cfg.seed + 1000)
    fn = jax.jit(lambda k: rollout_trajs(
        env, model, params, k, cfg.num_trajs, cfg.max_steps,
        deterministic=not cfg.non_det))
    rewards, valid, windows, lengths, total_r, last_x = jax.device_get(fn(key))

    for i in range(cfg.num_trajs):
        print(f"{cfg.load_dir}\t tr: {total_r[i]:.1f}\t x: {last_x[i]:.2f}\t "
              f"len: {lengths[i]}")
    n_success = int(np.sum(total_r > cfg.r_thres))
    print(f"mean episode reward, {np.mean(total_r)}")
    print(f"median episode reward, {np.median(total_r)}")
    print(f"success {n_success}/{cfg.num_trajs} (r > {cfg.r_thres})")

    if cfg.dis_dir:
        from simgan_tpu.utils import d_scores
        d_model, d_params = checkpoints.load_policy(
            cfg.dis_dir, env_name_transfer, cfg.dis_iter, disc=True)
        scores = d_scores.d_scores_over_windows(d_model, d_params, windows)
        valid_np = np.asarray(valid, dtype=bool)
        masked = np.where(valid_np, scores, np.nan)
        with np.errstate(invalid="ignore"):
            avg = np.nanmean(masked, axis=0)
        print("avg D(real) over steps: first/mid/last %.3f/%.3f/%.3f"
              % (avg[0], avg[len(avg) // 2], avg[-1]))
        if cfg.d_plot_path:
            d_scores.plot_d_scores(np.nan_to_num(avg, nan=0.5), cfg.d_plot_path)
            print("D-score plot saved to", cfg.d_plot_path)

    if cfg.render_path:
        import os

        from simgan_tpu.utils.render import render_rollout
        os.makedirs(cfg.render_path, exist_ok=True)
        # same key tree as rollout_trajs: rendered traj i IS eval traj i
        rkeys = jax.random.split(key, cfg.num_trajs)
        for i in range(min(cfg.render_trajs, cfg.num_trajs)):
            png = os.path.join(cfg.render_path, f"traj_{i}.png")
            r, ln = render_rollout(env, model, params, rkeys[i], png,
                                   max_steps=cfg.max_steps,
                                   deterministic=not cfg.non_det,
                                   title=cfg.env_name)
            print(f"render {png}: reward {r:.1f} len {ln}")

    if cfg.save_traj:
        all_trajs = {}
        for i in range(cfg.num_trajs):
            rows = []
            for t in range(int(lengths[i])):
                rows.append(pickle_io.windows_to_rows(
                    windows.obs[i, t], windows.act[i, t], windows.next_obs[i, t]))
            all_trajs[i] = rows
        pickle_io.save_trajs(cfg.save_path, all_trajs)
        print("total tuple len", sum(len(v) for v in all_trajs.values()))
    return dict(mean_reward=float(np.mean(total_r)),
                median_reward=float(np.median(total_r)),
                success=n_success, rewards=total_r, lengths=lengths)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="RL")
    for f in dataclasses.fields(CollectConfig):
        flag = "--" + f.name.replace("-", "_").replace("_", "-")
        if f.name in ("save_traj", "non_det"):
            parser.add_argument(flag, type=int, default=0)
        elif f.name in ("reset_logstd",):
            parser.add_argument(flag, type=float, default=None)
        elif f.name in ("iter", "dis_iter"):
            parser.add_argument(flag, type=int, default=None)
        else:
            default = getattr(CollectConfig(), f.name)
            parser.add_argument(flag, type=type(default), default=default)
    args, unknown = parser.parse_known_args(argv)

    extra = {}
    it = iter(unknown)
    for k in it:
        v = next(it)
        try:
            v = float(v)
        except ValueError:
            pass
        extra[k.lstrip("-").replace("-", "_")] = v

    kwargs = {f.name: getattr(args, f.name) for f in dataclasses.fields(CollectConfig)}
    kwargs["save_traj"] = bool(kwargs["save_traj"])
    kwargs["non_det"] = bool(kwargs["non_det"])
    cfg = CollectConfig(**kwargs)

    env_extra = {}
    if cfg.env_name.endswith("CombinedEnv-v1"):
        from simgan_tpu.train.config import TrainConfig
        from simgan_tpu.train.train_behavior import load_combined_policies
        env_extra = load_combined_policies(
            TrainConfig(env_name=cfg.env_name), extra)
    collect(cfg, extra, env_extra)


if __name__ == "__main__":
    main()
