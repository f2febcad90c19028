"""SimGAN hybrid-simulator identification trainer (main_gail_dyn_ppo rebuilt).

Per update, entirely on device (one jitted function):
  1. roll pi_dyn for num_steps x N in the combined env (frozen behavior
     policy fused into env.step), collecting merged (s, a, s') windows;
  2. gail_epoch x minibatch discriminator SGD with gradient penalty;
  3. survival-bias offset from done-count vs expert episode length
     (main_gail_dyn_ppo.py:258-271);
  4. overwrite rewards with log D - log(1-D) - r_sa, renormalize by the
     running return RMS, clip +-10 (main_gail_dyn_ppo.py:273-297);
  5. GAE + PPO on the dynamics policy.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu import envs as env_registry
from simgan_tpu.agents import gail, networks
from simgan_tpu.agents.gail import GailConfig
from simgan_tpu.agents.networks import MLPPolicy, SplitPolicy
from simgan_tpu.agents.ppo import Batch, compute_gae, ppo_update
from simgan_tpu.agents.rollout import RolloutCarry, VectorEnv, collect
from simgan_tpu.agents.running_stats import RunningMeanStd
from simgan_tpu.envs.base import AutoResetEnv
from simgan_tpu.train import checkpoints
from simgan_tpu.train.config import TrainConfig
from simgan_tpu.train.train_behavior import (load_combined_policies, ppo_config,
                                             make_lr_optimizer, setup_logging,
                                             write_source_snapshot)
from simgan_tpu.utils import pickle_io

S_IDX = (0,)   # main_gail_dyn_ppo.py:152-153
A_IDX = (0,)


class SimGanState(NamedTuple):
    params: Any
    opt_state: Any
    disc: gail.DiscriminatorState
    ret_rms: RunningMeanStd
    carry: RolloutCarry


def make_update_fn(venv, model, tx, disc_model, disc_tx, expert_feats,
                   gail_tar_length, cfg: TrainConfig):
    pcfg = ppo_config(cfg)
    gcfg = GailConfig(hidden=cfg.gail_dis_hdim, batch_size=cfg.gail_batch_size,
                      epochs=cfg.gail_epoch)

    def feat_fn(window):
        return window.select_and_merge(S_IDX, A_IDX)

    def update(state: SimGanState, key):
        k_d, k_ppo = jax.random.split(key)

        carry, traj = collect(venv, model, state.params, state.carry,
                              cfg.num_steps, feat_fn=feat_fn)

        # --- discriminator update on this rollout's features ---
        policy_feats = traj.feat.reshape(-1, traj.feat.shape[-1])
        disc, d_stats = gail.update(disc_model, disc_tx, state.disc,
                                    expert_feats, policy_feats, k_d, gcfg)

        # --- survival-bias offset (main_gail_dyn_ppo.py:258-271) ---
        num_dones = jnp.sum(1.0 - traj.mask) + cfg.num_processes / 2.0
        num_expert_dones = (cfg.num_steps * cfg.num_processes) / gail_tar_length
        d_sa = 1.0 - num_dones / (num_dones + num_expert_dones)
        r_sa = 0.0 if cfg.no_alive_bonus else jnp.log(d_sa) - jnp.log(1.0 - d_sa)

        # --- reward overwrite + return-RMS renormalization ---
        disc, rewards, returns = gail.predict_reward(
            disc_model, disc, traj.feat, traj.mask, cfg.gamma, offset=-r_sa)
        ret_rms = state.ret_rms.update(returns.reshape(-1))
        rewards = jnp.clip(rewards / jnp.sqrt(ret_rms.var + 1e-7), -10.0, 10.0)

        # --- PPO on pi_dyn ---
        next_value, _, _ = model.apply(state.params, carry.obs)
        gae_returns = compute_gae(rewards, traj.value, next_value, traj.mask,
                                  traj.bad_mask, pcfg.gamma, pcfg.gae_lambda,
                                  pcfg.use_proper_time_limits)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        values = flat(traj.value)
        rets = flat(gae_returns)
        batch = Batch(obs=flat(traj.obs), actions=flat(traj.action),
                      value_preds=values, returns=rets,
                      old_log_probs=flat(traj.log_prob), advantages=rets - values)
        params, opt_state, stats = ppo_update(
            model, state.params, state.opt_state, tx, batch, k_ppo, pcfg)

        stats = dict(stats)
        stats.update(d_stats)
        stats["gail_rewards"] = jnp.mean(returns)
        stats["episode_count"] = jnp.sum(traj.ep_done)
        stats["episode_reward_sum"] = jnp.sum(jnp.where(traj.ep_done, traj.ep_return, 0.0))
        return SimGanState(params, opt_state, disc, ret_rms, carry), stats

    return update


def train(cfg: TrainConfig, env_kwargs: dict | None = None, env_extra: dict | None = None):
    env_kwargs = dict(env_kwargs or {})
    env_kwargs.update(env_extra or {})
    assert cfg.algo == "ppo", "only PPO is supported in gail dyn"

    save_path = os.path.join(cfg.save_dir, cfg.algo)
    logger = setup_logging(save_path)

    env = env_registry.make(cfg.env_name, **env_kwargs)
    venv = VectorEnv(AutoResetEnv(env), cfg.num_processes)
    write_source_snapshot(save_path, env)

    key = jax.random.PRNGKey(cfg.seed)
    key, k_pi, k_d, k_env = jax.random.split(key, 4)

    if cfg.use_split_pi:
        model = SplitPolicy(num_feet=cfg.num_feet, hidden=cfg.hidden_size)
    else:
        model = MLPPolicy(action_dim=env.act_dim, hidden=cfg.hidden_size)
    if cfg.warm_start:
        policy_dir, env_name = os.path.split(cfg.warm_start)
        env_name = env_name.removesuffix(".npz").removesuffix(".pt")
        model, params = checkpoints.load_policy(policy_dir, env_name)
        if cfg.warm_start_logstd is not None:
            params = networks.reset_logstd(model, params, cfg.warm_start_logstd)
    else:
        params = model.init(k_pi, jnp.zeros((1, env.obs_dim)))

    # --- expert data (main_gail_dyn_ppo.py:141-175) ---
    rng = np.random.RandomState(cfg.seed)
    expert_sas = pickle_io.load_sas_wpast(
        cfg.gail_traj_path, downsample_freq=int(cfg.gail_downsample_frequency),
        load_num_trajs=cfg.gail_traj_num, rng=rng)
    s_dim = expert_sas[-1].shape[1]
    a_dim = expert_sas[-2].shape[1]
    info_length = len(S_IDX) * s_dim + len(A_IDX) * a_dim + s_dim
    expert_feats = jnp.asarray(
        pickle_io.select_and_merge_sas(expert_sas, S_IDX, A_IDX))
    assert expert_feats.shape[1] == info_length, (expert_feats.shape, info_length)
    gail_tar_length = (expert_feats.shape[0] * 1.0 / cfg.gail_traj_num
                       * cfg.gail_downsample_frequency)

    disc_model, disc_tx, disc_state = gail.create(
        k_d, info_length, cfg.num_processes,
        GailConfig(hidden=cfg.gail_dis_hdim, batch_size=cfg.gail_batch_size,
                   epochs=cfg.gail_epoch))

    tx = make_lr_optimizer(cfg)
    opt_state = tx.init(params)

    states, obs = venv.reset(k_env)
    carry = RolloutCarry(states, obs, key, None)
    train_state = SimGanState(params, opt_state, disc_state,
                              RunningMeanStd.create(), carry)

    update_fn = jax.jit(make_update_fn(
        venv, model, tx, disc_model, disc_tx, expert_feats, gail_tar_length, cfg))

    start = time.time()
    for j in range(cfg.num_updates):
        key, k_up = jax.random.split(key)
        train_state, stats = update_fn(train_state, k_up)

        if (j % cfg.save_interval == 0 or j == cfg.num_updates - 1) and cfg.save_dir:
            checkpoints.save_policy(save_path, cfg.env_name, model, train_state.params)
            checkpoints.save_policy(save_path, cfg.env_name, model, train_state.params, iter_num=j)
            checkpoints.save_policy(save_path, cfg.env_name, disc_model,
                                    train_state.disc.params, disc=True)
            checkpoints.save_policy(save_path, cfg.env_name, disc_model,
                                    train_state.disc.params, iter_num=j, disc=True)

        if j % cfg.log_interval == 0:
            s = jax.device_get(stats)
            total_steps = (j + 1) * cfg.num_processes * cfg.num_steps
            fps = int(total_steps / (time.time() - start))
            ep_count = max(float(s["episode_count"]), 1.0)
            logger.info(
                "Updates %d, num timesteps %d, FPS %d, mean reward %.1f, "
                "dist_en %.3f, l_pi %.4f, l_vf %.4f, gail_r %.3f, "
                "loss_gail %.3f (e %.3f p %.3f)",
                j, total_steps, fps,
                float(s["episode_reward_sum"]) / ep_count,
                float(s["dist_entropy"]), float(s["action_loss"]),
                float(s["value_loss"]), float(s["gail_rewards"]),
                float(s["gail_loss"]), float(s["gail_loss_e"]), float(s["gail_loss_p"]),
            )
    return model, train_state.params, disc_model, train_state.disc.params


def main(argv=None):
    from simgan_tpu.train.config import parse_args

    cfg, extra = parse_args(argv)
    env_extra = load_combined_policies(cfg, extra)
    train(cfg, extra, env_extra)


if __name__ == "__main__":
    main()
