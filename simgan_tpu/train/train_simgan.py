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
from simgan_tpu.train.train_behavior import (compact_episodes, emit_monitor,
                                             load_combined_policies,
                                             make_lr_optimizer, make_trace_ctx,
                                             ppo_config, setup_logging,
                                             write_source_snapshot)
from simgan_tpu.utils import pickle_io

def window_indices(cfg: TrainConfig) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Past-frame indices of the sas window fed to the discriminator
    (main_gail_dyn_ppo.py:152-157; the paper uses s_idx=a_idx=[0])."""
    s_idx = tuple(int(x) for x in str(cfg.gail_s_idx).split(","))
    a_idx = tuple(int(x) for x in str(cfg.gail_a_idx).split(","))
    return s_idx, a_idx


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
    s_idx, a_idx = window_indices(cfg)

    if cfg.gail_dyn:
        def feat_fn(window):
            return window.select_and_merge(s_idx, a_idx)
    else:
        # plain state-action GAIL (reference algo/gail.py:91-152): the
        # discriminator sees (s_t, a_t) rows, no next state
        def feat_fn(window):
            return jnp.concatenate(
                [window.obs[..., 0, :], window.act[..., 0, :]], axis=-1)

    def update(state: SimGanState, key):
        k_d, k_ppo = jax.random.split(key)

        carry, traj = collect(venv, model, state.params, state.carry,
                              cfg.num_steps, feat_fn=feat_fn)

        # --- discriminator update on this rollout's features ---
        policy_feats = traj.feat.reshape(-1, traj.feat.shape[-1])
        if cfg.d_ensemble > 1:
            # K members, per-member expert bootstraps (expert_feats is
            # (K, M, F) here) — framework extension, --d-ensemble
            disc, d_stats = gail.update_ensemble(
                disc_model, disc_tx, state.disc, expert_feats, policy_feats,
                k_d, gcfg)
        else:
            disc, d_stats = gail.update(disc_model, disc_tx, state.disc,
                                        expert_feats, policy_feats, k_d, gcfg)

        # --- survival-bias offset (main_gail_dyn_ppo.py:258-271; the plain
        # GAIL path uses predict_reward's default offset=0, gail.py:195) ---
        num_dones = jnp.sum(1.0 - traj.mask) + cfg.num_processes / 2.0
        num_expert_dones = (cfg.num_steps * cfg.num_processes) / gail_tar_length
        d_sa = 1.0 - num_dones / (num_dones + num_expert_dones)
        use_offset = cfg.gail_dyn and not cfg.no_alive_bonus
        r_sa = jnp.log(d_sa) - jnp.log(1.0 - d_sa) if use_offset else 0.0

        # --- reward overwrite + return-RMS renormalization ---
        predict = (gail.predict_reward_ensemble if cfg.d_ensemble > 1
                   else gail.predict_reward)
        disc, rewards, returns = predict(
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
        stats["_episodes"] = compact_episodes(traj)
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
        model = SplitPolicy(
            num_feet=cfg.num_feet, hidden=cfg.hidden_size,
            contact_dims=5 if env_kwargs.get("dyn_stiffness") else 4)
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
    # act-dim consistency check on the FINAL model (covers warm starts too):
    # a SplitPolicy checkpoint identified with/without dyn_stiffness must
    # match the env's contact_dims, else the battery slice misbroadcasts
    # deep inside the combined env
    assert model.action_dim == env.act_dim, (
        f"policy action_dim {model.action_dim} != env act_dim {env.act_dim} "
        f"(dyn_stiffness env flag vs the policy's contact_dims?)")

    # --- expert data (main_gail_dyn_ppo.py:141-175) ---
    rng = np.random.RandomState(cfg.seed)
    expert_sas = pickle_io.load_sas_wpast(
        cfg.gail_traj_path, downsample_freq=int(cfg.gail_downsample_frequency),
        load_num_trajs=cfg.gail_traj_num, rng=rng)
    s_idx, a_idx = window_indices(cfg)
    s_dim = expert_sas[-1].shape[1]
    a_dim = expert_sas[-2].shape[1]
    if cfg.gail_dyn:
        info_length = len(s_idx) * s_dim + len(a_idx) * a_dim + s_dim
        expert_feats = jnp.asarray(
            pickle_io.select_and_merge_sas(expert_sas, s_idx, a_idx))
    else:
        # plain GAIL: expert rows are (s_t, a_t) — newest obs/act frames
        len_win = (len(expert_sas) - 1) // 2
        info_length = s_dim + a_dim
        expert_feats = jnp.asarray(np.concatenate(
            [expert_sas[0], expert_sas[len_win]], axis=1))
    assert expert_feats.shape[1] == info_length, (expert_feats.shape, info_length)
    gail_tar_length = (expert_feats.shape[0] * 1.0 / cfg.gail_traj_num
                       * cfg.gail_downsample_frequency)

    gcfg0 = GailConfig(hidden=cfg.gail_dis_hdim, batch_size=cfg.gail_batch_size,
                       epochs=cfg.gail_epoch)
    if cfg.d_ensemble > 1:
        # per-member expert bootstrap (with replacement): each D sees a
        # different draw of the same expert data — diversity-in-data for the
        # identification reward (see config.py d_ensemble)
        M = expert_feats.shape[0]
        boot = rng.randint(0, M, size=(cfg.d_ensemble, M))
        expert_feats = expert_feats[jnp.asarray(boot)]        # (K, M, F)
        disc_model, disc_tx, disc_state = gail.create_ensemble(
            k_d, info_length, cfg.num_processes, gcfg0, cfg.d_ensemble)
    else:
        disc_model, disc_tx, disc_state = gail.create(
            k_d, info_length, cfg.num_processes, gcfg0)

    tx = make_lr_optimizer(cfg)
    opt_state = tx.init(params)

    states, obs = venv.reset(k_env)
    carry = RolloutCarry(states, obs, key, None)
    train_state = SimGanState(params, opt_state, disc_state,
                              RunningMeanStd.create(), carry)

    from simgan_tpu.train.train_behavior import jit_update_fn
    update_fn, train_state = jit_update_fn(
        cfg, make_update_fn(venv, model, tx, disc_model, disc_tx, expert_feats,
                            gail_tar_length, cfg), train_state)

    from simgan_tpu.utils import kv_logger
    from simgan_tpu.utils.monitor import MonitorWriter

    monitor = MonitorWriter(save_path, rank=0, env_id=cfg.env_name)
    # SIMGAN_KV_LOG=csv,json opts into baselines-style progress files
    kv = kv_logger.maybe_configure(save_path)
    start = time.time()
    for j in range(cfg.num_updates):
        key, k_up = jax.random.split(key)
        with make_trace_ctx(j):
            train_state, stats = update_fn(train_state, k_up)
        stats = dict(stats)
        emit_monitor(monitor, stats)

        if (j % cfg.save_interval == 0 or j == cfg.num_updates - 1) and cfg.save_dir:
            checkpoints.save_policy(save_path, cfg.env_name, model, train_state.params)
            checkpoints.save_policy(save_path, cfg.env_name, model, train_state.params, iter_num=j)
            d_params = train_state.disc.params
            if cfg.d_ensemble > 1:
                # keep the _D checkpoint format single-member (member 0) so
                # collect's D-score diagnostics stay loadable
                d_params = jax.tree.map(lambda x: x[0], d_params)
            checkpoints.save_policy(save_path, cfg.env_name, disc_model,
                                    d_params, disc=True)
            checkpoints.save_policy(save_path, cfg.env_name, disc_model,
                                    d_params, iter_num=j, disc=True)

        if j % cfg.log_interval == 0:
            s = jax.device_get(stats)
            total_steps = (j + 1) * cfg.num_processes * cfg.num_steps
            fps = int(total_steps / (time.time() - start))
            ep_count = max(float(s["episode_count"]), 1.0)
            if kv is not None:
                kv.logkvs({"updates": j, "total_timesteps": total_steps,
                           "fps": fps,
                           "mean_reward": float(s["episode_reward_sum"]) / ep_count,
                           "gail_reward": float(s["gail_rewards"]),
                           "gail_loss": float(s["gail_loss"]),
                           "value_loss": float(s["value_loss"]),
                           "action_loss": float(s["action_loss"])})
                kv.dumpkvs()
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
    monitor.close()
    return model, train_state.params, disc_model, train_state.disc.params


def main(argv=None):
    from simgan_tpu.train.config import parse_args

    cfg, extra = parse_args(argv)
    env_extra = {}
    if cfg.env_name.endswith("CombinedEnv-v1"):
        env_extra = load_combined_policies(cfg, extra)
    train(cfg, extra, env_extra)


if __name__ == "__main__":
    main()
