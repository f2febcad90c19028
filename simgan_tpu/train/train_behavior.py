"""Behavior-policy / refinement trainer (reference main.py rebuilt).

One PPO update — 1000x N env steps of physics+policy rollout, GAE, reward
normalization, ppo_epoch x minibatch SGD — is a single jitted function; the
Python loop only logs and checkpoints.  Compare SURVEY §3.1: the reference
crosses a process boundary and the Bullet C++ boundary 8000 times per update.

Supports the reference's warm-start path (reset_critic + reset logstd,
main.py:79-88), linear LR decay, mirror-symmetry loss and dup-sym rollout
augmentation for laikago (main.py:133-147, 181-245), and reward
normalization via the VecNormalize(ret=True) filter (envs.py:122-125).
"""

from __future__ import annotations

import dataclasses
import inspect
import logging
import os
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simgan_tpu import envs as env_registry
from simgan_tpu.agents import networks
from simgan_tpu.agents.networks import MLPPolicy
from simgan_tpu.agents.ppo import Batch, PPOConfig, compute_gae, make_optimizer, ppo_update
from simgan_tpu.agents.rollout import RewardNorm, RolloutCarry, Transition, VectorEnv, collect
from simgan_tpu.envs.base import AutoResetEnv
from simgan_tpu.train import checkpoints
from simgan_tpu.train.config import TrainConfig
from simgan_tpu.utils import kv_logger


def setup_logging(save_path: str) -> logging.Logger:
    os.makedirs(save_path, exist_ok=True)
    logger = logging.getLogger("simgan_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s [%(levelname)-5.5s]  %(message)s")
    fh = logging.FileHandler(os.path.join(save_path, "console_output.log"))
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    return logger


def write_source_snapshot(save_path: str, env) -> None:
    """Reference getSourceCode regression insurance (main.py:101-106)."""
    try:
        src = inspect.getsource(type(env))
        with open(os.path.join(save_path, "source_test.py"), "w") as f:
            f.write(src)
    except OSError:
        pass


def ppo_config(cfg: TrainConfig) -> PPOConfig:
    return PPOConfig(
        clip_param=cfg.clip_param,
        ppo_epoch=cfg.ppo_epoch,
        num_mini_batch=cfg.num_mini_batch,
        value_loss_coef=cfg.value_loss_coef,
        entropy_coef=cfg.entropy_coef,
        lr=cfg.lr,
        eps=cfg.eps,
        max_grad_norm=cfg.max_grad_norm,
        gamma=cfg.gamma,
        gae_lambda=cfg.gae_lambda,
        use_proper_time_limits=not cfg.no_proper_time_limits,
        symmetry_coef=cfg.loss_sym,
    )


def make_lr_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam(eps=1e-5) + grad clip, with optional per-update linear LR decay
    (utils.update_linear_schedule, reference utils.py:68-72)."""
    if cfg.use_linear_lr_decay:
        steps_per_update = cfg.ppo_epoch * cfg.num_mini_batch
        sched = optax.linear_schedule(
            init_value=cfg.lr, end_value=0.0,
            transition_steps=cfg.num_updates * steps_per_update)
        lr = sched
    else:
        lr = cfg.lr
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=lr, eps=cfg.eps),
    )


def build_batch(t: Transition, returns: jnp.ndarray, dup_sym: bool, mirror=None) -> Batch:
    """Flatten (T, N, ...) -> (T*N, ...); optionally append the mirrored copy
    (dup-sym augmentation, main.py:181-245)."""
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    obs = flat(t.obs)
    actions = flat(t.action)
    values = flat(t.value)
    rets = flat(returns)
    logp = flat(t.log_prob)
    adv = rets - values
    if dup_sym:
        mirror_obs_fn, mirror_act_fn = mirror
        obs = jnp.concatenate([obs, mirror_obs_fn(obs)])
        actions = jnp.concatenate([actions, mirror_act_fn(actions)])
        values = jnp.concatenate([values, values])
        rets = jnp.concatenate([rets, rets])
        logp = jnp.concatenate([logp, logp])
        adv = jnp.concatenate([adv, adv])
    return Batch(obs=obs, actions=actions, value_preds=values,
                 returns=rets, old_log_probs=logp, advantages=adv)


def jit_update_fn(cfg: TrainConfig, update_fn, train_state):
    """Jit the update for single-device execution, or — with
    ``--num-devices N`` — for SPMD data parallelism over an N-device mesh:
    env batch sharded on the 'dp' axis, params/optimizer replicated,
    XLA-inserted gradient all-reduce over ICI (parallel/dp.py).  Returns
    the jitted fn and the (possibly mesh-placed) train state."""
    if cfg.num_devices <= 1:
        return jax.jit(update_fn), train_state
    from simgan_tpu.parallel.dp import jit_dp, shard_train_state
    from simgan_tpu.parallel.mesh import make_mesh

    assert cfg.num_processes % cfg.num_devices == 0, (
        cfg.num_processes, cfg.num_devices)
    assert len(jax.devices()) >= cfg.num_devices, (
        len(jax.devices()), cfg.num_devices)
    mesh = make_mesh(cfg.num_devices)
    return (jit_dp(update_fn, mesh, train_state),
            shard_train_state(mesh, train_state))


class BehaviorTrainState(NamedTuple):
    params: Any
    opt_state: Any
    carry: RolloutCarry


class RecurrentTrainState(NamedTuple):
    params: Any
    opt_state: Any
    carry: RolloutCarry
    hxs: Any
    gate_mask: Any


def make_recurrent_update_fn(venv, model, tx, cfg: TrainConfig):
    """GRU-policy PPO update (reference --recurrent-policy path)."""
    from simgan_tpu.agents import recurrent

    pcfg = ppo_config(cfg)

    def update(state: RecurrentTrainState, key):
        carry, hxs, last_mask, traj, gate_masks, hxs0 = recurrent.collect_recurrent(
            venv, model, state.params, state.carry, state.hxs, cfg.num_steps)
        next_value, _, _, _ = recurrent.gru_act(
            model, state.params, hxs, carry.obs, last_mask, deterministic=True)
        returns = compute_gae(
            traj.reward, traj.value, next_value, traj.mask, traj.bad_mask,
            pcfg.gamma, pcfg.gae_lambda, pcfg.use_proper_time_limits)
        batch = recurrent.RecurrentBatch(
            obs=traj.obs, actions=traj.action, value_preds=traj.value,
            returns=returns, old_log_probs=traj.log_prob,
            advantages=returns - traj.value,
            masks=gate_masks, hxs0=hxs0)
        params, opt_state, stats = recurrent.recurrent_ppo_update(
            model, state.params, state.opt_state, tx, batch, key, pcfg)
        stats = dict(stats)
        stats["episode_count"] = jnp.sum(traj.ep_done)
        stats["episode_reward_sum"] = jnp.sum(jnp.where(traj.ep_done, traj.ep_return, 0.0))
        ep_rets = jnp.where(traj.ep_done, traj.ep_return, jnp.nan)
        stats["episode_reward_min"] = jnp.nanmin(ep_rets)
        stats["episode_reward_max"] = jnp.nanmax(ep_rets)
        stats["_episodes"] = compact_episodes(traj)
        return RecurrentTrainState(params, opt_state, carry, hxs, last_mask), stats

    return update


def make_update_fn(venv, model, tx, cfg: TrainConfig, mirror=None):
    pcfg = ppo_config(cfg)

    def update(state: BehaviorTrainState, key):
        carry, traj = collect(venv, model, state.params, state.carry, cfg.num_steps)
        next_value, _, _ = model.apply(state.params, carry.obs)
        returns = compute_gae(
            traj.reward, traj.value, next_value, traj.mask, traj.bad_mask,
            pcfg.gamma, pcfg.gae_lambda, pcfg.use_proper_time_limits)
        batch = build_batch(traj, returns, cfg.dup_sym, mirror)
        if cfg.algo == "a2c":
            from simgan_tpu.agents.a2c import A2CConfig, a2c_update

            params, opt_state, stats = a2c_update(
                model, state.params, state.opt_state, tx, batch,
                A2CConfig(value_loss_coef=cfg.value_loss_coef,
                          entropy_coef=cfg.entropy_coef, lr=cfg.lr,
                          eps=cfg.eps, alpha=cfg.alpha,
                          max_grad_norm=cfg.max_grad_norm))
        elif cfg.algo == "acktr":
            from simgan_tpu.agents.a2c import acktr_update

            # opt_state holds the KFACState for acktr
            params, opt_state, stats = acktr_update(
                model, state.params, state.opt_state, batch, key)
        else:
            params, opt_state, stats = ppo_update(
                model, state.params, state.opt_state, tx, batch, key, pcfg,
                mirror if cfg.loss_sym > 0 else None)
        # episode stats for logging
        stats = dict(stats)
        n_done = jnp.sum(traj.ep_done)
        stats["episode_count"] = n_done
        stats["episode_reward_sum"] = jnp.sum(jnp.where(traj.ep_done, traj.ep_return, 0.0))
        ep_rets = jnp.where(traj.ep_done, traj.ep_return, jnp.nan)
        stats["episode_reward_min"] = jnp.nanmin(ep_rets)
        stats["episode_reward_max"] = jnp.nanmax(ep_rets)
        stats["_episodes"] = compact_episodes(traj)
        return BehaviorTrainState(params, opt_state, carry), stats

    return update


def train(cfg: TrainConfig, env_kwargs: dict | None = None, env_extra: dict | None = None):
    """Full training run; returns (model, params).  env_extra carries policy
    pytrees for combined envs (behavior_model/..., see envs.make)."""
    env_kwargs = dict(env_kwargs or {})
    env_kwargs.update(env_extra or {})
    assert cfg.algo in ("ppo", "a2c", "acktr"), cfg.algo
    assert not cfg.gail, "use train_simgan for gail-dyn"

    save_path = os.path.join(cfg.save_dir, cfg.algo)
    logger = setup_logging(save_path)

    env = env_registry.make(cfg.env_name, **env_kwargs)
    venv = VectorEnv(AutoResetEnv(env), cfg.num_processes)

    mirror = None
    if cfg.env_name.startswith("Laikago") and (cfg.loss_sym > 0 or cfg.dup_sym):
        from simgan_tpu.envs.laikago_mirror import mirror_action, mirror_obs
        mirror = (mirror_obs, mirror_action)

    write_source_snapshot(save_path, env)

    key = jax.random.PRNGKey(cfg.seed)
    key, k_init, k_env = jax.random.split(key, 3)

    if cfg.recurrent_policy:
        from simgan_tpu.agents import recurrent

        assert not cfg.warm_start, "warm start not supported with recurrent policy"
        assert cfg.algo == "ppo", "recurrent policy supports ppo only"
        model, params = recurrent.init_gru_policy(
            k_init, env.act_dim, env.obs_dim, hidden=cfg.hidden_size)
        tx = make_lr_optimizer(cfg)
        opt_state = tx.init(params)
        states, obs = venv.reset(k_env)
        carry = RolloutCarry(states, obs, key,
                             RewardNorm.create(cfg.num_processes, cfg.gamma))
        assert cfg.num_devices <= 1, "recurrent policy is single-device only"
        train_state = RecurrentTrainState(
            params, opt_state, carry,
            recurrent.zero_hidden(cfg.num_processes, cfg.hidden_size),
            jnp.ones(cfg.num_processes))
        update_fn = jax.jit(make_recurrent_update_fn(venv, model, tx, cfg))
        return _train_loop(cfg, logger, model, update_fn, train_state, key, save_path)

    model = MLPPolicy(action_dim=env.act_dim, hidden=cfg.hidden_size)
    if cfg.warm_start:
        policy_dir, env_name = os.path.split(cfg.warm_start)
        env_name = env_name.removesuffix(".npz").removesuffix(".pt")
        model, params = checkpoints.load_policy(policy_dir, env_name)
        params = networks.reset_critic(model, params, k_init, env.obs_dim)
        if cfg.warm_start_logstd is not None:
            params = networks.reset_logstd(model, params, cfg.warm_start_logstd)
    else:
        params = model.init(k_init, jnp.zeros((1, env.obs_dim)))

    if cfg.algo == "acktr":
        from simgan_tpu.agents.kfac import KFACState

        tx = None
        opt_state = KFACState.create(params, env.obs_dim)
    elif cfg.algo == "a2c":
        from simgan_tpu.agents.a2c import A2CConfig, make_optimizer as make_a2c_opt

        tx = make_a2c_opt(A2CConfig(lr=cfg.lr, eps=cfg.eps, alpha=cfg.alpha,
                                    max_grad_norm=cfg.max_grad_norm))
        opt_state = tx.init(params)
    else:
        tx = make_lr_optimizer(cfg)
        opt_state = tx.init(params)

    states, obs = venv.reset(k_env)
    carry = RolloutCarry(states, obs, key,
                         RewardNorm.create(cfg.num_processes, cfg.gamma))
    train_state = BehaviorTrainState(params, opt_state, carry)

    update_fn, train_state = jit_update_fn(
        cfg, make_update_fn(venv, model, tx, cfg, mirror), train_state)
    return _train_loop(cfg, logger, model, update_fn, train_state, key, save_path)


_EPISODE_CAP = 4096  # max finished episodes fetched per update


def compact_episodes(traj) -> tuple:
    """Device-side compaction of the rollout's finished episodes so the host
    fetches O(episodes), not O(T*N) (the remote-TPU transfer matters)."""
    done = traj.ep_done.reshape(-1)
    k = min(done.shape[0], _EPISODE_CAP)
    idx = jnp.nonzero(done, size=k, fill_value=-1)[0]
    safe = jnp.maximum(idx, 0)
    return (idx >= 0, traj.ep_return.reshape(-1)[safe],
            traj.ep_length.reshape(-1)[safe])


def emit_monitor(monitor, stats) -> None:
    """Write the update's finished episodes to monitor.csv (the on-device
    analog of bench.Monitor's per-episode rows, baselines/bench/monitor.py:
    82-101).  Pops the compacted episode arrays out of the stats dict."""
    ep = stats.pop("_episodes", None)
    if monitor is None or ep is None:
        return
    valid, ret, length = jax.device_get(ep)
    valid = np.asarray(valid, dtype=bool)
    monitor.record_batch(np.asarray(ret)[valid], np.asarray(length)[valid])


def make_trace_ctx(j: int):
    """SIMGAN_TRACE_DIR=<dir> captures a jax-profiler trace of update 1
    (utils/profiling.trace; the aux tracing subsystem)."""
    trace_dir = os.environ.get("SIMGAN_TRACE_DIR")
    if trace_dir and j == 1:
        from simgan_tpu.utils import profiling
        return profiling.trace(trace_dir)
    import contextlib
    return contextlib.nullcontext()


def _train_loop(cfg, logger, model, update_fn, train_state, key, save_path):
    from simgan_tpu.utils.monitor import MonitorWriter
    from simgan_tpu.utils.profiling import StepTimer

    monitor = MonitorWriter(save_path, rank=0, env_id=cfg.env_name)
    # SIMGAN_KV_LOG=csv,json opts into baselines-style progress files
    # (reference surface: baselines/logger.py; see utils/kv_logger.py)
    kv = kv_logger.maybe_configure(save_path)
    timer = StepTimer()
    start = time.time()
    for j in range(cfg.num_updates):
        key, k_up = jax.random.split(key)
        with make_trace_ctx(j):
            train_state, stats = update_fn(train_state, k_up)
        stats = dict(stats)
        emit_monitor(monitor, stats)
        timer.tick()

        if (j % cfg.save_interval == 0 or j == cfg.num_updates - 1) and cfg.save_dir:
            checkpoints.save_policy(save_path, cfg.env_name, model, train_state.params)
            checkpoints.save_policy(save_path, cfg.env_name, model, train_state.params, iter_num=j)

        if j % cfg.log_interval == 0:
            stats = jax.device_get(stats)
            ep_count = float(stats["episode_count"])
            ep_sum = float(stats["episode_reward_sum"])
            mean_r = ep_sum / max(ep_count, 1.0)
            total_steps = (j + 1) * cfg.num_processes * cfg.num_steps
            fps = int(total_steps / (time.time() - start))
            fps_now = timer.rate(cfg.num_processes * cfg.num_steps)
            if kv is not None:
                kv.logkvs({"updates": j, "total_timesteps": total_steps,
                           "fps": fps, "episodes": int(ep_count),
                           "mean_reward": mean_r,
                           "dist_entropy": float(stats["dist_entropy"]),
                           "value_loss": float(stats["value_loss"]),
                           "action_loss": float(stats["action_loss"])})
                kv.dumpkvs()
            logger.info(
                "Updates %d, num timesteps %d, FPS %d (now %d), episodes %d, "
                "mean reward %.1f, min/max %.1f/%.1f, dist_en %.3f, l_pi %.4f, l_vf %.4f",
                j, total_steps, fps, int(fps_now or 0), int(ep_count), mean_r,
                float(stats["episode_reward_min"]), float(stats["episode_reward_max"]),
                float(stats["dist_entropy"]), float(stats["action_loss"]),
                float(stats["value_loss"]),
            )
    monitor.close()
    return model, train_state.params


def main(argv=None):
    from simgan_tpu.train.config import parse_args

    cfg, extra = parse_args(argv)
    if cfg.gail:
        # both GAIL flavors (plain state-action and gail-dyn) live in
        # train_simgan; the reference exposes --gail* on main.py's flag
        # surface too (arguments.py:139-163)
        from simgan_tpu.train import train_simgan
        return train_simgan.main(argv)
    env_extra = {}
    if cfg.env_name.endswith("CombinedEnv-v1"):
        env_extra = load_combined_policies(cfg, extra)
    train(cfg, extra, env_extra)


def load_combined_policies(cfg: TrainConfig, extra: dict) -> dict:
    """Resolve behavior_dir / dyn_dir env kwargs into policy pytrees
    (reference: env __init__ loads checkpoints itself,
    hopper_env_combined_policy.py:84-140)."""
    out: dict = {}
    train_dyn = bool(extra.get("train_dyn", 1))
    if train_dyn:
        bdir = extra.get("behavior_dir")
        benv = extra.get("behavior_env_name",
                         "HopperURDFEnv-v3" if "Hopper" in cfg.env_name else "LaikagoBulletEnv-v4")
        biter = extra.get("behavior_iter")
        model, params = checkpoints.load_policy(bdir, benv, biter)
        out["behavior_model"] = model
        out["behavior_params"] = params
    else:
        ddir = extra.get("dyn_dir")
        denv = extra.get("dyn_env_name", cfg.env_name)
        iters = ([80, 100, 120, 140, 160] if "Hopper" in cfg.env_name
                 else [950, 850, 750, 650, 550])
        model, stacked = checkpoints.load_ensemble(ddir, denv, iters)
        out["dyn_model"] = model
        out["dyn_ensemble_params"] = stacked
    return out


if __name__ == "__main__":
    main()
