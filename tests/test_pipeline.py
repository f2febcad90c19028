"""End-to-end pipeline tests (slow: full XLA compiles of the trainers).

Run with SIMGAN_RUN_SLOW=1 to include; skipped by default so the unit suite
stays fast.  The driver-facing smoke path (bench.py, __graft_entry__) covers
compile health separately.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

slow = pytest.mark.skipif(
    not os.environ.get("SIMGAN_RUN_SLOW"), reason="set SIMGAN_RUN_SLOW=1")


@slow
def test_full_simgan_pipeline(tmp_path):
    """Stage 0 (behavior PPO) -> 0.5 (collect to reference pickle format) ->
    1 (GAIL-dyn identification) -> 2 (refinement with dyn ensemble)."""
    from simgan_tpu.train import checkpoints, collect as collect_mod, train_behavior, train_simgan
    from simgan_tpu.train.collect import CollectConfig
    from simgan_tpu.train.config import TrainConfig

    d = str(tmp_path)
    cfg = TrainConfig(env_name="HopperURDFEnv-v3", num_processes=2, num_steps=32,
                      num_env_steps=32 * 2 * 2, ppo_epoch=2, num_mini_batch=2,
                      save_dir=f"{d}/behavior", log_interval=10, save_interval=1, seed=0)
    model, params = train_behavior.train(cfg)

    ccfg = CollectConfig(env_name="HopperURDFEnv-v3", load_dir=f"{d}/behavior/ppo",
                         save_traj=True, num_trajs=4, save_path=f"{d}/expert.pkl",
                         max_steps=40, non_det=True, seed=0)
    res = collect_mod.collect(ccfg, {"deform_floor_env": 1})
    assert np.isfinite(res["mean_reward"])

    gcfg = TrainConfig(env_name="HopperCombinedEnv-v1", num_processes=2, num_steps=32,
                       num_env_steps=32 * 2 * 2, ppo_epoch=2, num_mini_batch=2,
                       gail_traj_path=f"{d}/expert.pkl", gail_traj_num=4,
                       gail_downsample_frequency=1, gail_epoch=1, gail_batch_size=16,
                       hidden_size=32, gail_dis_hdim=32, use_split_pi=True,
                       num_feet=1, save_dir=f"{d}/gdyn", log_interval=1,
                       save_interval=1, seed=0)
    extra = {"train_dyn": 1, "act_noise": 1, "obs_noise": 1, "behavior_logstd": -1.3}
    train_simgan.train(gcfg, extra, {"behavior_model": model, "behavior_params": params})

    dmodel, stacked = checkpoints.load_ensemble(f"{d}/gdyn/ppo", "HopperCombinedEnv-v1", [0, 1])
    rcfg = TrainConfig(env_name="HopperCombinedEnv-v1", num_processes=2, num_steps=32,
                       num_env_steps=32 * 2 * 2, ppo_epoch=2, num_mini_batch=2,
                       lr=1.5e-4, clip_param=0.1, use_linear_lr_decay=True,
                       warm_start=f"{d}/behavior/ppo/HopperURDFEnv-v3",
                       warm_start_logstd=-1.3, save_dir=f"{d}/refine",
                       log_interval=10, save_interval=1, seed=0)
    train_behavior.train(rcfg, {"train_dyn": 0, "act_noise": 1, "obs_noise": 1},
                         {"dyn_model": dmodel, "dyn_ensemble_params": stacked})


@slow
def test_plain_gail_behavior(tmp_path):
    """Plain state-action GAIL (reference algo/gail.py:91-152): --gail
    without --gail-dyn trains a motor policy in the source env against
    expert (s, a) rows, with D-reward overwrite."""
    import pickle

    from simgan_tpu.train import train_simgan
    from simgan_tpu.train.config import TrainConfig

    # synthesize a tiny expert pickle in the 21-slot wpast format
    rng = np.random.RandomState(0)
    trajs = {i: [[list(rng.randn(11)) for _ in range(10)]
                 + [list(rng.randn(3)) for _ in range(10)]
                 + [list(rng.randn(11))] for _ in range(20)] for i in range(4)}
    with open(tmp_path / "expert.pkl", "wb") as f:
        pickle.dump(trajs, f)

    cfg = TrainConfig(env_name="HopperURDFEnv-v3", num_processes=2, num_steps=32,
                      num_env_steps=32 * 2 * 2, ppo_epoch=2, num_mini_batch=2,
                      gail=True, gail_dyn=False,
                      gail_traj_path=str(tmp_path / "expert.pkl"),
                      gail_traj_num=4, gail_downsample_frequency=1,
                      gail_epoch=1, gail_batch_size=16, gail_dis_hdim=32,
                      hidden_size=32, save_dir=f"{tmp_path}/plain_gail",
                      log_interval=1, save_interval=1, seed=0)
    model, params, d_model, d_params = train_simgan.train(cfg)
    # D input dim = s + a, policy is a plain MLPPolicy on the source env
    from simgan_tpu.agents.networks import MLPPolicy
    assert isinstance(model, MLPPolicy) and model.action_dim == 3
    logits = d_model.apply(d_params, np.zeros((2, 14), np.float32))
    assert np.all(np.isfinite(np.asarray(logits)))
    # monitor.csv written by the trainer (bench.Monitor parity)
    from simgan_tpu.utils.monitor import load_monitor_csvs
    data = load_monitor_csvs(f"{tmp_path}/plain_gail/ppo")
    assert data["r"].shape == data["l"].shape


@slow
def test_simgan_dyn_stiffness_pipeline(tmp_path):
    """dyn_stiffness extension end-to-end: identification trains a
    contact_dims=5 SplitPolicy (act_dim 8), the checkpoint round-trips its
    contact_dims, and the refinement env consumes the wider ensemble."""
    from simgan_tpu.train import checkpoints, train_behavior, train_simgan
    from simgan_tpu.train.config import TrainConfig

    d = str(tmp_path)
    cfg = TrainConfig(env_name="HopperURDFEnv-v3", num_processes=2, num_steps=32,
                      num_env_steps=32 * 2 * 2, ppo_epoch=2, num_mini_batch=2,
                      save_dir=f"{d}/behavior", log_interval=10, save_interval=1, seed=0)
    model, params = train_behavior.train(cfg)

    from simgan_tpu.train.collect import CollectConfig
    from simgan_tpu.train import collect as collect_mod
    collect_mod.collect(CollectConfig(
        env_name="HopperURDFEnv-v3", load_dir=f"{d}/behavior/ppo",
        save_traj=True, num_trajs=4, save_path=f"{d}/expert.pkl",
        max_steps=40, non_det=True, seed=0), {"deform_floor_env": 1})

    gcfg = TrainConfig(env_name="HopperCombinedEnv-v1", num_processes=2, num_steps=32,
                       num_env_steps=32 * 2 * 2, ppo_epoch=2, num_mini_batch=2,
                       gail_traj_path=f"{d}/expert.pkl", gail_traj_num=4,
                       gail_downsample_frequency=1, gail_epoch=1, gail_batch_size=16,
                       hidden_size=32, gail_dis_hdim=32, use_split_pi=True,
                       num_feet=1, save_dir=f"{d}/gdyn", log_interval=1,
                       save_interval=1, seed=0)
    extra = {"train_dyn": 1, "act_noise": 1, "obs_noise": 1,
             "behavior_logstd": -1.3, "dyn_stiffness": 1}
    dyn_model, _, _, _ = train_simgan.train(
        gcfg, extra, {"behavior_model": model, "behavior_params": params})
    assert dyn_model.contact_dims == 5 and dyn_model.action_dim == 8

    dmodel, stacked = checkpoints.load_ensemble(f"{d}/gdyn/ppo", "HopperCombinedEnv-v1", [0, 1])
    assert dmodel.contact_dims == 5    # round-trips through the npz meta
    rcfg = TrainConfig(env_name="HopperCombinedEnv-v1", num_processes=2, num_steps=32,
                       num_env_steps=32 * 2 * 2, ppo_epoch=2, num_mini_batch=2,
                       lr=1.5e-4, clip_param=0.1, use_linear_lr_decay=True,
                       warm_start=f"{d}/behavior/ppo/HopperURDFEnv-v3",
                       warm_start_logstd=-1.3, save_dir=f"{d}/refine",
                       log_interval=10, save_interval=1, seed=0)
    train_behavior.train(rcfg, {"train_dyn": 0, "act_noise": 1, "obs_noise": 1,
                                "dyn_stiffness": 1},
                         {"dyn_model": dmodel, "dyn_ensemble_params": stacked})


@slow
def test_laikago_combined_steps():
    from simgan_tpu.agents.networks import MLPPolicy
    from simgan_tpu.envs.laikago_combined import (LaikagoCombinedConfig,
                                                  LaikagoCombinedEnv)

    m = MLPPolicy(action_dim=12, hidden=32)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 111)))
    env = LaikagoCombinedEnv(LaikagoCombinedConfig(train_dyn=True),
                             behavior_model=m, behavior_params=p)
    assert env.obs_dim == 64 and env.act_dim == 28
    st, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (64,)
    s = jax.jit(env.step)(st, jnp.zeros(28))
    assert s.obs.shape == (64,)
    assert s.window.select_and_merge().shape == (86,)
    assert bool(jnp.isfinite(s.reward))


@slow
def test_dryrun_multichip_8():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)
