"""Profile one SimGAN identification update across rollout shapes/solvers.

The round-2 laikago identify ran 16 lanes x 1000 serial steps per update:
1.6k env steps/s wall vs 157k in bench -- latency-bound (VERDICT r2 weak #2,
BASELINE.md wall-clock-per-identification-iteration metric).  This script
times the REAL jitted update_fn (rollout + D + PPO, train_simgan.make_update_fn)
on the live TPU for (lanes, steps) shapes with lanes*steps = 16000 held
constant (same PPO batch, same update count, same total env steps) and for
the 'pgs' vs 'staged' contact solvers, so the experiment driver can pick the
fastest identification configuration.

Usage:  python scripts/profile_identify.py [hopper|laika] [pkl_path]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu import envs as env_registry
from simgan_tpu.agents import gail
from simgan_tpu.agents.gail import GailConfig
from simgan_tpu.agents.networks import SplitPolicy
from simgan_tpu.agents.rollout import RolloutCarry, VectorEnv
from simgan_tpu.agents.running_stats import RunningMeanStd
from simgan_tpu.envs.base import AutoResetEnv
from simgan_tpu.train import checkpoints, train_simgan
from simgan_tpu.train.config import TrainConfig
from simgan_tpu.train.experiments import EXPERIMENTS, ID_ENV_KWARGS
from simgan_tpu.train.train_behavior import make_lr_optimizer
from simgan_tpu.utils import pickle_io

RUNS = os.path.join(os.path.dirname(__file__), "..", "runs")


def build_update(robot: str, lanes: int, steps: int, solver: str,
                 expert_feats, gail_tar_length):
    exp = EXPERIMENTS["laika_deform" if robot == "laika" else "hopper_deform"]
    cfg = TrainConfig(**{**exp["common"],
                         "num_processes": lanes, "num_steps": steps,
                         "gail_traj_path": "unused", "save_dir": "/tmp/prof_id",
                         "seed": 7})
    behavior_dir = os.path.join(
        RUNS, "laika_behavior" if robot == "laika" else "hopper_behavior_v2", "ppo")
    model_b, params_b = checkpoints.load_policy(behavior_dir, exp["behavior_env"])
    env_kwargs = dict(ID_ENV_KWARGS)
    env_kwargs["solver"] = solver
    env = env_registry.make(cfg.env_name, behavior_model=model_b,
                            behavior_params=params_b, **env_kwargs)
    venv = VectorEnv(AutoResetEnv(env), lanes)

    key = jax.random.PRNGKey(0)
    key, k_pi, k_d, k_env = jax.random.split(key, 4)
    model = SplitPolicy(num_feet=cfg.num_feet, hidden=cfg.hidden_size)
    params = model.init(k_pi, jnp.zeros((1, env.obs_dim)))
    info_length = expert_feats.shape[1]
    disc_model, disc_tx, disc_state = gail.create(
        k_d, info_length, lanes,
        GailConfig(hidden=cfg.gail_dis_hdim, batch_size=cfg.gail_batch_size,
                   epochs=cfg.gail_epoch))
    tx = make_lr_optimizer(cfg)
    opt_state = tx.init(params)
    states, obs = venv.reset(k_env)
    carry = RolloutCarry(states, obs, key, None)
    state = train_simgan.SimGanState(params, opt_state, disc_state,
                                     RunningMeanStd.create(), carry)
    update_fn = jax.jit(train_simgan.make_update_fn(
        venv, model, tx, disc_model, disc_tx, expert_feats, gail_tar_length, cfg))
    return update_fn, state


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else "laika"
    pkl = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        RUNS, f"{'laika' if robot == 'laika' else 'hopper'}_deform_n200.pkl")

    rng = np.random.RandomState(7)
    expert_sas = pickle_io.load_sas_wpast(pkl, downsample_freq=1,
                                          load_num_trajs=200, rng=rng)
    expert_feats = jnp.asarray(
        pickle_io.select_and_merge_sas(expert_sas, (0,), (0,)))
    gail_tar_length = expert_feats.shape[0] / 200.0
    print(f"expert feats {expert_feats.shape}", flush=True)

    shapes = [(16, 1000), (64, 250), (128, 125), (160, 100)]
    solvers = ["pgs", "staged"]
    # PROF_ID_SHAPES="128x125,64x250" / PROF_ID_SOLVERS="pgs,pgs_pallas"
    if os.environ.get("PROF_ID_SHAPES"):
        shapes = [tuple(int(v) for v in s.split("x"))
                  for s in os.environ["PROF_ID_SHAPES"].split(",")]
    if os.environ.get("PROF_ID_SOLVERS"):
        solvers = os.environ["PROF_ID_SOLVERS"].split(",")
    results = []
    for solver in solvers:
        for lanes, steps in shapes:
            t0 = time.time()
            update_fn, state = build_update(robot, lanes, steps, solver,
                                            expert_feats, gail_tar_length)
            key = jax.random.PRNGKey(1)
            k1, k2, k3 = jax.random.split(key, 3)
            state, s = update_fn(state, k1)
            jax.block_until_ready(s["gail_loss"])
            t_compile = time.time() - t0
            # double warmup: reset-built vs scan-output pytrees differ in
            # weak types (memory: tpu-bench-double-warmup)
            state, s = update_fn(state, k2)
            jax.block_until_ready(s["gail_loss"])
            n_timed = 3
            t1 = time.time()
            for i in range(n_timed):
                k3, k = jax.random.split(k3)
                state, s = update_fn(state, k)
            jax.block_until_ready(s["gail_loss"])
            dt = (time.time() - t1) / n_timed
            sps = lanes * steps / dt
            results.append((solver, lanes, steps, dt, sps))
            print(f"{solver:7s} L={lanes:4d} S={steps:5d}: {dt:7.2f}s/update "
                  f"({sps:9.0f} steps/s)  [compile+warm {t_compile:.0f}s]",
                  flush=True)
    print("\n== summary ==", flush=True)
    for solver, lanes, steps, dt, sps in sorted(results, key=lambda r: r[3]):
        print(f"{solver:7s} L={lanes:4d} S={steps:5d}: {dt:7.2f}s/update {sps:9.0f} steps/s",
              flush=True)


if __name__ == "__main__":
    main()
