"""Identification-quality diagnostic: roll a policy inside the learned
hybrid simulator (combined env, train_dyn=0, 5-member dyn ensemble) and
compare its return there to its return in the TRUE target env.

Rationale: the refined policies reach ~5k in the hybrid sim but transfer
at 0.7-1.7k, which confounds two failure modes:
  (a) identification failure — the hybrid sim is a different domain even
      on the data distribution it was trained on;
  (b) refinement exploitation — the hybrid sim is faithful near the
      behavior-policy distribution, but PPO walks off it into regions the
      discriminator never saw.
The split statistic is the BEHAVIOR policy's hybrid-vs-target gap: the
behavior policy generated the expert data, so a faithful hybrid sim must
reproduce its target return (case b); a large gap is case (a).

The reference has no such tool (it only final-tests, collect_tarsim_traj
.py:206-259); this is framework-native diagnostics.

Usage:
    python scripts/hybrid_fidelity_eval.py laika_heavy --tag r3 \
        [--policy refined] [--trajs 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from simgan_tpu.train import checkpoints
from simgan_tpu.train.collect import CollectConfig, collect
from simgan_tpu.train.config import TrainConfig
from simgan_tpu.train.experiments import EXPERIMENTS, REFINE_ENV_KWARGS

from run_experiment import BEHAVIOR, RUNS, scaled_ensemble_iters, _robot


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("experiment", choices=sorted(EXPERIMENTS))
    p.add_argument("--tag", default="", help="gdyn/refined dir tag")
    p.add_argument("--policy", default="behavior",
                   choices=["behavior", "refined"])
    p.add_argument("--trajs", type=int, default=100)
    p.add_argument("--solver", default="pgs")
    p.add_argument("--out", default="", help="append result into this json")
    args = p.parse_args(argv)

    exp = EXPERIMENTS[args.experiment]
    robot = _robot(exp["common"]["env_name"])
    suffix = f"_{args.tag}" if args.tag else ""
    gdyn_dir = os.path.join(RUNS, f"gdyn_{args.experiment}{suffix}", "ppo")
    id_cfg = TrainConfig(**{**exp["common"], "num_processes": 128,
                            "num_steps": 125})
    save_interval = 10 if robot == "Hopper" else 25
    iters = scaled_ensemble_iters(id_cfg, save_interval)
    model, stacked = checkpoints.load_ensemble(
        gdyn_dir, id_cfg.env_name, iters)
    env_extra = {"dyn_model": model, "dyn_ensemble_params": stacked}

    if args.policy == "behavior":
        load_dir = BEHAVIOR[exp["behavior_env"]]
        src_env = exp["behavior_env"]  # checkpoint filename
    else:
        load_dir = os.path.join(RUNS, f"{args.experiment}_refined{suffix}",
                                "ppo")
        src_env = id_cfg.env_name  # refine saves under the combined env name
    res = collect(
        CollectConfig(env_name=id_cfg.env_name,
                      src_env_name=src_env,
                      load_dir=load_dir, num_trajs=args.trajs,
                      non_det=False, seed=11, max_steps=500),
        dict(REFINE_ENV_KWARGS, solver=args.solver), env_extra)

    base = os.path.join(RUNS, f"{args.experiment}{suffix}_result.json")
    target = {}
    if os.path.exists(base):
        target = json.load(open(base))
    key = "original" if args.policy == "behavior" else "refined"
    tmean = target.get(f"{key}_mean")
    print(f"== {args.experiment}{suffix} {args.policy} policy: "
          f"hybrid-sim mean {res['mean_reward']:.1f} / median "
          f"{res['median_reward']:.1f} vs target {tmean}", flush=True)
    if args.out:
        out = json.load(open(args.out)) if os.path.exists(args.out) else {}
        out[f"{args.experiment}{suffix}_{args.policy}"] = dict(
            hybrid_mean=res["mean_reward"], hybrid_median=res["median_reward"],
            target_mean=tmean)
        json.dump(out, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
