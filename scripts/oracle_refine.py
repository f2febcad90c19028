"""Oracle-refinement ceiling: refine the behavior policy directly in the
TRUE target env (a perfect simulator), same warm start / budget / seeds as
the SimGAN refinement stage, then final-test in the same target.

This bounds what ANY identification method could achieve at the reference
refinement budget: if the oracle also plateaus below the 4000 success bar,
the residual gap of the hybrid-sim runs is a property of the task (policy
capability / finite-mattress time budget), not of identification fidelity.
The reference has no such tool; SimGAN's premise is that the target domain
is NOT available for training — this is a diagnostic, not a pipeline stage.

Usage:
    python scripts/oracle_refine.py laika_deform [--tag oracle]
        [--refine-steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from simgan_tpu.train.collect import CollectConfig, collect
from simgan_tpu.train.config import TrainConfig
from simgan_tpu.train.experiments import EXPERIMENTS

from run_experiment import BEHAVIOR, RUNS


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("experiment", choices=sorted(EXPERIMENTS))
    p.add_argument("--tag", default="oracle")
    p.add_argument("--refine-steps", type=int, default=None)
    p.add_argument("--lanes", type=int, default=128)
    p.add_argument("--steps", type=int, default=125)
    p.add_argument("--seed-offset", type=int, default=0,
                   help="added to the refine seed, matching "
                        "run_experiment.py --seed-offset so the oracle can "
                        "be paired with each seed of a hybrid-sim study")
    p.add_argument("--override", default="",
                   help="comma-separated key=value TrainConfig overrides for "
                        "the oracle refine (e.g. entropy_coef=0.003 to test "
                        "the entropy-floor lever at the ceiling)")
    args = p.parse_args(argv)

    overrides = {}
    for kv in (args.override.split(",") if args.override else []):
        k, v = kv.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                pass
        overrides[k] = v

    exp = EXPERIMENTS[args.experiment]
    behavior_dir = BEHAVIOR[exp["behavior_env"]]
    target_kwargs = dict(exp["collect_env_kwargs"])

    # same hyperparameters as the SimGAN refine stage, but env = TRUE target
    refine_cfg = TrainConfig(**{
        **exp["refine"],
        "env_name": exp["behavior_env"],
        "num_processes": args.lanes,
        "num_steps": args.steps,
        "save_dir": os.path.join(RUNS, f"{args.experiment}_refined_{args.tag}"),
        "warm_start": os.path.join(behavior_dir, exp["behavior_env"]),
        "log_interval": 25,
        "save_interval": 25,
        "seed": exp["seed"] + 7 + args.seed_offset,
        **({"num_env_steps": args.refine_steps} if args.refine_steps else {}),
        **overrides,
    })

    from simgan_tpu.train import train_behavior
    t0 = time.time()
    # the oracle trains with the same act/obs-noise regime the combined
    # refine env uses (REFINE_ENV_KWARGS) ON TOP of the target flags
    train_kwargs = dict(target_kwargs, act_noise=1, obs_noise=1)
    train_behavior.train(refine_cfg, train_kwargs)
    wall = time.time() - t0

    res = collect(CollectConfig(
        env_name=exp["behavior_env"],
        load_dir=os.path.join(refine_cfg.save_dir, "ppo"),
        num_trajs=100, non_det=False, seed=11, max_steps=500),
        target_kwargs)
    out = dict(refine_wall_s=round(wall, 1),
               oracle_mean=res["mean_reward"],
               oracle_median=res["median_reward"],
               oracle_success=res["success"],
               refine_steps=refine_cfg.num_env_steps,
               **({"overrides": overrides} if overrides else {}))
    path = os.path.join(RUNS, f"{args.experiment}_{args.tag}_result.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"== oracle refine {args.experiment}: {out}", flush=True)


if __name__ == "__main__":
    main()
