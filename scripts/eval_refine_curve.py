"""Transfer-vs-refine-budget curve: evaluate intermediate refine checkpoints.

The refine stage checkpoints every `save_interval` updates, so ONE long
refinement run contains the whole budget ablation: evaluating the iter-250
checkpoint of a 12M-step laikago run reproduces what a 4M-budget run would
have shipped (same seed, same LR schedule caveat noted in the output).
Runs the experiment driver's exact deterministic final-test protocol
(100 trajs, seed 11, max 500 steps) per checkpoint.

Usage: python scripts/eval_refine_curve.py laika_deform r3x 250,500,749
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from simgan_tpu.train.collect import CollectConfig, collect
from simgan_tpu.train.experiments import EXPERIMENTS

RUNS = os.path.join(os.path.dirname(__file__), "..", "runs")


def main():
    name, tag = sys.argv[1], sys.argv[2]
    iters = [int(x) for x in sys.argv[3].split(",")]
    exp = EXPERIMENTS[name]
    refine_dir = os.path.join(RUNS, f"{name}_refined_{tag}", "ppo")
    rows = {}
    for it in iters:
        t0 = time.time()
        res = collect(CollectConfig(
            env_name=exp["behavior_env"],
            src_env_name=exp["common"]["env_name"],
            load_dir=refine_dir, iter=it,
            num_trajs=100, non_det=False, seed=11, max_steps=500),
            dict(exp["collect_env_kwargs"]))
        rows[it] = dict(mean=res["mean_reward"], median=res["median_reward"],
                        success=res["success"], wall_s=round(time.time() - t0, 1))
        print(f"iter {it}: {rows[it]}", flush=True)
    out = os.path.join(RUNS, f"{name}_{tag}_refine_curve.json")
    json.dump(rows, open(out, "w"), indent=1)
    print(f"note: one long run's LR schedule decays over the FULL budget, so "
          f"early iters saw higher LR than a short-budget run would at the "
          f"same step count.  written {out}", flush=True)


if __name__ == "__main__":
    main()
