"""End-to-end SimGAN experiment pipeline driver (one TPU chip).

Runs the reference's full Algorithm-1 loop for one of the six paper
experiments (reference train_{hopper,laika}_{deform,heavy,power}.sh +
README.md:37-63) against the behavior policies already trained under
``runs/``:

  collect  : roll the behavior policy in the TARGET env, pickle 200
             expert trajectories (collect_tarsim_traj.py --save-traj 1)
  original : deterministic final-test of the UNREFINED behavior policy in
             the target env (the "original" row of the results table)
  identify : stage-1 hybrid-simulator identification (main_gail_dyn_ppo)
  refine   : stage-2 policy refinement inside the learned hybrid sim
  test     : deterministic final-test of the refined policy in the target

Budgets are the reference's (2M/2M hopper, 8M/4M laikago) with 16 vmapped
env lanes per update instead of 8 worker processes; the refinement
ensemble iterations are rescaled to the same fractional positions of the
run (hopper 80..160 of 250 updates, laika 550..950 of 1000 —
hopper_env_combined_policy.py:113-140, laikago_env_combined_policy.py:
126-153).

Usage:
    python scripts/run_experiment.py laika_deform
    python scripts/run_experiment.py laika_heavy --stages identify,refine,test \
        --tag retune --s-idx 0,4 --a-idx 0
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from simgan_tpu.train import checkpoints
from simgan_tpu.train.collect import CollectConfig, collect
from simgan_tpu.train.config import TrainConfig
from simgan_tpu.train.experiments import (EXPERIMENTS, ID_ENV_KWARGS,
                                          REFINE_ENV_KWARGS)

RUNS = os.path.join(os.path.dirname(__file__), "..", "runs")

BEHAVIOR = {
    "HopperURDFEnv-v3": os.path.join(RUNS, "hopper_behavior_v2", "ppo"),
    "LaikagoBulletEnv-v4": os.path.join(RUNS, "laika_behavior", "ppo"),
}

# reference update counts the ensemble iteration indices are anchored to
REF_UPDATES = {"Hopper": 250, "Laikago": 1000}
REF_ENSEMBLE = {"Hopper": [80, 100, 120, 140, 160],
                "Laikago": [550, 650, 750, 850, 950]}


def _robot(env_name: str) -> str:
    return "Hopper" if "Hopper" in env_name else "Laikago"


def scaled_ensemble_iters(cfg: TrainConfig, save_interval: int) -> list[int]:
    robot = _robot(cfg.env_name)
    scale = cfg.num_updates / REF_UPDATES[robot]
    iters = []
    for i in REF_ENSEMBLE[robot]:
        j = int(round(i * scale / save_interval)) * save_interval
        iters.append(min(j, (cfg.num_updates - 1) // save_interval * save_interval))
    assert len(set(iters)) == len(iters), f"ensemble iters collide: {iters}"
    return iters


def run(name: str, stages: list[str], tag: str = "", s_idx=(0,), a_idx=(0,),
        overrides_id: dict | None = None, overrides_refine: dict | None = None,
        id_env_extra_kwargs: dict | None = None, collect_det: bool = False,
        lanes: int = 128, steps: int = 125, solver: str = "pgs",
        traj_suffix: str = "", seed_offset: int = 0,
        gdyn_tag: str = "", refine_steps: int | None = None,
        pessimism: float = 0.0, cross_ensemble: str = "",
        dyn_stiffness: bool = False, d_ensemble: int = 1,
        battery_prior: bool = False,
        target_overrides: dict | None = None):
    """lanes/steps/solver: rollout shape and contact solver for the identify
    and refine stages.  lanes*steps is held at the reference's 16k
    steps-per-update (same PPO batch, same update count); the round-2 shape
    (16, 1000) was latency-bound -- scripts/profile_identify.py measured
    8.7x per-update speedup for pgs@(128,125) on laikago (9.61s -> 1.10s)
    with byte-identical physics.  The 'staged' solver is 5.4x faster still
    (0.20s/update) and — on the TRUE pi_dyn damping range exp([1,3])*2 =
    [5.44, 40.2] (the reference code's range; its "20~2000" comment is
    wrong) — matches pgs at equal sweep count (staged@5 == pgs@5, one-step
    qd err mean 1.2e-3; scripts/solver_fidelity_diag.py,
    tests/test_staged_training_parity.py).  The earlier "staged stalls"
    verdict was measured on the comment's unreachable range."""
    exp = EXPERIMENTS[name]
    robot = _robot(exp["common"]["env_name"])
    behavior_dir = BEHAVIOR[exp["behavior_env"]]
    suffix = f"_{tag}" if tag else ""

    traj_path = os.path.join(RUNS, f"{name}_n200{traj_suffix}.pkl")
    # --gdyn-tag: reuse another tag's identify ensemble (refine-only ablations
    # don't need to re-run the 8M-step identification)
    gdyn_suffix = f"_{gdyn_tag}" if gdyn_tag else suffix
    gdyn_dir = os.path.join(RUNS, f"gdyn_{name}{gdyn_suffix}")
    refine_dir = os.path.join(RUNS, f"{name}_refined{suffix}")
    result_path = os.path.join(RUNS, f"{name}{suffix}_result.json")
    results = json.load(open(result_path)) if os.path.exists(result_path) else {}
    # the collect/original stages are tag-independent; reuse across tags
    base_result = os.path.join(RUNS, f"{name}_result.json")
    if tag and os.path.exists(base_result):
        base = json.load(open(base_result))
        for k in ("original_mean", "original_median", "original_success"):
            results.setdefault(k, base.get(k))
    # provenance: record the identification recipe alongside the numbers
    results["config"] = dict(
        stages=stages, s_idx=list(s_idx), a_idx=list(a_idx),
        collect_det=collect_det, lanes=lanes, steps=steps, solver=solver,
        traj_path=os.path.basename(traj_path), seed_offset=seed_offset,
        gdyn_dir=os.path.basename(gdyn_dir),
        refine_steps=refine_steps, pessimism=pessimism,
        cross_ensemble=cross_ensemble, dyn_stiffness=dyn_stiffness,
        d_ensemble=d_ensemble, battery_prior=battery_prior,
        overrides_id=overrides_id or {},
        overrides_refine=overrides_refine or {},
        target_overrides={k: v for k, v in (target_overrides or {}).items()})

    assert lanes * steps == 16000, (lanes, steps)
    save_interval = 10 if robot == "Hopper" else 25
    id_cfg = TrainConfig(**{**exp["common"],
                            "num_processes": lanes,
                            "num_steps": steps,
                            "gail_traj_path": traj_path,
                            "save_dir": gdyn_dir,
                            "log_interval": 25,
                            "save_interval": save_interval,
                            "seed": exp["seed"] + seed_offset,
                            "gail_s_idx": ",".join(map(str, s_idx)),
                            "gail_a_idx": ",".join(map(str, a_idx)),
                            "d_ensemble": d_ensemble,
                            **(overrides_id or {})})
    refine_cfg = TrainConfig(**{**exp["refine"],
                                "num_processes": lanes,
                                "num_steps": steps,
                                "save_dir": refine_dir,
                                "warm_start": os.path.join(
                                    behavior_dir, exp["behavior_env"]),
                                "log_interval": 25,
                                "save_interval": 25,
                                "seed": exp["seed"] + 7 + seed_offset,
                                **({"num_env_steps": refine_steps}
                                   if refine_steps else {}),
                                **(overrides_refine or {})})
    target_kwargs = dict(exp["collect_env_kwargs"])
    target_kwargs.update(target_overrides or {})

    def _mark(stage, t0, **kw):
        results[stage + "_wall_s"] = round(time.time() - t0, 1)
        results.update(kw)
        os.makedirs(RUNS, exist_ok=True)
        json.dump(results, open(result_path, "w"), indent=1)
        print(f"== stage {stage} done in {results[stage + '_wall_s']}s: {kw}",
              flush=True)

    if "collect" in stages:
        # reference collect_tarsim_traj defaults to --non-det 0: expert data
        # comes from the DETERMINISTIC policy, with diversity from the env's
        # act_noise/obs_noise flags (collect_tarsim_traj.py:111-114, 140).
        # collect_det=True matches that; the historical default here (False)
        # samples the stochastic policy instead.
        t0 = time.time()
        collect_kwargs = dict(target_kwargs)
        if collect_det:
            # the reference collects with env-level noise on (README test
            # commands: --act_noise 1 --obs_noise 1), which is what gives
            # the deterministic policy its data diversity
            collect_kwargs.update(act_noise=1, obs_noise=1)
        res = collect(CollectConfig(
            env_name=exp["behavior_env"], load_dir=behavior_dir,
            save_traj=True, num_trajs=200, non_det=not collect_det,
            save_path=traj_path, seed=0, max_steps=500), collect_kwargs)
        _mark("collect", t0, collect_mean=res["mean_reward"],
              collect_median=res["median_reward"])

    if "original" in stages:
        t0 = time.time()
        res = collect(CollectConfig(
            env_name=exp["behavior_env"], load_dir=behavior_dir,
            num_trajs=100, non_det=False, seed=11, max_steps=500),
            target_kwargs)
        _mark("original", t0, original_mean=res["mean_reward"],
              original_median=res["median_reward"],
              original_success=res["success"])

    if "identify" in stages:
        from simgan_tpu.train import train_simgan
        t0 = time.time()
        model, params = checkpoints.load_policy(behavior_dir, exp["behavior_env"])
        env_extra = {"behavior_model": model, "behavior_params": params}
        id_kwargs = dict(ID_ENV_KWARGS, solver=solver)
        if dyn_stiffness:
            # framework extension: unpin contact stiffness as a 5th pi_dyn
            # contact dim (position-level sinks become representable)
            id_kwargs["dyn_stiffness"] = True
        if battery_prior:
            # framework extension: derate-only battery squash [0, 1]
            id_kwargs["battery_prior"] = True
        id_kwargs.update(id_env_extra_kwargs or {})
        train_simgan.train(id_cfg, id_kwargs, env_extra)
        _mark("identify", t0)

    if "refine" in stages:
        from simgan_tpu.train import train_behavior
        t0 = time.time()
        iters = scaled_ensemble_iters(id_cfg, save_interval)
        if cross_ensemble:
            # bagging-style ensemble: the final scaled ensemble iteration
            # from each listed tag's independent identification run
            # (framework extension; reference semantics = same-run iters)
            dirs = [os.path.join(RUNS, f"gdyn_{name}_{t}", "ppo")
                    for t in cross_ensemble.split(",")]
            model, stacked = checkpoints.load_cross_ensemble(
                dirs, id_cfg.env_name, iters[-1])
            iters = [f"{t}@{iters[-1]}" for t in cross_ensemble.split(",")]
        else:
            model, stacked = checkpoints.load_ensemble(
                os.path.join(gdyn_dir, "ppo"), id_cfg.env_name, iters)
        # fail fast on a dyn_stiffness mismatch between the loaded ensemble
        # and the refine env flag (e.g. --gdyn-tag/--cross-ensemble pointing
        # at a non-stiffness identify run) — otherwise this surfaces much
        # later as an opaque battery-shape broadcast error inside env.step
        num_feet = 1 if robot == "Hopper" else 4
        expected_act = ((5 if dyn_stiffness else 4) + 3) * num_feet
        assert model.action_dim == expected_act, (
            f"loaded dyn ensemble action_dim {model.action_dim} != "
            f"{expected_act} expected with dyn_stiffness={dyn_stiffness} "
            f"(was the ensemble identified with a different --dyn-stiffness?)")
        env_extra = {"dyn_model": model, "dyn_ensemble_params": stacked}
        refine_kwargs = dict(REFINE_ENV_KWARGS, solver=solver)
        if dyn_stiffness:
            refine_kwargs["dyn_stiffness"] = True
        if battery_prior:
            # the ensemble was identified under the [0, 1] battery squash;
            # the hybrid env must interpret its battery dims the same way
            refine_kwargs["battery_prior"] = True
        if pessimism:
            # MOPO-style pessimistic refinement (framework extension, off by
            # default): penalize the hybrid-sim reward by ensemble
            # disagreement to keep PPO on the identified distribution
            refine_kwargs["pessimism_lambda"] = pessimism
        train_behavior.train(refine_cfg, refine_kwargs, env_extra)
        _mark("refine", t0, ensemble_iters=iters)

    if "test" in stages:
        t0 = time.time()
        res = collect(CollectConfig(
            env_name=exp["behavior_env"],
            src_env_name=id_cfg.env_name,
            load_dir=os.path.join(refine_dir, "ppo"),
            num_trajs=100, non_det=False, seed=11, max_steps=500),
            target_kwargs)
        _mark("test", t0, refined_mean=res["mean_reward"],
              refined_median=res["median_reward"],
              refined_success=res["success"])
        print(f"== {name}{suffix}: original {results.get('original_mean')} "
              f"-> refined {results.get('refined_mean')}", flush=True)

    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("experiment", choices=sorted(EXPERIMENTS))
    p.add_argument("--stages", default="collect,original,identify,refine,test")
    p.add_argument("--tag", default="")
    p.add_argument("--s-idx", default="0")
    p.add_argument("--a-idx", default="0")
    p.add_argument("--collect-det", type=int, default=0,
                   help="collect expert data deterministically with env "
                        "act/obs noise, like the reference (--non-det 0)")
    p.add_argument("--lanes", type=int, default=128)
    p.add_argument("--steps", type=int, default=125)
    # pgs_pallas reproduced the pgs laika_heavy pipeline BIT-IDENTICALLY
    # (tag r3p == r3a to the last bit) at 2-5x the wall-clock; 'staged' is
    # disqualified for identification (r3s transfer collapse, RESULTS.md).
    # pgs_matfree is algorithm-identical but ulp-different (float
    # association) — gated behind an end-to-end transfer A/B before it can
    # become the identification default (RESULTS.md matfree section).
    p.add_argument("--solver", default="pgs_pallas",
                   choices=["pgs", "staged", "pgs_pallas", "pgs_matfree"])
    p.add_argument("--traj-suffix", default="",
                   help="suffix for the expert-traj pickle (e.g. _det), so "
                        "alternate collect recipes don't overwrite the base "
                        "runs/<name>_n200.pkl")
    p.add_argument("--seed-offset", type=int, default=0,
                   help="added to the experiment's identify/refine seeds "
                        "(seed-variance runs)")
    p.add_argument("--gdyn-tag", default="",
                   help="reuse the identify ensemble from this tag's "
                        "gdyn_<name>_<gdyn-tag> dir (refine-only ablations)")
    p.add_argument("--refine-steps", type=int, default=None,
                   help="override the refinement env-step budget (reference: "
                        "2M hopper / 4M laikago); deviations are recorded in "
                        "the result json config block")
    p.add_argument("--pessimism", type=float, default=0.0,
                   help="MOPO-style pessimistic refinement: subtract "
                        "lambda * ensemble disagreement from the hybrid-sim "
                        "reward (0 = reference semantics)")
    p.add_argument("--dyn-stiffness", type=int, default=0,
                   help="framework extension: unpin contact stiffness as a "
                        "5th pi_dyn contact dim per foot (log-uniform "
                        "[1,1e5]; damping widens to [2,297]) so position-"
                        "level sinks like the deform mattress are inside "
                        "the dynamics-GAN family (0 = reference semantics)")
    p.add_argument("--battery-prior", type=int, default=0,
                   help="framework extension: squash pi_dyn's battery dims "
                        "to [0,1] (derate-only prior) instead of the "
                        "reference's [-0.5,1.5] (0 = reference semantics)")
    p.add_argument("--refine-override", default="",
                   help="comma-separated key=value TrainConfig overrides for "
                        "the REFINE stage (e.g. entropy_coef=0.003 — the "
                        "entropy-floor lever the laika_heavy oracle study "
                        "motivates, RESULTS.md round 5)")
    p.add_argument("--id-override", default="",
                   help="comma-separated key=value TrainConfig overrides for "
                        "the identify stage (e.g. "
                        "gail_downsample_frequency=5); values parsed as "
                        "int/float when possible")
    p.add_argument("--target-override", default="",
                   help="comma-separated key=value TARGET-env config "
                        "overrides applied to the collect/original/test "
                        "stages (e.g. deform_nodes=1 for the 8-vertex "
                        "mass-spring mattress)")
    p.add_argument("--d-ensemble", type=int, default=1,
                   help="framework extension: K discriminators on per-member "
                        "expert bootstraps, reward = mean of member rewards "
                        "(1 = reference semantics)")
    p.add_argument("--cross-ensemble", default="",
                   help="comma-separated tags: build the refinement ensemble "
                        "from the final scaled iteration of EACH tag's "
                        "independent identify run (bagging-style diversity) "
                        "instead of five iterations of one run")
    args = p.parse_args(argv)

    def _parse_val(v: str):
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
        return v

    overrides_id = {}
    if args.id_override:
        for kv in args.id_override.split(","):
            k, v = kv.split("=", 1)
            overrides_id[k] = _parse_val(v)
    overrides_refine = {}
    if args.refine_override:
        for kv in args.refine_override.split(","):
            k, v = kv.split("=", 1)
            overrides_refine[k] = _parse_val(v)
    target_overrides = {}
    if args.target_override:
        for kv in args.target_override.split(","):
            k, v = kv.split("=", 1)
            target_overrides[k] = _parse_val(v)
    run(args.experiment, args.stages.split(","), tag=args.tag,
        s_idx=tuple(int(x) for x in args.s_idx.split(",")),
        a_idx=tuple(int(x) for x in args.a_idx.split(",")),
        collect_det=bool(args.collect_det),
        lanes=args.lanes, steps=args.steps, solver=args.solver,
        traj_suffix=args.traj_suffix, seed_offset=args.seed_offset,
        gdyn_tag=args.gdyn_tag, refine_steps=args.refine_steps,
        pessimism=args.pessimism, cross_ensemble=args.cross_ensemble,
        dyn_stiffness=bool(args.dyn_stiffness), d_ensemble=args.d_ensemble,
        battery_prior=bool(args.battery_prior), overrides_id=overrides_id,
        overrides_refine=overrides_refine, target_overrides=target_overrides)


if __name__ == "__main__":
    main()
