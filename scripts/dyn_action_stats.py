"""Identified-dynamics action statistics: what contact coefficients does
pi_dyn actually command on-distribution?

Rolls each ensemble member (deterministic) in the train_dyn combined env
(frozen behavior policy fused in) and reports the distribution of the
PHYSICAL contact parameters it writes each control step — lateral/spinning
friction, restitution, damping, stiffness (dyn_stiffness runs) and battery —
plus the implied Bullet ERP/CFM at dt=1/500 next to the true deform
mattress's (erp=0.444, cfm=1/270 for k=60000, d=150).

Answers VERDICT r4's central question for the dyn_stiffness extension: did
identification *use* the unpinned stiffness dim (find the position-level
regime), or did the GAN sit at the velocity-level default?

Usage:
    python scripts/dyn_action_stats.py laika_deform --tag r4s --dyn-stiffness 1
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.train import checkpoints
from simgan_tpu.train.config import TrainConfig
from simgan_tpu.train.experiments import EXPERIMENTS, ID_ENV_KWARGS
from simgan_tpu.envs.hopper_combined import contact_coeff_and_battery

from run_experiment import BEHAVIOR, RUNS, scaled_ensemble_iters, _robot


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("experiment", choices=sorted(EXPERIMENTS))
    p.add_argument("--tag", default="")
    p.add_argument("--dyn-stiffness", type=int, default=0)
    p.add_argument("--trajs", type=int, default=16)
    p.add_argument("--steps", type=int, default=250)
    p.add_argument("--solver", default="pgs")
    args = p.parse_args(argv)

    exp = EXPERIMENTS[args.experiment]
    robot = _robot(exp["common"]["env_name"])
    num_feet = 1 if robot == "Hopper" else 4
    suffix = f"_{args.tag}" if args.tag else ""
    gdyn_dir = os.path.join(RUNS, f"gdyn_{args.experiment}{suffix}", "ppo")
    id_cfg = TrainConfig(**{**exp["common"], "num_processes": 128,
                            "num_steps": 125})
    save_interval = 10 if robot == "Hopper" else 25
    iters = scaled_ensemble_iters(id_cfg, save_interval)
    model, stacked = checkpoints.load_ensemble(gdyn_dir, id_cfg.env_name, iters)

    from simgan_tpu import envs as env_registry
    b_model, b_params = checkpoints.load_policy(
        BEHAVIOR[exp["behavior_env"]], exp["behavior_env"])
    kwargs = dict(ID_ENV_KWARGS, solver=args.solver)
    if args.dyn_stiffness:
        kwargs["dyn_stiffness"] = True
    env = env_registry.make(id_cfg.env_name, behavior_model=b_model,
                            behavior_params=b_params, **kwargs)

    from simgan_tpu.agents import networks

    def rollout_actions(params, key):
        def single(k):
            k_r, k_s = jax.random.split(k)
            state, obs = env.reset(k_r)

            def body(carry, kk):
                state, obs, alive = carry
                _, a, _ = networks.policy_act(model, params, obs,
                                              deterministic=True)
                s = env.step(state, a)
                from simgan_tpu.envs.base import tree_where
                new_state = tree_where(alive, s.state, state)
                new_obs = jnp.where(alive, s.obs, obs)
                out = (a, alive)
                return (new_state, new_obs, alive & ~s.done), out

            ks = jax.random.split(k_s, args.steps)
            _, (acts, valid) = jax.lax.scan(
                body, (state, obs, jnp.asarray(True)), ks)
            return acts, valid

        keys = jax.random.split(key, args.trajs)
        return jax.vmap(single)(keys)

    fn = jax.jit(rollout_actions)
    all_rows = []
    for m in range(len(iters)):
        member = jax.tree.map(lambda x: x[m], stacked)
        acts, valid = jax.device_get(fn(member, jax.random.PRNGKey(11 + m)))
        rows = acts[np.asarray(valid, bool)]
        all_rows.append(rows)
        print(f"member @{iters[m]}: {rows.shape[0]} valid steps")
    rows = np.concatenate(all_rows)

    lat, spin, rst, damp, stiff, batt = jax.vmap(
        lambda a: contact_coeff_and_battery(
            a, num_feet, stiffness=bool(args.dyn_stiffness)))(jnp.asarray(rows))
    dt = 1.0 / 500.0

    def stats(name, x):
        x = np.asarray(x).ravel()
        q = np.percentile(x, [5, 25, 50, 75, 95])
        print(f"  {name:10s} p5/p25/p50/p75/p95 = "
              + " ".join(f"{v:10.3f}" for v in q))
        return q

    print(f"\n== {args.experiment}{suffix} pi_dyn physical-action "
          f"distribution ({rows.shape[0]} steps x {num_feet} feet) ==")
    stats("lateral", lat)
    stats("spin", spin)
    stats("restitution", rst)
    dq = stats("damping", damp)
    if stiff is not None:
        kq = stats("stiffness", stiff)
        k50, d50 = kq[2], dq[2]
        erp = dt * k50 / (dt * k50 + d50)
        cfm = 1.0 / (dt * k50 + d50)
        print(f"  implied @medians: erp {erp:.4f}  cfm {cfm:.5f}   "
              f"(deform mattress target: erp 0.4444  cfm 0.00370)")
        # share of steps in the position-level regime (erp > 0.2)
        erp_all = dt * np.asarray(stiff) / (dt * np.asarray(stiff) + np.asarray(damp))
        print(f"  erp distribution: p5 {np.percentile(erp_all, 5):.4f} "
              f"p50 {np.percentile(erp_all, 50):.4f} "
              f"p95 {np.percentile(erp_all, 95):.4f}; "
              f"share erp>0.2: {np.mean(erp_all > 0.2) * 100:.1f}%")
    stats("battery", batt)


if __name__ == "__main__":
    main()
