"""Why does hopper-power show no domain gap for our behavior policy?

The low-power target derates the foot motor 200->100 N·m and the EMF mode
scales torque by clip(1 - dq/10, 0, 1) (reference hopper_env_v3.py:179-180,
236-239 — semantics verified identical in envs/hopper_env.py).  Whether that
*bites* depends on the gait: a policy that hops with |a|·200 < 100 at the
foot and joint speeds well under 10 rad/s never feels the derating.

This script rolls the stage-0 behavior policy in the SOURCE env and records
(a) the commanded-torque distribution per joint (fraction of steps with
|tau_foot| > 100, i.e. above the low-power cap) and (b) the joint-speed
distribution (fraction of substeps with dq in the EMF derating band).

Usage: python scripts/power_gap_diag.py [load_dir] [n_trajs]
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from simgan_tpu.agents import networks
from simgan_tpu.envs import make
from simgan_tpu.train import checkpoints

LOAD = sys.argv[1] if len(sys.argv) > 1 else "runs/hopper_behavior_v2/ppo"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 32
ENV = "HopperURDFEnv-v3"


def main():
    env = make(ENV)
    model, params = checkpoints.load_policy(LOAD, ENV)

    def rollout(key):
        k_reset, k_run = jax.random.split(key)
        state, obs = env.reset(k_reset)

        def body(carry, k):
            state, obs, alive = carry
            _, action, _ = networks.policy_act(
                model, params, obs, k, deterministic=True)
            st = env.step(state, action)
            nstate, nobs, done = st.state, st.obs, st.done
            act = jnp.tanh(action)
            tau = act * state.dp.max_forces          # commanded torque (3,)
            dq = state.phys.qd[3:6]                  # joint speeds (3,)
            out = (tau, dq, alive)
            alive = alive & ~done
            return (nstate, nobs, alive), out

        keys = jax.random.split(k_run, 500)
        _, (taus, dqs, valid) = jax.lax.scan(body, (state, obs, True), keys)
        return taus, dqs, valid

    taus, dqs, valid = jax.vmap(rollout)(jax.random.split(jax.random.PRNGKey(5), N))
    taus, dqs, valid = map(np.asarray, (taus, dqs, valid))
    v = valid.astype(bool)
    taus, dqs = taus[v], dqs[v]
    print(f"steps analyzed: {len(taus)}")
    names = ["thigh", "leg", "foot"]
    for j, nm in enumerate(names):
        t, d = np.abs(taus[:, j]), dqs[:, j]
        print(f"{nm:6s} |tau|: mean {t.mean():6.1f}  p50 {np.percentile(t,50):6.1f} "
              f"p95 {np.percentile(t,95):6.1f}  max {t.max():6.1f}  "
              f"frac>100Nm {np.mean(t > 100):.3f}")
        print(f"{nm:6s}  dq : mean {d.mean():6.2f}  p5 {np.percentile(d,5):6.2f} "
              f"p95 {np.percentile(d,95):6.2f}  "
              f"frac in EMF band (0<dq<10) {np.mean((d > 0) & (d < 10)):.3f}  "
              f"frac dq>=10 (torque zeroed) {np.mean(d >= 10):.3f}")
    # the low-power cap applies to the FOOT motor only (max_forces[2] 200->100)
    foot = np.abs(taus[:, 2])
    print(f"\nlow-power verdict: foot torque exceeds the 100 N·m cap on "
          f"{np.mean(foot > 100) * 100:.1f}% of steps "
          f"(p95 {np.percentile(foot, 95):.1f} N·m); EMF zeroes torque on "
          f"{np.mean(dqs[:, 2] >= 10) * 100:.1f}% of foot-joint steps.")


if __name__ == "__main__":
    main()
