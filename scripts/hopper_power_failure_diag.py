"""Hopper-power refined-policy failure diagnosis (VERDICT r2 item 7).

Round 2's hopper-power result: original 3193 mean / 3570 median (45/100
success), refined 3057 mean / 236 MEDIAN (38/100) — the mean hides a
bimodal distribution.  This script rolls a policy deterministically in the
low-power target (low_power_env=1 + emf_power_env=1, reference
hopper_env_v3.py:179-180, 236-239), captures full state trajectories, and
classifies each episode's outcome and termination mode:

  success    total reward > 4000
  fall-low   terminated with root height < 0.6 (collapsed)
  fly-high   terminated with root height > 1.8 (bounced out)
  dq-blowup  terminated with |dq| >= 50 on some dof
  timeout    survived 500 steps below the success bar

Usage (either backend):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/hopper_power_failure_diag.py \
      runs/hopper_power_refined_r2p/ppo HopperCombinedEnv-v1
  ... runs/hopper_behavior_v2/ppo HopperURDFEnv-v3     # original policy
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
from simgan_tpu.envs.base import tree_where
from simgan_tpu.train import checkpoints

LOAD = sys.argv[1] if len(sys.argv) > 1 else "runs/hopper_power_refined_r2p/ppo"
SRC_ENV = sys.argv[2] if len(sys.argv) > 2 else "HopperCombinedEnv-v1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 100
T = 500


def main():
    env = make("HopperURDFEnv-v3", low_power_env=1, emf_power_env=1)
    model, params = checkpoints.load_policy(LOAD, SRC_ENV)
    key = jax.random.PRNGKey(1011)

    def single(k):
        k_reset, k_steps = jax.random.split(k)
        state, obs = env.reset(k_reset)

        def body(carry, kk):
            st, ob, alive = carry
            _, action, _ = networks.policy_act(model, params, ob, kk,
                                               deterministic=True)
            s = env.step(st, action)
            new_state = tree_where(alive, s.state, st)
            new_obs = jnp.where(alive, s.obs, ob)
            out = (s.reward * alive, alive, s.state.phys.q, s.state.phys.qd)
            return (new_state, new_obs, alive & ~s.done), out

        keys = jax.random.split(k_steps, T)
        _, (rew, valid, qs, qds) = jax.lax.scan(
            body, (state, obs, jnp.asarray(True)), keys)
        return rew, valid, qs, qds

    keys = jax.random.split(key, N)
    rew, valid, qs, qds = jax.device_get(jax.jit(jax.vmap(single))(keys))

    total = (rew * valid).sum(1)
    length = valid.sum(1).astype(int)
    # hopper q = [x, z(prismatic), rot_y, thigh, leg, foot]; obs height =
    # root-link height = z + const; termination uses 0.6 < h < 1.8.
    # Recover h from the env's own obs convention: use the raw z plus the
    # standing offset implied by the first frame (h0 ~ 1.25 nominal).
    z = qs[..., 1]
    h_off = 1.25 - np.median(z[:, 0])
    modes = []
    for i in range(N):
        li = max(length[i] - 1, 0)
        if total[i] > 4000:
            modes.append("success")
        elif length[i] >= T:
            modes.append("timeout")
        elif np.abs(qds[i, li]).max() >= 50:
            modes.append("dq-blowup")
        elif z[i, li] + h_off <= 0.65:
            modes.append("fall-low")
        elif z[i, li] + h_off >= 1.75:
            modes.append("fly-high")
        else:
            modes.append("other")
    modes = np.array(modes)

    print(f"policy {LOAD} in low-power target, {N} det trajs")
    print(f"mean {total.mean():.1f} median {np.median(total):.1f} "
          f"success {(total > 4000).sum()}/{N}")
    for m in ["success", "fall-low", "fly-high", "dq-blowup", "timeout", "other"]:
        sel = modes == m
        if sel.sum():
            print(f"  {m:10s} n={sel.sum():3d}  reward {total[sel].mean():8.1f}  "
                  f"len {length[sel].mean():6.1f}  first-div step "
                  f"{np.median(length[sel]):.0f}")
    # reward histogram coarse
    bins = [0, 250, 500, 1000, 2000, 4000, 12000]
    hist, _ = np.histogram(total, bins)
    print("reward histogram", dict(zip([f"<{b}" for b in bins[1:]], hist.tolist())))
    # early-divergence signature: mean reward in first 50 steps of failures
    fail = total <= 4000
    if fail.sum():
        r50 = (rew[:, :50] * valid[:, :50]).sum(1)
        print(f"failures: mean reward first 50 steps {r50[fail].mean():.1f} "
              f"(success trajs: {r50[~fail].mean():.1f})")


if __name__ == "__main__":
    main()
