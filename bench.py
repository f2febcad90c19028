#!/usr/bin/env python
"""Benchmark of record: hybrid-sim env steps/sec on one TPU chip.

Measures the SimGAN identification hot path — the combined-env control step
with the frozen behavior policy fused in (contact-coefficient write +
10x500Hz physics substeps + behavior MLP + window bookkeeping), vmapped over
a large env batch, jitted as one XLA program on the real chip.

SIMGAN_BENCH_ENV=hopper (default) | laikago selects the robot;
SIMGAN_BENCH_BATCH / SIMGAN_BENCH_ITERS size the run;
SIMGAN_BENCH_SOLVER=pgs|staged|pgs_pallas overrides the contact solver.

The reference publishes no numbers (BASELINE.md); the driver-set north star
is >=1M hybrid-sim env steps/sec on a v5e-8 slice, i.e. 125k steps/sec/chip.
vs_baseline reports value / 125000.

Prints exactly ONE JSON line.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

ENV = os.environ.get("SIMGAN_BENCH_ENV", "hopper")
BATCH = int(os.environ.get("SIMGAN_BENCH_BATCH", 32768 if ENV == "hopper" else 8192))
ITERS = int(os.environ.get("SIMGAN_BENCH_ITERS", 25))
# default = the measured-fastest PRODUCTION solver per robot (both are
# end-to-end validated; pgs_pallas is bit-identical to pgs — RESULTS.md):
# hopper R=19 wins with the Mosaic kernel (0.701 vs 1.025 us/step at
# B=32768), laikago R=58 wins with XLA pgs (7.57 vs 8.36 at B=8192).
SOLVER = os.environ.get("SIMGAN_BENCH_SOLVER",
                        "pgs_pallas" if ENV == "hopper" else "")
NORTH_STAR_PER_CHIP = 125_000.0


def make_env(key):
    from simgan_tpu.agents.networks import MLPPolicy

    if ENV == "laikago":
        from simgan_tpu.envs.laikago_combined import (LaikagoCombinedConfig,
                                                      LaikagoCombinedEnv)
        behavior = MLPPolicy(action_dim=12, hidden=64)
        b_params = behavior.init(key, jnp.zeros((1, 111)))
        cfg = LaikagoCombinedConfig(act_noise=True, obs_noise=True,
                                    behavior_logstd=-1.3,
                                    **({"solver": SOLVER} if SOLVER else {}))
        env = LaikagoCombinedEnv(cfg, behavior_model=behavior,
                                 behavior_params=b_params)
        num_feet = 4
    else:
        from simgan_tpu.envs.hopper_combined import (HopperCombinedConfig,
                                                     HopperCombinedEnv)
        behavior = MLPPolicy(action_dim=3, hidden=64)
        b_params = behavior.init(key, jnp.zeros((1, 11)))
        env = HopperCombinedEnv(
            HopperCombinedConfig(act_noise=True, obs_noise=True,
                                 behavior_logstd=-1.3,
                                 **({"solver": SOLVER} if SOLVER else {})),
            behavior_model=behavior, behavior_params=b_params)
        num_feet = 1
    return env, num_feet


def main():
    from simgan_tpu.agents.networks import SplitPolicy, policy_act

    key = jax.random.PRNGKey(0)
    k_b, k_d, k_env, k_run = jax.random.split(key, 4)

    env, num_feet = make_env(k_b)
    dyn = SplitPolicy(num_feet=num_feet, hidden=100)
    d_params = dyn.init(k_d, jnp.zeros((1, env.obs_dim)))

    reset_keys = jax.random.split(k_env, BATCH)
    states, obs = jax.jit(jax.vmap(env.reset))(reset_keys)

    @jax.jit
    def rollout_chunk(states, obs, key):
        """One chunk of policy-act + env-step iterations (scanned)."""

        def body(carry, k):
            states, obs = carry
            _, action, _ = policy_act(dyn, d_params, obs, k)
            s = jax.vmap(env.step)(states, action)
            return (s.state, s.obs), s.reward

        keys = jax.random.split(key, ITERS)
        (states, obs), rewards = jax.lax.scan(body, (states, obs), keys)
        return states, obs, rewards.mean()

    # warmup / compile — twice, chained: the second call's inputs are chunk
    # OUTPUTS, so the timed loop below hits the steady-state compilation
    # (reset-built pytrees differ in weak-type details from scan outputs; a
    # single warmup left one recompile inside the timed region, understating
    # throughput ~3x).
    states, obs, _ = jax.block_until_ready(rollout_chunk(states, obs, k_run))
    k_run, k = jax.random.split(k_run)
    states, obs, _ = jax.block_until_ready(rollout_chunk(states, obs, k))

    t0 = time.perf_counter()
    n_chunks = 3
    for i in range(n_chunks):
        k_run, k = jax.random.split(k_run)
        states, obs, r = rollout_chunk(states, obs, k)
    jax.block_until_ready(states)
    dt = time.perf_counter() - t0

    steps = BATCH * ITERS * n_chunks
    sps = steps / dt
    metric = ("hybrid_sim_env_steps_per_sec_per_chip" if ENV == "hopper"
              else f"hybrid_sim_env_steps_per_sec_per_chip_{ENV}")
    print(json.dumps({
        "metric": metric,
        "value": round(sps, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(sps / NORTH_STAR_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
