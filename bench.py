#!/usr/bin/env python
"""Benchmark of record: hybrid-sim env steps/sec on one TPU chip.

Measures the SimGAN identification hot path — the combined-env control step
with the frozen behavior policy fused in (contact-coefficient write +
10x500Hz physics substeps + behavior MLP + window bookkeeping), vmapped over
a large env batch, jitted as one XLA program on the real chip.

Both robots are measured by default (VERDICT r3 item 4: the driver artifact
should carry the full perf story), each at its measured-best batch/solver:
hopper B=32768 with the Mosaic Pallas PGS kernel, laikago B=8192 with the
row-unrolled XLA pgs + the Mosaic SPD-inverse kernel (ops/spd_pallas.py,
round-4: 6.63 -> 5.91 us/env-step; RESULTS.md A/Bs).

SIMGAN_BENCH_ENV=hopper|laikago restricts to one robot;
SIMGAN_BENCH_BATCH / SIMGAN_BENCH_ITERS size the run;
SIMGAN_BENCH_SOLVER=pgs|staged|pgs_pallas overrides the contact solver;
SIMGAN_BENCH_SPD=0|1 overrides the SPD-inverse kernel choice.

The reference publishes no numbers (BASELINE.md); the driver-set north star
is >=1M hybrid-sim env steps/sec on a v5e-8 slice, i.e. 125k steps/sec/chip.
vs_baseline reports value / 125000.

Prints exactly ONE JSON line (hopper is the headline metric; the laikago
measurement rides along as extra keys).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

ENV = os.environ.get("SIMGAN_BENCH_ENV", "")  # '' = both robots
ITERS = int(os.environ.get("SIMGAN_BENCH_ITERS", 25))
NORTH_STAR_PER_CHIP = 125_000.0

# measured-fastest PRODUCTION solver/batch per robot (both end-to-end
# validated; pgs_pallas is bit-identical to pgs — RESULTS.md): hopper R=19
# wins with the Mosaic kernel (0.701 vs 1.025 us/step at B=32768), laikago
# R=58 wins with XLA pgs row-unrolled (6.64 vs 8.36 at B=8192) plus the
# VMEM-resident SPD-inverse kernel for the 18x18 M_eff^-1 chain (5.91 us;
# spd_pallas matches linalg.spd_inverse to float associativity,
# tests/test_spd_pallas.py).
DEFAULTS = {"hopper": (32768, "pgs_pallas", False),
            "laikago": (8192, "", True)}


def make_env(env_name, key, solver, spd):
    from simgan_tpu.agents.networks import MLPPolicy

    if env_name == "laikago":
        from simgan_tpu.envs.laikago_combined import (LaikagoCombinedConfig,
                                                      LaikagoCombinedEnv)
        behavior = MLPPolicy(action_dim=12, hidden=64)
        b_params = behavior.init(key, jnp.zeros((1, 111)))
        cfg = LaikagoCombinedConfig(act_noise=True, obs_noise=True,
                                    behavior_logstd=-1.3, spd_pallas=spd,
                                    **({"solver": solver} if solver else {}))
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
                                 behavior_logstd=-1.3, spd_pallas=spd,
                                 **({"solver": solver} if solver else {})),
            behavior_model=behavior, behavior_params=b_params)
        num_feet = 1
    return env, num_feet


def measure(env_name: str) -> float:
    """Steady-state hybrid-sim env steps/sec for one robot."""
    from simgan_tpu.agents.networks import SplitPolicy, policy_act

    batch, solver, spd = DEFAULTS[env_name]
    batch = int(os.environ.get("SIMGAN_BENCH_BATCH", batch))
    solver = os.environ.get("SIMGAN_BENCH_SOLVER", solver)
    spd = bool(int(os.environ.get("SIMGAN_BENCH_SPD", int(spd))))

    key = jax.random.PRNGKey(0)
    k_b, k_d, k_env, k_run = jax.random.split(key, 4)

    env, num_feet = make_env(env_name, k_b, solver, spd)
    dyn = SplitPolicy(num_feet=num_feet, hidden=100)
    d_params = dyn.init(k_d, jnp.zeros((1, env.obs_dim)))

    reset_keys = jax.random.split(k_env, batch)
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
    return batch * ITERS * n_chunks / dt


def main():
    robots = [ENV] if ENV else ["hopper", "laikago"]
    sps = {r: measure(r) for r in robots}
    primary = "hopper" if "hopper" in sps else robots[0]
    out = {
        "metric": ("hybrid_sim_env_steps_per_sec_per_chip"
                   if primary == "hopper"
                   else f"hybrid_sim_env_steps_per_sec_per_chip_{primary}"),
        "value": round(sps[primary], 1),
        "unit": "env_steps/s",
        "vs_baseline": round(sps[primary] / NORTH_STAR_PER_CHIP, 3),
    }
    for r in robots:
        if r != primary:
            out[f"{r}_value"] = round(sps[r], 1)
            out[f"{r}_vs_baseline"] = round(sps[r] / NORTH_STAR_PER_CHIP, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
