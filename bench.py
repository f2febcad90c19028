#!/usr/bin/env python
"""Benchmark of record: hybrid-sim env steps/sec on one TPU chip.

Measures the SimGAN identification hot path — the combined-env control step
with the frozen behavior policy fused in (contact-coefficient write +
10x500Hz physics substeps + behavior MLP + window bookkeeping), vmapped over
a large env batch, jitted as one XLA program on the real chip.

Both robots are measured by default (VERDICT r3 item 4: the driver artifact
should carry the full perf story), each at its measured-best batch/solver:
the matrix-free Mosaic PGS kernel (ops/pgs_matfree_pallas.py) for BOTH
robots as of round 5 — it deletes the Delassus assembly/relayout HBM
traffic and won the same-session A/B at every shape (hopper B=32768:
0.699 -> 0.516 us/env-step, 1.36x; laikago B=8192 [+ SPD-inverse kernel]:
5.91 -> 4.27, 1.38x; runs/ab_matfree_result.json).  Same algorithm, row
order, and projection as 'pgs'/'pgs_pallas'; differs only at
float-association ulps (trajectory drift pinned by tests/test_pgs_matfree
.py), and transfer-validated end-to-end in round 5 (full laika_power
pipeline with pgs_matfree reproduces the pgs row of record: 5425.3 mean,
100/100 success — runs/laika_power_r5mf_result.json).

SIMGAN_BENCH_ENV=hopper|laikago restricts to one robot;
SIMGAN_BENCH_BATCH / SIMGAN_BENCH_ITERS size the run;
SIMGAN_BENCH_SOLVER=pgs|staged|pgs_pallas overrides the contact solver;
SIMGAN_BENCH_SPD=0|1 overrides the SPD-inverse kernel choice;
SIMGAN_BENCH_BUDGET_S caps total wall clock (default 420 s).

Wall-clock budget (round-5 fix for the BENCH_r04 rc=124 null): the hopper
headline is measured first; the laikago leg only starts if enough budget
remains for its worst observed cold compile, runs under a SIGALRM backstop,
and any laikago failure/timeout degrades to extra keys in the hopper line
instead of killing the artifact.  The headline JSON line always prints as
long as the hopper leg itself completes.

The reference publishes no numbers (BASELINE.md); the driver-set north star
is >=1M hybrid-sim env steps/sec on a v5e-8 slice, i.e. 125k steps/sec/chip.
vs_baseline reports value / 125000.

Prints exactly ONE JSON line (hopper is the headline metric; the laikago
measurement rides along as extra keys).
"""

import json
import os
import signal
import time

import jax
import jax.numpy as jnp

ENV = os.environ.get("SIMGAN_BENCH_ENV", "")  # '' = both robots
ITERS = int(os.environ.get("SIMGAN_BENCH_ITERS", 25))
BUDGET_S = float(os.environ.get("SIMGAN_BENCH_BUDGET_S", 420.0))
# worst observed cold-cache laikago leg (compile-dominated); the leg is
# skipped rather than started if less than this remains in the budget
LAIKAGO_COST_S = 180.0
NORTH_STAR_PER_CHIP = 125_000.0
T_START = time.perf_counter()

# measured-fastest solver/batch per robot (round-5 A/B,
# runs/ab_matfree_result.json): the matrix-free Mosaic PGS kernel wins both
# bench shapes (hopper 0.516 vs 0.699 us/env-step @B=32768; laikago 4.27 vs
# 5.91 @B=8192) and the laikago trainer shape (7.39 vs 9.30 @B=128).
# Laikago keeps the VMEM-resident SPD-inverse kernel for the 18x18
# M_eff^-1 chain (ops/spd_pallas.py) that feeds matfree's Ut = J M^-1.
# Prior defaults (hopper pgs_pallas 1,430.7k; laikago row-unrolled XLA pgs
# + spd 169.3k) remain selectable via SIMGAN_BENCH_SOLVER/SIMGAN_BENCH_SPD.
DEFAULTS = {"hopper": (32768, "pgs_matfree", False),
            "laikago": (8192, "pgs_matfree", True)}


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


class _LegTimeout(Exception):
    pass


def _measure_secondary(env_name: str, out: dict) -> None:
    """Measure a non-headline robot under the remaining wall-clock budget.

    Skips (recording why) if the remaining budget can't cover the leg's
    worst observed cold compile; aborts via SIGALRM if it overruns anyway.
    The alarm fires between host-side Python steps — it cannot interrupt a
    single blocked XLA call, so the pre-start budget check is the primary
    protection and the alarm the backstop.
    """
    remaining = BUDGET_S - (time.perf_counter() - T_START)
    if remaining < LAIKAGO_COST_S:
        out[f"{env_name}_skipped"] = f"budget ({remaining:.0f}s left)"
        return

    def _on_alarm(signum, frame):
        raise _LegTimeout()

    prev = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(max(1, int(remaining)))
    try:
        sps = measure(env_name)
        out[f"{env_name}_value"] = round(sps, 1)
        out[f"{env_name}_vs_baseline"] = round(sps / NORTH_STAR_PER_CHIP, 3)
    except _LegTimeout:
        out[f"{env_name}_skipped"] = "leg timeout"
    except Exception as e:  # never lose the headline to the rider
        out[f"{env_name}_skipped"] = f"error: {type(e).__name__}: {e}"[:200]
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)


def main():
    robots = [ENV] if ENV else ["hopper", "laikago"]
    primary = "hopper" if "hopper" in robots else robots[0]
    out = {
        "metric": ("hybrid_sim_env_steps_per_sec_per_chip"
                   if primary == "hopper"
                   else f"hybrid_sim_env_steps_per_sec_per_chip_{primary}"),
        "unit": "env_steps/s",
    }
    sps = measure(primary)
    out["value"] = round(sps, 1)
    out["vs_baseline"] = round(sps / NORTH_STAR_PER_CHIP, 3)
    for r in robots:
        if r != primary:
            _measure_secondary(r, out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
