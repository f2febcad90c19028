"""Env-level ablation for the laikago combined env (TPU perf tool).

Separates: bare physics control_step, env.step with a FIXED action (no
policy), policy_act alone, and the full bench loop — all scanned the same
way as bench.py so numbers are comparable.

Usage: python scripts/profile_laika_env.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from simgan_tpu.agents.networks import MLPPolicy, SplitPolicy, policy_act
from simgan_tpu.envs.laikago_combined import (LaikagoCombinedConfig,
                                              LaikagoCombinedEnv)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

key = jax.random.PRNGKey(0)
k_b, k_d, k_env, k_run = jax.random.split(key, 4)

behavior = MLPPolicy(action_dim=12, hidden=64)
b_params = behavior.init(k_b, jnp.zeros((1, 111)))
env = LaikagoCombinedEnv(
    LaikagoCombinedConfig(act_noise=True, obs_noise=True, behavior_logstd=-1.3),
    behavior_model=behavior, behavior_params=b_params)
if os.environ.get("SIMGAN_WARM", "1") == "0":
    from simgan_tpu.physics.contact import ContactConfig

    env.phys_cfg = env.phys_cfg._replace(
        contact=ContactConfig(warm_start=False))
    env._inner.phys_cfg = env.phys_cfg
    print("warm_start disabled", flush=True)

dyn = SplitPolicy(num_feet=4, hidden=100)
d_params = dyn.init(k_d, jnp.zeros((1, env.obs_dim)))

reset_keys = jax.random.split(k_env, B)
states0, obs0 = jax.jit(jax.vmap(env.reset))(reset_keys)
act_fixed = jnp.zeros((B, env.act_dim))


def timeit(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    per_step = dt / ITERS
    print(f"{name:34s} {per_step * 1e3:8.2f} ms/step  "
          f"({B / per_step / 1e3:8.1f}k env steps/s)", flush=True)
    return per_step


@jax.jit
def env_only(states, obs, key):
    def body(carry, k):
        states, obs = carry
        s = jax.vmap(env.step)(states, act_fixed)
        return (s.state, s.obs), s.reward

    keys = jax.random.split(key, ITERS)
    (states, obs), r = jax.lax.scan(body, (states, obs), keys)
    return states, obs, r.mean()


@jax.jit
def policy_only(obs, key):
    def body(carry, k):
        _, action, _ = policy_act(dyn, d_params, carry, k)
        return carry + 1e-9 * action[:, : carry.shape[-1]].sum(-1, keepdims=True), action

    keys = jax.random.split(key, ITERS)
    obs, acts = jax.lax.scan(body, obs, keys)
    return obs


@jax.jit
def full(states, obs, key):
    def body(carry, k):
        states, obs = carry
        _, action, _ = policy_act(dyn, d_params, obs, k)
        s = jax.vmap(env.step)(states, action)
        return (s.state, s.obs), s.reward

    keys = jax.random.split(key, ITERS)
    (states, obs), r = jax.lax.scan(body, (states, obs), keys)
    return states, obs, r.mean()


print(f"laikago env ablation @ B={B}, {ITERS} scanned steps per call", flush=True)
timeit("env.step fixed action", env_only, states0, obs0, k_run)
timeit("policy_act only", policy_only, obs0, k_run)
timeit("policy + env.step (bench loop)", full, states0, obs0, k_run)

# chained mode: feed outputs back like bench.py (state values evolve; robots
# fall and, with no auto-reset, can diverge -> value-dependent perf probe)
states, obs = states0, obs0
kk = k_run
jax.block_until_ready(full(states, obs, kk))
for rep in range(4):
    t0 = time.perf_counter()
    kk, k = jax.random.split(kk)
    states, obs, r = full(states, obs, k)
    jax.block_until_ready(states)
    dt = (time.perf_counter() - t0) / ITERS
    qmax = float(jnp.abs(states.phys.q).max())
    nan = bool(jnp.isnan(states.phys.q).any())
    print(f"chained rep {rep}: {dt * 1e3:8.2f} ms/step  ({B / dt / 1e3:8.1f}k/s)"
          f"  max|q|={qmax:.3e} nan={nan}", flush=True)
