"""Laikago hybrid-step cost attribution (VERDICT r2 item 8).

Diff-timing at the bench shape (B=8192, 25 scanned iters x 3 chunks,
double-warmed like bench.py): times the full combined-env step and ablated
variants, attributing the per-step cost between the PGS contact solve, the
physics core (FK/jvp + implicit-damping Cholesky), the nets (dyn SplitPolicy
+ behavior MLP), and the obs/reward/window plumbing.  Optionally captures an
XLA trace (SIMGAN_TRACE_DIR).

Run on the real chip:  python scripts/profile_laika_bench.py
Env knobs: PROF_BATCH (8192), PROF_ITERS (25), PROF_ENV (laikago|hopper).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("PROF_BATCH", 8192))
ITERS = int(os.environ.get("PROF_ITERS", 25))
ENV = os.environ.get("PROF_ENV", "laikago")


def time_chunks(fn, carry, key, n_chunks=3):
    """bench.py protocol: two chained warmups, then timed chunks."""
    carry = jax.block_until_ready(fn(carry, key))
    key, k = jax.random.split(key)
    carry = jax.block_until_ready(fn(carry, k))
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        key, k = jax.random.split(key)
        carry = fn(carry, k)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / (n_chunks * ITERS * BATCH)


def env_step_variant(env_kwargs):
    """Build a jitted scanned full-env-step rollout; returns (fn, carry)."""
    from simgan_tpu.agents.networks import MLPPolicy, SplitPolicy, policy_act

    key = jax.random.PRNGKey(0)
    k_b, k_d, k_env = jax.random.split(key, 3)
    if ENV == "laikago":
        from simgan_tpu.envs.laikago_combined import (LaikagoCombinedConfig,
                                                      LaikagoCombinedEnv)
        behavior = MLPPolicy(action_dim=12, hidden=64)
        b_params = behavior.init(k_b, jnp.zeros((1, 111)))
        cfg = LaikagoCombinedConfig(act_noise=True, obs_noise=True,
                                    behavior_logstd=-1.3, **env_kwargs)
        env = LaikagoCombinedEnv(cfg, behavior_model=behavior,
                                 behavior_params=b_params)
        num_feet = 4
    else:
        from simgan_tpu.envs.hopper_combined import (HopperCombinedConfig,
                                                     HopperCombinedEnv)
        behavior = MLPPolicy(action_dim=3, hidden=64)
        b_params = behavior.init(k_b, jnp.zeros((1, 11)))
        env = HopperCombinedEnv(
            HopperCombinedConfig(act_noise=True, obs_noise=True,
                                 behavior_logstd=-1.3, **env_kwargs),
            behavior_model=behavior, behavior_params=b_params)
        num_feet = 1
    dyn = SplitPolicy(num_feet=num_feet, hidden=100)
    d_params = dyn.init(k_d, jnp.zeros((1, env.obs_dim)))
    states, obs = jax.jit(jax.vmap(env.reset))(
        jax.random.split(k_env, BATCH))

    @jax.jit
    def chunk(carry, key):
        def body(c, k):
            states, obs = c
            _, action, _ = policy_act(dyn, d_params, obs, k)
            s = jax.vmap(env.step)(states, action)
            return (s.state, s.obs), None
        return jax.lax.scan(body, carry, jax.random.split(key, ITERS))[0]

    return chunk, (states, obs), env


def physics_only(env):
    """Raw control_step scan on the same system/params — no nets, no obs."""
    from simgan_tpu.physics.engine import control_step

    sys_ = env.sys
    phys_cfg = env.phys_cfg
    states, _ = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(3), BATCH))
    phys = states.phys
    dp_one = jax.tree.map(lambda x: x[0], states.dp)
    na = len(sys_.actuated)          # fixed-base hopper: nv==6 but 3 motors

    @jax.jit
    def chunk(carry, key):
        def body(phys, k):
            torque = jax.random.uniform(k, (BATCH, na), minval=-5., maxval=5.)
            out = jax.vmap(lambda p, t: control_step(
                sys_, dp_one, p, t, phys_cfg, 10))(phys, torque)
            return out, None
        return jax.lax.scan(body, carry, jax.random.split(key, ITERS))[0]

    return chunk, phys


def nets_only(env):
    from simgan_tpu.agents.networks import MLPPolicy, SplitPolicy, policy_act

    num_feet = 4 if ENV == "laikago" else 1
    bdim, adim = (111, 12) if ENV == "laikago" else (11, 3)
    key = jax.random.PRNGKey(1)
    dyn = SplitPolicy(num_feet=num_feet, hidden=100)
    d_params = dyn.init(key, jnp.zeros((1, env.obs_dim)))
    beh = MLPPolicy(action_dim=adim, hidden=64)
    b_params = beh.init(key, jnp.zeros((1, bdim)))

    @jax.jit
    def chunk(obs, key):
        def body(obs, k):
            k1, k2 = jax.random.split(k)
            _, a, _ = policy_act(dyn, d_params, obs[:, :env.obs_dim], k1)
            _, b, _ = policy_act(beh, b_params, obs[:, :bdim], k2)
            return obs + 1e-6 * jnp.sum(a + 0.0 * jnp.sum(b)), None
        return jax.lax.scan(body, obs, jax.random.split(key, ITERS))[0]

    return chunk, jnp.zeros((BATCH, max(env.obs_dim, bdim)))


def main():
    key = jax.random.PRNGKey(7)
    rows = {}

    def add(name, fn, carry):
        rows[name] = time_chunks(fn, carry, key)
        print(f"  [{name}] {rows[name] * 1e6:.3f} us/env-step", flush=True)

    fn, carry, env = env_step_variant({})
    add("full_step", fn, carry)

    # solver A/B at the bench shape (PROF_SOLVERS=pgs_pallas,staged ...)
    for sv in [s for s in os.environ.get("PROF_SOLVERS", "").split(",") if s]:
        fn, carry, _ = env_step_variant({"solver": sv})
        add(f"solver_{sv}", fn, carry)

    for it in (0, 1):
        fn, carry, _ = env_step_variant({"solver_iterations": it})
        add(f"solver_iter{it}", fn, carry)

    # PROF_SPD=1: the M_eff^-1 Mosaic kernel (ops/spd_pallas.py) A/B, alone
    # and combined with the PGS kernel / with the solve DCE'd (to read the
    # kernel's effect on the non-contact base directly)
    if os.environ.get("PROF_SPD", ""):
        fn, carry, _ = env_step_variant({"spd_pallas": True})
        add("spd_pallas", fn, carry)
        fn, carry, _ = env_step_variant({"spd_pallas": True,
                                         "solver_iterations": 0})
        add("spd_pallas_iter0", fn, carry)
        fn, carry, _ = env_step_variant({"spd_pallas": True,
                                         "solver": "pgs_pallas"})
        add("spd+pgs_pallas", fn, carry)

    # PROF_MATFREE=1: the matrix-free PGS kernel (ops/pgs_matfree_pallas.py)
    # alone and combined with the SPD-inverse kernel
    if os.environ.get("PROF_MATFREE", ""):
        fn, carry, _ = env_step_variant({"solver": "pgs_matfree"})
        add("pgs_matfree", fn, carry)
        fn, carry, _ = env_step_variant({"solver": "pgs_matfree",
                                         "spd_pallas": True})
        add("spd+pgs_matfree", fn, carry)

    fn, carry = physics_only(env)
    add("physics_only", fn, carry)

    fn, carry = nets_only(env)
    add("nets_only", fn, carry)

    trace_dir = os.environ.get("SIMGAN_TRACE_DIR", "")
    if trace_dir:
        fn, carry, _ = env_step_variant({})
        carry = jax.block_until_ready(fn(carry, key))
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(fn(carry, key))
        print("trace written to", trace_dir, flush=True)

    full = rows["full_step"]
    print(f"\n== {ENV} hybrid step attribution @B={BATCH} (us/env-step)")
    for k, v in rows.items():
        print(f"  {k:14s} {v * 1e6:8.3f} us  ({v / full * 100:5.1f}% of full)",
              flush=True)
    print(f"  derived: pgs_sweeps={ (full - rows['solver_iter0']) * 1e6:.3f} us, "
          f"plumbing~={(full - rows['physics_only'] - rows['nets_only']) * 1e6:.3f} us, "
          f"steps/s/chip={1.0 / full:,.0f}", flush=True)


if __name__ == "__main__":
    main()
