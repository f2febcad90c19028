"""Finite deform-mattress extent (VERDICT r2 item 6).

The reference mattress is a 20 m cube: cube_fat.obj spans +-0.5 in x/y,
scale 20, basePosition [7,0,-5.05] (hopper, hopper_env_v3.py:143-145) /
[7,0,-5] (laikago, laikago_env_v4.py:177-179) => soft floor only for
x in [-3, 17]; beyond the edge the robot falls toward the backup hard plane
10 m down.  These tests check the per-geom floor switch in
physics/contact.py and the env wiring.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.envs.hopper_env import HopperConfig, HopperEnv


def _roll(env, state, n=40):
    def body(s, _):
        step = env.step(s, jnp.zeros(env.act_dim))
        return step.state, (step.state.phys.q, step.done)
    return jax.lax.scan(body, state, None, length=n)


def test_hopper_edge_crossing_loses_support():
    """Same initial state, teleported inside vs outside the mattress edge:
    inside stays supported near the surface; outside free-falls toward the
    z=-10.1 backup plane and the episode terminates."""
    env = HopperEnv(HopperConfig(deform_floor_env=True, init_noise=False,
                                 act_noise=False, obs_noise=False))
    key = jax.random.PRNGKey(0)
    state, _ = env.reset(key)

    # teleport: q[0] is root x (prismatic). edge at x=17.
    s_in = state.replace(phys=state.phys.replace(q=state.phys.q.at[0].set(16.0)))
    s_out = state.replace(phys=state.phys.replace(q=state.phys.q.at[0].set(18.0)))

    roll = jax.jit(lambda s: _roll(env, s))
    (_, (q_in, done_in)) = roll(s_in)
    (_, (q_out, done_out)) = roll(s_out)

    # inside: height (1.3 + q[1]) stays near standing
    h_in = 1.3 + np.asarray(q_in)[:, 1]
    h_out = 1.3 + np.asarray(q_out)[:, 1]
    assert h_in.min() > 0.5, h_in.min()
    # outside: free fall -- after 40 control steps (0.8 s) dropped > 2 m
    assert h_out[-1] < -1.0, h_out[-1]
    assert bool(np.asarray(done_out).any())
    assert not bool(np.asarray(done_in).any())


def test_mattress_off_flag_restores_infinite_floor():
    env = HopperEnv(HopperConfig(deform_floor_env=True, finite_mattress=False,
                                 init_noise=False, act_noise=False,
                                 obs_noise=False))
    state, _ = env.reset(jax.random.PRNGKey(0))
    s_out = state.replace(phys=state.phys.replace(q=state.phys.q.at[0].set(25.0)))
    _, (q, done) = jax.jit(lambda s: _roll(env, s))(s_out)
    h = 1.3 + np.asarray(q)[:, 1]
    assert h.min() > 0.5, h.min()   # still supported far past x=17


def test_source_env_unaffected():
    """combine='bullet' (source env) ignores the mattress fields entirely."""
    env = HopperEnv(HopperConfig(init_noise=False, act_noise=False,
                                 obs_noise=False))
    state, _ = env.reset(jax.random.PRNGKey(0))
    s_far = state.replace(phys=state.phys.replace(q=state.phys.q.at[0].set(100.0)))
    _, (q, _) = jax.jit(lambda s: _roll(env, s))(s_far)
    h = 1.3 + np.asarray(q)[:, 1]
    assert h.min() > 0.5, h.min()
