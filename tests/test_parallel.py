"""Sharding tests: the data-parallel update over an 8-device CPU mesh must
match the single-device result (same program, different partitioning)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simgan_tpu.agents.networks import MLPPolicy
from simgan_tpu.agents.ppo import Batch, PPOConfig, make_optimizer, ppo_update
from simgan_tpu.parallel.mesh import env_sharding, make_mesh, replicated


def test_mesh_has_8_devices():
    assert len(jax.devices()) >= 8, jax.devices()
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)


def test_sharded_ppo_update_matches_single_device():
    model = MLPPolicy(action_dim=3, hidden=32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 11)))
    cfg = PPOConfig(ppo_epoch=2, num_mini_batch=2)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    rng = np.random.RandomState(0)
    n = 256
    obs = jnp.asarray(rng.randn(n, 11), dtype=jnp.float32)
    _, mean, logstd = model.apply(params, obs)
    actions = mean + 0.1
    from simgan_tpu.agents import networks
    logp = networks.normal_log_prob(mean, logstd, actions)
    batch = Batch(obs=obs, actions=actions,
                  value_preds=jnp.zeros(n), returns=jnp.asarray(rng.randn(n), dtype=jnp.float32),
                  old_log_probs=logp, advantages=jnp.asarray(rng.randn(n), dtype=jnp.float32))
    key = jax.random.PRNGKey(7)

    p1, _, s1 = jax.jit(ppo_update, static_argnums=(0, 3, 6))(
        model, params, opt_state, tx, batch, key, cfg)

    mesh = make_mesh(8)
    sh = env_sharding(mesh)
    rep = replicated(mesh)
    batch_sharded = jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    params_r = jax.device_put(params, rep)
    opt_r = jax.device_put(opt_state, rep)
    p2, _, s2 = jax.jit(ppo_update, static_argnums=(0, 3, 6))(
        model, params_r, opt_r, tx, batch_sharded, key, cfg)

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b, atol=2e-5)
    np.testing.assert_allclose(float(s1["value_loss"]), float(s2["value_loss"]), atol=1e-5)


def test_vmapped_env_shards_over_mesh():
    """Env rollout with the batch axis sharded over 8 devices runs and
    matches the unsharded rollout."""
    from simgan_tpu.envs.hopper_env import HopperConfig, HopperEnv

    env = HopperEnv(HopperConfig())
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    states, obs = jax.jit(jax.vmap(env.reset))(keys)
    actions = jnp.tile(jnp.array([0.1, -0.2, 0.3]), (16, 1))

    step = jax.jit(lambda s, a: jax.vmap(env.step)(s, a))
    ref = step(states, actions)

    mesh = make_mesh(8)
    sh = env_sharding(mesh)
    states_sh = jax.tree.map(lambda x: jax.device_put(x, sh), states)
    out = step(states_sh, jax.device_put(actions, sh))
    np.testing.assert_allclose(ref.obs, out.obs, atol=1e-5)
    np.testing.assert_allclose(ref.reward, out.reward, atol=1e-5)
