"""KFAC / ACKTR tests."""

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.agents import kfac, networks
from simgan_tpu.agents.a2c import acktr_update
from simgan_tpu.agents.networks import MLPPolicy
from simgan_tpu.agents.ppo import Batch


def test_kfac_preconditioner_improves_toy_objective():
    m = MLPPolicy(action_dim=2, hidden=32)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 6)))
    state = kfac.KFACState.create(params, 6)
    cfg = kfac.KFACConfig(lr=0.1)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, state, obs, key):
        def loss(p):
            v, mean, _ = m.apply(p, obs)
            target = jnp.sign(obs[:, :1]) * jnp.ones((obs.shape[0], 2))
            return jnp.mean(jnp.square(mean - target)) + 0.5 * jnp.mean(jnp.square(v - 1.0))
        grads = jax.grad(loss)(params)
        return kfac.kfac_update(m, params, state, obs, grads, key, cfg)

    for _ in range(30):
        obs = jnp.asarray(rng.randn(128, 6), dtype=jnp.float32)
        key, k = jax.random.split(key)
        params, state = step(params, state, obs, k)
    _, mean, _ = m.apply(params, jnp.ones((1, 6)))
    assert float(mean[0, 0]) > 0.3


def test_kfac_probe_forward_matches_model():
    m = MLPPolicy(action_dim=3, hidden=16)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 5)))
    obs = jnp.asarray(np.random.RandomState(0).randn(4, 5), dtype=jnp.float32)
    probes = kfac._zero_probes(params, 4)
    v1, mean1, logstd1, _ = kfac._forward(params, probes, obs)
    v2, mean2, logstd2 = m.apply(params, obs)
    np.testing.assert_allclose(v1, v2, atol=1e-6)
    np.testing.assert_allclose(mean1, mean2, atol=1e-6)


def test_acktr_update_runs():
    m = MLPPolicy(action_dim=2, hidden=16)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    state = kfac.KFACState.create(params, 4)
    rng = np.random.RandomState(1)
    obs = jnp.asarray(rng.randn(64, 4), dtype=jnp.float32)
    _, mean, logstd = m.apply(params, obs)
    actions = mean
    logp = networks.normal_log_prob(mean, logstd, actions)
    batch = Batch(obs=obs, actions=actions, value_preds=jnp.zeros(64),
                  returns=jnp.asarray(rng.randn(64), dtype=jnp.float32),
                  old_log_probs=logp, advantages=jnp.zeros(64))
    p2, s2, stats = acktr_update(m, params, state, batch, jax.random.PRNGKey(2))
    assert int(s2.steps) == 1
    assert np.isfinite(float(stats["value_loss"]))
    assert any(float(jnp.max(jnp.abs(a - b))) > 0
               for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)))
