"""Tests for the GRU recurrent policy path and discrete heads."""

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.agents import networks, recurrent
from simgan_tpu.agents.ppo import PPOConfig, make_optimizer


def test_gru_policy_shapes_and_mask_gating():
    model, params = recurrent.init_gru_policy(jax.random.PRNGKey(0), 3, 11, hidden=32)
    h = recurrent.zero_hidden(4, 32)
    obs = jnp.ones((4, 11))
    v, a, lp, h1 = recurrent.gru_act(model, params, h, obs, jnp.ones(4),
                                     jax.random.PRNGKey(1))
    assert v.shape == (4,) and a.shape == (4, 3) and h1.shape == (4, 32)
    # with mask 0 the hidden is reset: output equals fresh-hidden output
    v0, a0, _, _ = recurrent.gru_act(model, params, h1, obs, jnp.zeros(4),
                                     deterministic=True)
    vf, af, _, _ = recurrent.gru_act(model, params, recurrent.zero_hidden(4, 32),
                                     obs, jnp.ones(4), deterministic=True)
    np.testing.assert_allclose(a0, af, atol=1e-6)

    # hidden carries information: same obs, different history -> different out
    v2, a2, _, _ = recurrent.gru_act(model, params, h1, obs, jnp.ones(4),
                                     deterministic=True)
    assert float(jnp.max(jnp.abs(a2 - af))) > 1e-7


def test_gru_sequence_matches_steps():
    model, params = recurrent.init_gru_policy(jax.random.PRNGKey(0), 2, 5, hidden=16)
    T, N = 7, 3
    rng = np.random.RandomState(0)
    obs = jnp.asarray(rng.randn(T, N, 5), dtype=jnp.float32)
    masks = jnp.asarray((rng.rand(T, N) > 0.3).astype(np.float32))
    h0 = recurrent.zero_hidden(N, 16)

    _, (v_seq, mean_seq, _) = model.apply(params, h0, obs, masks,
                                          method=recurrent.GRUPolicy.sequence)
    # step-by-step
    h = h0
    for t in range(T):
        h, (v, mean, _) = model.apply(params, h, obs[t], masks[t])
        np.testing.assert_allclose(v, v_seq[t], atol=1e-5)
        np.testing.assert_allclose(mean, mean_seq[t], atol=1e-5)


def test_recurrent_ppo_update_runs():
    model, params = recurrent.init_gru_policy(jax.random.PRNGKey(0), 2, 5, hidden=16)
    cfg = PPOConfig(ppo_epoch=2, num_mini_batch=2)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    T, N = 8, 4
    rng = np.random.RandomState(1)
    obs = jnp.asarray(rng.randn(T, N, 5), dtype=jnp.float32)
    masks = jnp.ones((T, N))
    h0 = recurrent.zero_hidden(N, 16)
    _, (v, mean, logstd) = model.apply(params, h0, obs, masks,
                                       method=recurrent.GRUPolicy.sequence)
    actions = mean
    logp = networks.normal_log_prob(mean, logstd, actions)
    batch = recurrent.RecurrentBatch(
        obs=obs, actions=actions, value_preds=v,
        returns=jnp.asarray(rng.randn(T, N), dtype=jnp.float32),
        old_log_probs=logp,
        advantages=jnp.asarray(rng.randn(T, N), dtype=jnp.float32),
        masks=masks, hxs0=h0)
    p2, _, stats = recurrent.recurrent_ppo_update(
        model, params, opt_state, tx, batch, jax.random.PRNGKey(2), cfg)
    assert np.isfinite(float(stats["value_loss"]))
    assert any(float(jnp.max(jnp.abs(a - b))) > 0
               for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)))


def test_categorical_policy():
    from scipy import stats as sstats
    m = networks.CategoricalPolicy(num_actions=5, hidden=16)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    v, logits = m.apply(p, jnp.ones((3, 4)))
    assert logits.shape == (3, 5)
    acts = jnp.array([0, 3, 4])
    lp = networks.categorical_log_prob(logits, acts)
    ref = jax.nn.log_softmax(logits)
    np.testing.assert_allclose(lp[1], ref[1, 3], atol=1e-6)
    ent = networks.categorical_entropy(logits)
    assert np.all(np.asarray(ent) > 0)


def test_cnn_policy():
    """Nature-CNN base (reference model.py:204-230): 84x84 pixels -> the
    canonical 7x7x32 pre-FC feature map, finite value/logits, and a PPO-style
    gradient step moves the conv params."""
    m = networks.CNNPolicy(num_actions=6, hidden=512)
    obs = jnp.asarray(np.random.RandomState(0).randint(0, 255, (2, 84, 84, 4)),
                      dtype=jnp.uint8)
    p = m.init(jax.random.PRNGKey(0), obs)
    # 84x84 through 8s4/4s2/3s1 VALID convs is 7x7 (the reference's 32*7*7 FC)
    assert p["params"]["Dense_0"]["kernel"].shape[0] == 32 * 7 * 7
    v, logits = m.apply(p, obs)
    assert v.shape == (2,) and logits.shape == (2, 6)
    assert np.all(np.isfinite(np.asarray(logits)))

    def loss(params):
        v, lg = m.apply(params, obs)
        return jnp.mean(v**2) - jnp.mean(networks.categorical_entropy(lg))

    g = jax.grad(loss)(p)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in jax.tree.leaves(g))


def test_bernoulli_heads():
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 3), dtype=jnp.float32)
    acts = jnp.asarray((np.random.RandomState(1).rand(4, 3) > 0.5).astype(np.float32))
    lp = networks.bernoulli_log_prob(logits, acts)
    p = jax.nn.sigmoid(logits)
    ref = np.sum(np.where(np.asarray(acts) > 0.5, np.log(np.asarray(p)),
                          np.log(1 - np.asarray(p))), axis=-1)
    np.testing.assert_allclose(lp, ref, rtol=1e-4)
