"""RL-stack tests: distributions, GAE, PPO learning, GAIL discriminator,
running stats, checkpoint roundtrip."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.agents import gail, networks
from simgan_tpu.agents.gail import GailConfig
from simgan_tpu.agents.networks import Discriminator, MLPPolicy, SplitPolicy
from simgan_tpu.agents.ppo import Batch, PPOConfig, compute_gae, make_optimizer, ppo_update
from simgan_tpu.agents.running_stats import RunningMeanStd
from simgan_tpu.train import checkpoints


def test_normal_log_prob_matches_scipy():
    from scipy import stats
    rng = np.random.RandomState(0)
    mean = jnp.asarray(rng.randn(4, 3), dtype=jnp.float32)
    logstd = jnp.asarray(rng.randn(4, 3) * 0.3, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(4, 3), dtype=jnp.float32)
    lp = networks.normal_log_prob(mean, logstd, x)
    ref = stats.norm.logpdf(np.array(x), np.array(mean), np.exp(np.array(logstd))).sum(-1)
    np.testing.assert_allclose(lp, ref, rtol=1e-4)
    ent = networks.normal_entropy(logstd)
    ref_e = stats.norm.entropy(np.array(mean), np.exp(np.array(logstd))).sum(-1)
    np.testing.assert_allclose(ent, ref_e, rtol=1e-4)


def test_policy_shapes_and_logstd_init():
    m = MLPPolicy(action_dim=3, hidden=64)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 11)))
    v, mean, logstd = m.apply(p, jnp.zeros((5, 11)))
    assert v.shape == (5,) and mean.shape == (5, 3)
    np.testing.assert_allclose(logstd, -0.5, atol=1e-6)   # AddBias init -0.5
    # mean head near zero at init (orthogonal/50)
    assert float(jnp.max(jnp.abs(mean))) < 0.5

    p2 = networks.reset_logstd(m, p, -1.3)
    _, _, ls2 = m.apply(p2, jnp.zeros((1, 11)))
    np.testing.assert_allclose(ls2, -1.3, atol=1e-6)


def test_split_policy_heads():
    m = SplitPolicy(num_feet=4, hidden=100)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64)))
    v, mean, logstd = m.apply(p, jnp.zeros((2, 64)))
    assert mean.shape == (2, 28)        # 16 contact + 12 actuator
    # state-dependent logstd head biased to -0.5 at zero input
    np.testing.assert_allclose(logstd, -0.5, atol=1e-5)


def test_reset_critic_keeps_actor():
    m = MLPPolicy(action_dim=3, hidden=32)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 11)))
    p2 = networks.reset_critic(m, p, jax.random.PRNGKey(1), 11)
    x = jnp.ones((1, 11))
    _, mean1, _ = m.apply(p, x)
    v2, mean2, _ = m.apply(p2, x)
    v1, _, _ = m.apply(p, x)
    np.testing.assert_allclose(mean1, mean2, atol=1e-6)    # actor unchanged
    # critic re-initialized: same input, (almost surely) different value
    assert abs(float(v1[0] - v2[0])) > 1e-8


def test_gae_matches_reference_loop():
    """compute_gae == the torch double-loop in storage.compute_returns."""
    rng = np.random.RandomState(0)
    T, N = 12, 3
    rewards = rng.randn(T, N).astype(np.float32)
    values = rng.randn(T, N).astype(np.float32)
    next_value = rng.randn(N).astype(np.float32)
    masks = (rng.rand(T, N) > 0.2).astype(np.float32)
    bad_masks = np.ones((T, N), dtype=np.float32)
    bad_masks[masks == 0] = rng.choice([0.0, 1.0], size=(masks == 0).sum())
    gamma, lam = 0.99, 0.95

    # reference loop (storage.py:109-120); index shift: masks[t] here is the
    # reference's masks[t+1]
    v = np.concatenate([values, next_value[None]], axis=0)
    returns_ref = np.zeros((T, N), dtype=np.float32)
    gae = np.zeros(N, dtype=np.float32)
    for t in reversed(range(T)):
        delta = rewards[t] + gamma * v[t + 1] * masks[t] - v[t]
        gae = delta + gamma * lam * masks[t] * gae
        gae = gae * bad_masks[t]
        returns_ref[t] = gae + v[t]

    out = compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                      jnp.asarray(next_value), jnp.asarray(masks),
                      jnp.asarray(bad_masks), gamma, lam, True)
    np.testing.assert_allclose(out, returns_ref, rtol=1e-4, atol=1e-5)


def test_ppo_learns_simple_target():
    """PPO pushes the action mean toward high-advantage actions."""
    m = MLPPolicy(action_dim=1, hidden=32)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))
    cfg = PPOConfig(ppo_epoch=8, num_mini_batch=4, lr=1e-2, entropy_coef=0.0)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)
    for i in range(20):
        obs = jnp.asarray(rng.randn(256, 2), dtype=jnp.float32)
        _, mean, logstd = m.apply(params, obs)
        key, k = jax.random.split(key)
        actions = networks.normal_sample(k, mean, logstd)
        logp = networks.normal_log_prob(mean, logstd, actions)
        # advantage: positive when action > 0 (target: push mean up)
        adv = jnp.sign(actions[:, 0])
        batch = Batch(obs=obs, actions=actions,
                      value_preds=jnp.zeros(256), returns=jnp.zeros(256),
                      old_log_probs=logp, advantages=adv)
        key, k = jax.random.split(key)
        params, opt_state, stats = ppo_update(m, params, opt_state, tx, batch, k, cfg)
    _, mean, _ = m.apply(params, jnp.zeros((1, 2)))
    assert float(mean[0, 0]) > 0.3, float(mean[0, 0])


def test_ppo_tiny_batch_finite_stats():
    """A rollout smaller than num_mini_batch (smoke shapes) must clamp the
    minibatch count rather than produce empty minibatches -> nan stats."""
    m = MLPPolicy(action_dim=1, hidden=16)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))
    cfg = PPOConfig(ppo_epoch=2, num_mini_batch=32, lr=1e-3)  # n=16 < 32
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    obs = jnp.asarray(np.random.RandomState(0).randn(16, 2), dtype=jnp.float32)
    _, mean, logstd = m.apply(params, obs)
    actions = networks.normal_sample(jax.random.PRNGKey(1), mean, logstd)
    logp = networks.normal_log_prob(mean, logstd, actions)
    batch = Batch(obs=obs, actions=actions,
                  value_preds=jnp.zeros(16), returns=jnp.ones(16),
                  old_log_probs=logp, advantages=jnp.ones(16))
    _, _, stats = ppo_update(m, params, opt_state, tx, batch,
                             jax.random.PRNGKey(2), cfg)
    for k, v in stats.items():
        assert np.isfinite(float(v)), (k, v)


def test_gail_discriminator_separates():
    cfg = GailConfig(hidden=32, batch_size=64, epochs=5)
    model, tx, state = gail.create(jax.random.PRNGKey(0), feat_dim=4, num_envs=2, cfg=cfg)
    rng = np.random.RandomState(0)
    expert = jnp.asarray(rng.randn(512, 4) + 2.0, dtype=jnp.float32)
    policy = jnp.asarray(rng.randn(512, 4) - 2.0, dtype=jnp.float32)
    for i in range(5):
        state, stats = gail.update(model, tx, state, expert, policy,
                                   jax.random.PRNGKey(i), cfg)
    d_e = jax.nn.sigmoid(model.apply(state.params, expert)).mean()
    d_p = jax.nn.sigmoid(model.apply(state.params, policy)).mean()
    assert float(d_e) > 0.8 and float(d_p) < 0.2

    # reward: expert-like rows get positive log D - log(1-D)
    feats = jnp.stack([expert[:8], policy[:8]], axis=1)  # (T=8, N=2, 4)... shape (8,2,4)
    masks = jnp.ones((8, 2))
    state, rewards, returns = gail.predict_reward(model, state, feats, masks, 0.99, 0.0)
    assert float(rewards[:, 0].mean()) > 0 > float(rewards[:, 1].mean())


def test_gail_d_ensemble():
    """--d-ensemble framework extension: K members separate like a single D,
    the combined reward is the member mean, and the K=1 ensemble path matches
    the reference single-D path exactly (same params -> same rewards)."""
    cfg = GailConfig(hidden=32, batch_size=64, epochs=3)
    K = 3
    model, tx, state = gail.create_ensemble(
        jax.random.PRNGKey(0), feat_dim=4, num_envs=2, cfg=cfg, n_members=K)
    assert jax.tree.leaves(state.params)[0].shape[0] == K

    rng = np.random.RandomState(0)
    expert = jnp.asarray(rng.randn(K, 256, 4) + 2.0, dtype=jnp.float32)
    policy = jnp.asarray(rng.randn(256, 4) - 2.0, dtype=jnp.float32)
    for i in range(5):
        state, stats = gail.update_ensemble(model, tx, state, expert, policy,
                                            jax.random.PRNGKey(i), cfg)
    assert stats["gail_loss"].shape == ()

    feats = jnp.stack([expert[0, :8], policy[:8]], axis=1)   # (8, 2, 4)
    masks = jnp.ones((8, 2))
    state, rewards, returns = gail.predict_reward_ensemble(
        model, state, feats, masks, 0.99, 0.0)
    assert float(rewards[:, 0].mean()) > 0 > float(rewards[:, 1].mean())
    # the running-return carry is identical across member slots
    np.testing.assert_array_equal(np.asarray(state.returns),
                                  np.tile(np.asarray(state.returns[0]), (K, 1)))

    # K=1 equivalence: ensemble predict == single predict on the same params
    m1, tx1, s1 = gail.create(jax.random.PRNGKey(7), 4, 2, cfg)
    se = gail.DiscriminatorState(
        params=jax.tree.map(lambda x: x[None], s1.params),
        opt_state=jax.tree.map(lambda x: x[None] if hasattr(x, "ndim") else x,
                               s1.opt_state),
        returns=s1.returns[None])
    _, r_single, _ = gail.predict_reward(m1, s1, feats, masks, 0.99, 0.5)
    _, r_ens, _ = gail.predict_reward_ensemble(m1, se, feats, masks, 0.99, 0.5)
    np.testing.assert_allclose(np.asarray(r_single), np.asarray(r_ens),
                               rtol=1e-6)


def test_running_mean_std():
    rms = RunningMeanStd.create()
    rng = np.random.RandomState(0)
    chunks = [rng.randn(100) * 3 + 5 for _ in range(10)]
    for c in chunks:
        rms = rms.update(jnp.asarray(c))
    allc = np.concatenate(chunks)
    np.testing.assert_allclose(float(rms.mean), allc.mean(), atol=1e-3)
    np.testing.assert_allclose(float(rms.var), allc.var(), rtol=1e-3)


def test_checkpoint_roundtrip_and_ensemble():
    with tempfile.TemporaryDirectory() as d:
        m = MLPPolicy(action_dim=3, hidden=16)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 11)))
        for it in (80, 100):
            checkpoints.save_policy(d, "TestEnv-v0", m, p, iter_num=it)
        checkpoints.save_policy(d, "TestEnv-v0", m, p)
        m2, p2 = checkpoints.load_policy(d, "TestEnv-v0")
        x = jnp.ones((2, 11))
        np.testing.assert_allclose(m.apply(p, x)[1], m2.apply(p2, x)[1], atol=1e-6)

        m3, stacked = checkpoints.load_ensemble(d, "TestEnv-v0", [80, 100])
        leaves = jax.tree.leaves(stacked)
        assert all(l.shape[0] == 2 for l in leaves)
        member = jax.tree.map(lambda x: x[0], stacked)
        np.testing.assert_allclose(m.apply(p, x)[1], m3.apply(member, x)[1], atol=1e-6)


def test_cross_ensemble_load():
    """load_cross_ensemble stacks the SAME iteration from several runs
    (bagging-style refinement ensemble, framework extension)."""
    with tempfile.TemporaryDirectory() as d:
        m = MLPPolicy(action_dim=3, hidden=16)
        dirs, params = [], []
        for s in range(3):
            p = m.init(jax.random.PRNGKey(s), jnp.zeros((1, 11)))
            run_dir = f"{d}/run{s}"
            checkpoints.save_policy(run_dir, "TestEnv-v0", m, p, iter_num=475)
            dirs.append(run_dir)
            params.append(p)
        m2, stacked = checkpoints.load_cross_ensemble(dirs, "TestEnv-v0", 475)
        leaves = jax.tree.leaves(stacked)
        assert all(l.shape[0] == 3 for l in leaves)
        x = jnp.ones((2, 11))
        for s in range(3):
            member = jax.tree.map(lambda a: a[s], stacked)
            np.testing.assert_allclose(m.apply(params[s], x)[1],
                                       m2.apply(member, x)[1], atol=1e-6)
