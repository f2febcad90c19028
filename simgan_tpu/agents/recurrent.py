"""Recurrent (GRU) policy support — the reference's --recurrent-policy path.

Reference: third_party/a2c_ppo_acktr/model.py:117-201 (NNBase with GRU,
mask-gated hidden state, sequence-chunked forward between episode
boundaries) and storage.py:194-251 (recurrent_generator yielding whole env
sequences per minibatch).

Here the GRU runs under ``lax.scan`` with the same mask gating
(h <- h * mask before each cell step), and the recurrent PPO update
shuffles *env indices* into minibatches of full (T,) sequences — the exact
semantics of the reference's recurrent generator without the host-side
zero-segment bookkeeping (scan handles per-step masks natively).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from simgan_tpu.agents import networks
from simgan_tpu.agents.networks import _Trunk, _ortho
from simgan_tpu.agents.ppo import PPOConfig


class GRUPolicy(nn.Module):
    """Gaussian actor-critic over a GRU backbone (MLPBase(recurrent=True))."""

    action_dim: int
    hidden: int = 64

    def setup(self):
        self.gru = nn.GRUCell(features=self.hidden,
                              kernel_init=_ortho(1.0),
                              recurrent_kernel_init=_ortho(1.0),
                              bias_init=nn.initializers.zeros)
        self.actor = _Trunk(self.hidden)
        self.critic = _Trunk(self.hidden)
        self.critic_linear = nn.Dense(1, kernel_init=_ortho(1.0),
                                      bias_init=nn.initializers.zeros)
        self.fc_mean = nn.Dense(self.action_dim, kernel_init=_ortho(1.0 / 50.0),
                                bias_init=nn.initializers.zeros)
        self.logstd = self.param("logstd", nn.initializers.constant(-0.5),
                                 (self.action_dim,))

    def step(self, hxs, obs, mask):
        """One cell step: gate hidden by mask (zero at episode starts)."""
        hxs = hxs * mask[..., None]
        new_hxs, out = self.gru(hxs, obs)
        value = self.critic_linear(self.critic(out))[..., 0]
        mean = self.fc_mean(self.actor(out))
        logstd = jnp.broadcast_to(self.logstd, mean.shape)
        return new_hxs, (value, mean, logstd)

    def sequence(self, hxs0, obs_seq, mask_seq):
        """Scan over a (T, ..., obs) sequence with per-step masks."""

        def body(h, xm):
            o, m = xm
            h, out = self.step(h, o, m)
            return h, out

        return jax.lax.scan(body, hxs0, (obs_seq, mask_seq))

    def __call__(self, hxs, obs, mask):
        return self.step(hxs, obs, mask)


def init_gru_policy(key, action_dim, obs_dim, hidden=64):
    model = GRUPolicy(action_dim=action_dim, hidden=hidden)
    params = model.init(key, jnp.zeros((1, hidden)), jnp.zeros((1, obs_dim)),
                        jnp.ones((1,)))
    return model, params


def zero_hidden(num_envs: int, hidden: int):
    return jnp.zeros((num_envs, hidden))


def gru_act(model, params, hxs, obs, mask, key=None, deterministic=False):
    """(value, action, log_prob, new_hxs) — reference Policy.act recurrent."""
    new_hxs, (value, mean, logstd) = model.apply(params, hxs, obs, mask)
    if deterministic or key is None:
        action = mean
    else:
        action = networks.normal_sample(key, mean, logstd)
    return value, action, networks.normal_log_prob(mean, logstd, action), new_hxs


def collect_recurrent(venv, model, params, carry, hxs, num_steps: int):
    """Rollout with hidden-state threading (recurrent analog of
    agents.rollout.collect).  Returns (carry, hxs, traj-dict of (T,N,...))
    including the per-step pre-update hidden-gate masks and the initial
    hidden state for sequence replays."""
    from simgan_tpu.agents.rollout import RolloutCarry, Transition

    hxs0 = hxs

    def body(c, _):
        (rc, hxs, prev_mask) = c
        key, k_act = jax.random.split(rc.key)
        value, action, log_prob, new_hxs = gru_act(
            model, params, hxs, rc.obs, prev_mask, k_act)
        s = venv.step(rc.states, action)
        if rc.reward_norm is not None:
            rn, reward = rc.reward_norm(s.reward, s.done)
        else:
            rn, reward = None, s.reward
        t = Transition(
            obs=rc.obs, action=action, log_prob=log_prob, value=value,
            reward=reward, raw_reward=s.reward,
            mask=1.0 - s.done.astype(jnp.float32),
            bad_mask=1.0 - s.truncated.astype(jnp.float32),
            feat=jnp.zeros((action.shape[0], 0)),
            ep_return=s.metrics["episode_return"],
            ep_length=s.metrics["episode_length"], ep_done=s.done,
        )
        # the mask that gates the *next* step's hidden state
        next_mask = 1.0 - s.done.astype(jnp.float32)
        out = (t, prev_mask)
        return (RolloutCarry(s.state, s.obs, key, rn), new_hxs, next_mask), out

    N = hxs.shape[0]
    init_mask = jnp.ones(N)
    (rc, hxs, last_mask), (traj, gate_masks) = jax.lax.scan(
        body, (carry, hxs, init_mask), None, length=num_steps)
    return rc, hxs, last_mask, traj, gate_masks, hxs0


class RecurrentBatch(NamedTuple):
    """(T, N, ...) rollout tensors + initial hidden per env."""

    obs: jax.Array
    actions: jax.Array
    value_preds: jax.Array
    returns: jax.Array
    old_log_probs: jax.Array
    advantages: jax.Array
    masks: jax.Array       # (T, N) 1 - done_prev (gates hidden at ep starts)
    hxs0: jax.Array        # (N, H)


def recurrent_ppo_update(model, params, opt_state, tx, batch: RecurrentBatch,
                         key, cfg: PPOConfig):
    """PPO over sequence minibatches (reference recurrent_generator)."""
    T, N = batch.obs.shape[:2]
    adv = batch.advantages
    adv = (adv - adv.mean()) / (adv.std() + 1e-5)
    batch = batch._replace(advantages=adv)
    envs_per_mb = max(N // cfg.num_mini_batch, 1)
    n_mb = N // envs_per_mb

    def loss_fn(p, mb: RecurrentBatch):
        _, (value, mean, logstd) = model.apply(
            p, mb.hxs0, mb.obs, mb.masks, method=GRUPolicy.sequence)
        log_prob = networks.normal_log_prob(mean, logstd, mb.actions)
        entropy = networks.normal_entropy(logstd)
        ratio = jnp.exp(log_prob - mb.old_log_probs)
        surr1 = ratio * mb.advantages
        surr2 = jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param) * mb.advantages
        action_loss = -jnp.mean(jnp.minimum(surr1, surr2))
        v_clip = mb.value_preds + jnp.clip(value - mb.value_preds,
                                           -cfg.clip_param, cfg.clip_param)
        value_loss = 0.5 * jnp.mean(jnp.maximum(
            jnp.square(value - mb.returns), jnp.square(v_clip - mb.returns)))
        ent = jnp.mean(entropy)
        total = value_loss * cfg.value_loss_coef + action_loss - ent * cfg.entropy_coef
        return total, (value_loss, action_loss, ent)

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def epoch(carry, key_e):
        params, opt_state = carry
        perm = jax.random.permutation(key_e, N)[: n_mb * envs_per_mb]
        idxs = perm.reshape(n_mb, envs_per_mb)

        def mb_body(carry, idx):
            params, opt_state = carry
            mb = RecurrentBatch(
                obs=batch.obs[:, idx], actions=batch.actions[:, idx],
                value_preds=batch.value_preds[:, idx],
                returns=batch.returns[:, idx],
                old_log_probs=batch.old_log_probs[:, idx],
                advantages=batch.advantages[:, idx],
                masks=batch.masks[:, idx], hxs0=batch.hxs0[idx],
            )
            grads, aux = grad_fn(params, mb)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), jnp.stack(list(aux))

        (params, opt_state), stats = jax.lax.scan(mb_body, (params, opt_state), idxs)
        return (params, opt_state), stats

    keys = jax.random.split(key, cfg.ppo_epoch)
    (params, opt_state), stats = jax.lax.scan(epoch, (params, opt_state), keys)
    vl, al, ent = jnp.mean(stats, axis=(0, 1))
    return params, opt_state, {"value_loss": vl, "action_loss": al, "dist_entropy": ent}
