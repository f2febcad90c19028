"""PPO: clipped surrogate + clipped value loss + entropy bonus, fully jitted.

Reference semantics: third_party/a2c_ppo_acktr/algo/ppo.py (loss terms,
Adam(eps=1e-5), grad-norm clip) and storage.py:103-142 (GAE with
proper-time-limit bad_masks).  The torch minibatch loop becomes a
``lax.scan`` over shuffled index blocks; the whole update is one XLA
program, so PPO epochs never leave the device.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from simgan_tpu.agents import networks


class PPOConfig(NamedTuple):
    clip_param: float = 0.2
    ppo_epoch: int = 10
    num_mini_batch: int = 32
    value_loss_coef: float = 0.5
    entropy_coef: float = 0.01
    lr: float = 3e-4
    eps: float = 1e-5
    max_grad_norm: float = 0.5
    gamma: float = 0.99
    gae_lambda: float = 0.95
    use_proper_time_limits: bool = True
    use_clipped_value_loss: bool = True
    symmetry_coef: float = 0.0


class Batch(NamedTuple):
    """Flattened rollout data (T*N, ...)."""

    obs: jax.Array
    actions: jax.Array
    value_preds: jax.Array
    returns: jax.Array
    old_log_probs: jax.Array
    advantages: jax.Array


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr, eps=cfg.eps),
    )


def compute_gae(
    rewards: jax.Array,      # (T, N)
    values: jax.Array,       # (T, N) V(s_t)
    next_value: jax.Array,   # (N,)   V(s_T)
    masks: jax.Array,        # (T, N) 0 where step t ended an episode
    bad_masks: jax.Array,    # (T, N) 0 where the end was a time-limit
    gamma: float,
    lam: float,
    use_proper_time_limits: bool = True,
) -> jax.Array:
    """Returns (T, N) return targets; mirrors storage.compute_returns.

    masks[t] / bad_masks[t] correspond to the reference's masks[t+1] (the
    done signal *produced by* step t)."""

    values_tp1 = jnp.concatenate([values[1:], next_value[None]], axis=0)

    def body(gae, xs):
        r, v, v1, m, bm = xs
        delta = r + gamma * v1 * m - v
        gae = delta + gamma * lam * m * gae
        if use_proper_time_limits:
            gae = gae * bm  # zero the advantage across time-limit boundaries
        return gae, gae + v

    _, returns = jax.lax.scan(
        body,
        jnp.zeros_like(next_value),
        (rewards, values, values_tp1, masks, bad_masks),
        reverse=True,
    )
    return returns


def _loss_fn(params, model, batch: Batch, cfg: PPOConfig, mirror=None):
    value, log_prob, entropy = networks.policy_evaluate(model, params, batch.obs, batch.actions)

    ratio = jnp.exp(log_prob - batch.old_log_probs)
    surr1 = ratio * batch.advantages
    surr2 = jnp.clip(ratio, 1.0 - cfg.clip_param, 1.0 + cfg.clip_param) * batch.advantages
    action_loss = -jnp.mean(jnp.minimum(surr1, surr2))

    if cfg.use_clipped_value_loss:
        v_clipped = batch.value_preds + jnp.clip(
            value - batch.value_preds, -cfg.clip_param, cfg.clip_param)
        vl = jnp.square(value - batch.returns)
        vl_clipped = jnp.square(v_clipped - batch.returns)
        value_loss = 0.5 * jnp.mean(jnp.maximum(vl, vl_clipped))
    else:
        value_loss = 0.5 * jnp.mean(jnp.square(batch.returns - value))

    ent = jnp.mean(entropy)
    total = value_loss * cfg.value_loss_coef + action_loss - ent * cfg.entropy_coef

    # mirror-symmetry loss (algo/ppo.py:110-136): ||Ma(pi(s)) - pi(Ms)||^2
    if mirror is not None and cfg.symmetry_coef > 0:
        mirror_obs_fn, mirror_act_fn = mirror
        _, mean, _ = model.apply(params, batch.obs)
        _, mean_m, _ = model.apply(params, mirror_obs_fn(batch.obs))
        sym = jnp.mean(jnp.square(mirror_act_fn(mean) - mean_m))
        total = total + cfg.symmetry_coef * sym

    return total, (value_loss, action_loss, ent)


def ppo_update(
    model,
    params,
    opt_state,
    tx: optax.GradientTransformation,
    batch: Batch,
    key: jax.Array,
    cfg: PPOConfig,
    mirror=None,
):
    """ppo_epoch x num_mini_batch SGD steps over shuffled data (one program).

    Advantage normalization over the full rollout (algo/ppo.py:66-68)."""
    n = batch.obs.shape[0]
    adv = batch.advantages
    adv = (adv - adv.mean()) / (adv.std() + 1e-5)
    batch = batch._replace(advantages=adv)

    # trace-time clamp: a rollout smaller than num_mini_batch (tiny smoke
    # shapes) would give mb_size 0 -> empty minibatches -> nan stats
    n_mb = min(cfg.num_mini_batch, n)
    mb_size = n // n_mb
    grad_fn = jax.grad(_loss_fn, has_aux=True)

    def epoch_body(carry, key_e):
        params, opt_state = carry
        perm = jax.random.permutation(key_e, n)

        def mb_body(carry, idx):
            params, opt_state = carry
            mb = jax.tree.map(lambda x: x[idx], batch)
            grads, aux = grad_fn(params, model, mb, cfg, mirror)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), jnp.stack(list(aux))

        idxs = perm[: mb_size * n_mb].reshape(n_mb, mb_size)
        (params, opt_state), stats = jax.lax.scan(mb_body, (params, opt_state), idxs)
        return (params, opt_state), stats

    keys = jax.random.split(key, cfg.ppo_epoch)
    (params, opt_state), stats = jax.lax.scan(epoch_body, (params, opt_state), keys)
    value_loss, action_loss, entropy = jnp.mean(stats, axis=(0, 1))
    return params, opt_state, {
        "value_loss": value_loss,
        "action_loss": action_loss,
        "dist_entropy": entropy,
    }
