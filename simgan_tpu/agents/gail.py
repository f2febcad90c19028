"""GAIL discriminator for dynamics imitation, fully on-device.

Reference: third_party/a2c_ppo_acktr/algo/gail.py — MLP trunk (2x100 tanh),
BCE with expert=1 / policy=0 on merged (s, a, s') rows, WGAN-GP-style
gradient penalty on alpha-mixup rows (compute_grad_pen_combined, lambda=10),
Adam with torch defaults, and the log D - log(1-D) reward with running
discounted-return tracking (predict_reward_combined, gail.py:201-210).

The epoch structure mirrors update_gail_dyn + the DataLoader/zip pairing in
main_gail_dyn_ppo.py:163-175, 255-256: per epoch, min(n_expert_batches,
n_policy_batches) minibatch pairs, expert rows shuffled without replacement.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from simgan_tpu.agents.networks import Discriminator


class GailConfig(NamedTuple):
    hidden: int = 100          # --gail-dis-hdim
    batch_size: int = 128      # --gail-batch-size
    epochs: int = 5            # --gail-epoch
    grad_pen_lambda: float = 10.0
    lr: float = 1e-3           # torch.optim.Adam defaults (gail.py:48)
    eps: float = 1e-8


@struct.dataclass
class DiscriminatorState:
    params: any
    opt_state: any
    returns: jax.Array        # (N,) running discounted gail return


def create(key, feat_dim: int, num_envs: int, cfg: GailConfig):
    model = Discriminator(hidden=cfg.hidden)
    params = model.init(key, jnp.zeros((1, feat_dim)))
    tx = optax.adam(cfg.lr, eps=cfg.eps)
    state = DiscriminatorState(
        params=params, opt_state=tx.init(params), returns=jnp.zeros(num_envs))
    return model, tx, state


def _bce_with_logits(logits, targets):
    return jnp.mean(jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _loss(params, model, expert_b, policy_b, key, lam):
    expert_d = model.apply(params, expert_b)
    policy_d = model.apply(params, policy_b)
    expert_loss = _bce_with_logits(expert_d, jnp.ones_like(expert_d))
    policy_loss = _bce_with_logits(policy_d, jnp.zeros_like(policy_d))

    alpha = jax.random.uniform(key, (expert_b.shape[0], 1))
    mix = alpha * expert_b + (1 - alpha) * policy_b

    def disc_sum(x):
        return jnp.sum(model.apply(params, x))

    grads = jax.grad(disc_sum)(mix)
    grad_pen = lam * jnp.mean(jnp.square(jnp.linalg.norm(grads, axis=1) - 1.0))
    return expert_loss + policy_loss + grad_pen, (expert_loss, policy_loss)


def update(
    model,
    tx,
    state: DiscriminatorState,
    expert_feats: jax.Array,   # (M, F) merged expert rows, static M
    policy_feats: jax.Array,   # (P, F) this update's rollout rows
    key: jax.Array,
    cfg: GailConfig,
):
    """cfg.epochs x n_batches discriminator SGD steps in one XLA program."""
    M, P = expert_feats.shape[0], policy_feats.shape[0]
    # clamp so tiny rollouts still produce >=1 batch (the reference's
    # DataLoader yields partial batches rather than none)
    bs = min(cfg.batch_size, M, P)
    n_batches = min(M // bs, P // bs)
    grad_fn = jax.grad(_loss, has_aux=True)

    def epoch(carry, key_e):
        params, opt_state = carry
        ke1, ke2, ke3 = jax.random.split(key_e, 3)
        e_idx = jax.random.permutation(ke1, M)[: n_batches * bs].reshape(n_batches, bs)
        p_idx = jax.random.permutation(ke2, P)[: n_batches * bs].reshape(n_batches, bs)
        mix_keys = jax.random.split(ke3, n_batches)

        def mb(carry, xs):
            params, opt_state = carry
            ei, pi, k = xs
            grads, aux = grad_fn(params, model, expert_feats[ei], policy_feats[pi], k, cfg.grad_pen_lambda)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), jnp.stack(list(aux))

        (params, opt_state), stats = jax.lax.scan(mb, (params, opt_state), (e_idx, p_idx, mix_keys))
        return (params, opt_state), stats

    keys = jax.random.split(key, cfg.epochs)
    (params, opt_state), stats = jax.lax.scan(epoch, (state.params, state.opt_state), keys)
    e_loss, p_loss = jnp.mean(stats, axis=(0, 1))
    return state.replace(params=params, opt_state=opt_state), {
        "gail_loss_e": e_loss,
        "gail_loss_p": p_loss,
        "gail_loss": e_loss + p_loss,
    }


def create_ensemble(key, feat_dim: int, num_envs: int, cfg: GailConfig,
                    n_members: int):
    """K independently-initialized discriminators as one stacked
    DiscriminatorState (leading member axis).  Framework extension
    (--d-ensemble; K=1 elsewhere = reference semantics)."""
    model = Discriminator(hidden=cfg.hidden)
    tx = optax.adam(cfg.lr, eps=cfg.eps)

    def one(k):
        params = model.init(k, jnp.zeros((1, feat_dim)))
        return DiscriminatorState(params=params, opt_state=tx.init(params),
                                  returns=jnp.zeros(num_envs))

    state = jax.vmap(one)(jax.random.split(key, n_members))
    return model, tx, state


def update_ensemble(
    model,
    tx,
    state: DiscriminatorState,       # stacked, leading member axis K
    expert_feats: jax.Array,         # (K, M, F) per-member bootstrap rows
    policy_feats: jax.Array,         # (P, F) shared rollout rows
    key: jax.Array,
    cfg: GailConfig,
):
    """Each member runs the reference's exact update on its own expert
    bootstrap (different minibatch shuffles via per-member keys); stats are
    averaged over members."""
    keys = jax.random.split(key, expert_feats.shape[0])
    new_state, stats = jax.vmap(
        lambda st, ef, k: update(model, tx, st, ef, policy_feats, k, cfg)
    )(state, expert_feats, keys)
    return new_state, {k: jnp.mean(v) for k, v in stats.items()}


def predict_reward_ensemble(
    model,
    state: DiscriminatorState,       # stacked, leading member axis K
    feats: jax.Array,                # (T, N, F)
    masks: jax.Array,                # (T, N)
    gamma: float,
    offset: jax.Array,
):
    """Mean over members of log(sig d) - log(1 - sig d), + offset.  The
    running discounted return is a property of the COMBINED reward stream,
    so one carry is threaded (kept identical across member slots)."""
    d = jax.vmap(lambda p: model.apply(p, feats))(state.params)   # (K, T, N)
    s = jax.nn.sigmoid(d)
    rewards = jnp.mean(jnp.log(s + 1e-7) - jnp.log(1 - s + 1e-7), axis=0) + offset

    def body(ret, xs):
        r, m = xs
        ret = ret * gamma * m + r
        return ret, ret

    ret, returns = jax.lax.scan(body, state.returns[0], (rewards, masks))
    rets = jnp.broadcast_to(ret, state.returns.shape)
    return state.replace(returns=rets), rewards, returns


def predict_reward(
    model,
    state: DiscriminatorState,
    feats: jax.Array,        # (T, N, F) next-step merged features
    masks: jax.Array,        # (T, N) 1 - done
    gamma: float,
    offset: jax.Array,
):
    """log(sigmoid(d)) - log(1 - sigmoid(d)) + offset, with running
    discounted-return tracking (predict_reward_combined, gail.py:201-210).

    Returns (new_state, rewards (T,N), returns (T,N))."""
    d = model.apply(state.params, feats)
    s = jax.nn.sigmoid(d)
    rewards = jnp.log(s + 1e-7) - jnp.log(1 - s + 1e-7) + offset

    def body(ret, xs):
        r, m = xs
        ret = ret * gamma * m + r
        return ret, ret

    ret, returns = jax.lax.scan(body, state.returns, (rewards, masks))
    return state.replace(returns=ret), rewards, returns
