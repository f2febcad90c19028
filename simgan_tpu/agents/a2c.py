"""A2C (synchronous advantage actor-critic) — the reference's --algo a2c path.

Reference: third_party/a2c_ppo_acktr/algo/a2c_acktr.py:55-102 (single
full-batch gradient step per update: policy gradient + value MSE + entropy
bonus, RMSprop).  The ACKTR/KFAC variant (algo/kfac.py) applies a natural
gradient preconditioner: the JAX port lives in agents/kfac.py (probe-trick
covariance capture + eigh preconditioner, tested in tests/test_kfac.py) and
is wired here via ``acktr_update``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from simgan_tpu.agents import networks
from simgan_tpu.agents.ppo import Batch


class A2CConfig(NamedTuple):
    value_loss_coef: float = 0.5
    entropy_coef: float = 0.01
    lr: float = 7e-4
    eps: float = 1e-5
    alpha: float = 0.99        # RMSprop decay
    max_grad_norm: float = 0.5


def make_optimizer(cfg: A2CConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.rmsprop(cfg.lr, decay=cfg.alpha, eps=cfg.eps),
    )


def acktr_update(model, params, kfac_state, batch: Batch, key, kfac_cfg=None):
    """ACKTR: A2C losses with the KFAC natural-gradient optimizer
    (a2c_acktr.py with acktr=True + algo/kfac.py)."""
    from simgan_tpu.agents import kfac as kfac_mod

    kfac_cfg = kfac_cfg or kfac_mod.KFACConfig()
    cfg = A2CConfig()

    def loss_fn(p):
        value, log_prob, entropy = networks.policy_evaluate(
            model, p, batch.obs, batch.actions)
        adv = batch.returns - value
        value_loss = jnp.mean(jnp.square(adv))
        action_loss = -jnp.mean(jax.lax.stop_gradient(adv) * log_prob)
        ent = jnp.mean(entropy)
        total = (value_loss * cfg.value_loss_coef + action_loss
                 - ent * cfg.entropy_coef)
        return total, (value_loss, action_loss, ent)

    grads, (value_loss, action_loss, ent) = jax.grad(loss_fn, has_aux=True)(params)
    params, kfac_state = kfac_mod.kfac_update(
        model, params, kfac_state, batch.obs, grads, key, kfac_cfg)
    return params, kfac_state, {
        "value_loss": value_loss,
        "action_loss": action_loss,
        "dist_entropy": ent,
    }


def a2c_update(model, params, opt_state, tx, batch: Batch, cfg: A2CConfig):
    """One full-batch A2C step (a2c_acktr.py:55-102)."""

    def loss_fn(p):
        value, log_prob, entropy = networks.policy_evaluate(
            model, p, batch.obs, batch.actions)
        adv = batch.returns - value
        value_loss = jnp.mean(jnp.square(adv))
        action_loss = -jnp.mean(jax.lax.stop_gradient(adv) * log_prob)
        ent = jnp.mean(entropy)
        total = value_loss * cfg.value_loss_coef + action_loss - ent * cfg.entropy_coef
        return total, (value_loss, action_loss, ent)

    grads, (value_loss, action_loss, ent) = jax.grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {
        "value_loss": value_loss,
        "action_loss": action_loss,
        "dist_entropy": ent,
    }
