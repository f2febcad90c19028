"""KFAC natural-gradient optimizer (the reference's ACKTR path).

Reference: third_party/a2c_ppo_acktr/algo/kfac.py (Kronecker-factored
approximate curvature for Linear layers: running input/output-gradient
covariances, eigendecomposed preconditioner, KL-clipped SGD-with-momentum)
and algo/a2c_acktr.py:55-102 (Fisher loss = policy log-prob + sample-noise
value MSE, accumulated on the same batch).

JAX port notes:
  * Works on :class:`~simgan_tpu.agents.networks.MLPPolicy` parameters.  The
    per-layer activations (Dense inputs, bias-augmented) and pre-activation
    gradients are captured with a re-expressed layer-by-layer forward + the
    zero-probe trick (grad wrt an additive zero gives the backprop signal) —
    no module hooks needed.
  * The covariance running averages use stat_decay=0.99 as the reference;
    the eigendecomposition is recomputed every update (the reference's
    TInv=100 staleness is a CPU-time optimization; eigh of <=113-wide
    matrices is cheap on accelerator).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from simgan_tpu.agents import networks


class KFACConfig(NamedTuple):
    lr: float = 0.25
    momentum: float = 0.9
    stat_decay: float = 0.99
    damping: float = 1e-2
    kl_clip: float = 1e-3
    weight_decay: float = 0.0


# --- layer-by-layer forward over MLPPolicy params --------------------------

_LAYERS = [
    ("actor", "Dense_0"), ("actor", "Dense_1"),
    ("critic", "Dense_0"), ("critic", "Dense_1"),
    ("critic_linear",), ("fc_mean",),
]


def _layer_params(params, path):
    d = params["params"]
    for k in path:
        d = d[k]
    return d["kernel"], d["bias"]


def _forward(params, probes, obs):
    """MLPPolicy forward with per-layer probes; returns outputs + activations."""
    acts = {}

    def dense(path, x):
        W, b = _layer_params(params, path)
        acts[path] = x
        return x @ W + b + probes[path]

    a = jnp.tanh(dense(("actor", "Dense_0"), obs))
    a = jnp.tanh(dense(("actor", "Dense_1"), a))
    c = jnp.tanh(dense(("critic", "Dense_0"), obs))
    c = jnp.tanh(dense(("critic", "Dense_1"), c))
    value = dense(("critic_linear",), c)[..., 0]
    mean = dense(("fc_mean",), a)
    logstd = jnp.broadcast_to(params["params"]["logstd"], mean.shape)
    return value, mean, logstd, acts


def _zero_probes(params, batch):
    probes = {}
    for path in _LAYERS:
        W, _ = _layer_params(params, path)
        probes[tuple(path)] = jnp.zeros((batch, W.shape[1]))
    return probes


@struct.dataclass
class KFACState:
    aa: Any        # dict path -> (in+1, in+1) running input covariance
    gg: Any        # dict path -> (out, out) running output-grad covariance
    momentum: Any  # param-tree momentum buffers
    steps: jax.Array

    @classmethod
    def create(cls, params, obs_dim: int) -> "KFACState":
        aa, gg = {}, {}
        for path in _LAYERS:
            W, _ = _layer_params(params, tuple(path))
            aa[tuple(path)] = jnp.eye(W.shape[0] + 1)
            gg[tuple(path)] = jnp.eye(W.shape[1])
        mom = jax.tree.map(jnp.zeros_like, params)
        return cls(aa=aa, gg=gg, momentum=mom, steps=jnp.asarray(0))


def fisher_stats(model, params, state: KFACState, obs, key, cfg: KFACConfig):
    """Accumulate A/G covariances from the Fisher loss (a2c_acktr.py:66-81)."""
    B = obs.shape[0]
    probes = _zero_probes(params, B)

    def fisher_loss(probes):
        value, mean, logstd, acts = _forward(params, probes, obs)
        k1, k2 = jax.random.split(key)
        # model-sampled actions/values as Fisher targets (a2c_acktr.py:66-81)
        actions = jax.lax.stop_gradient(networks.normal_sample(k1, mean, logstd))
        pg_fisher = -jnp.mean(networks.normal_log_prob(mean, logstd, actions))
        value_noise = jax.random.normal(k2, value.shape)
        sample_values = jax.lax.stop_gradient(value) + value_noise
        vf_fisher = -jnp.mean(jnp.square(value - sample_values))
        return pg_fisher + vf_fisher, acts

    grads, acts = jax.grad(fisher_loss, has_aux=True)(probes)

    aa, gg = dict(state.aa), dict(state.gg)
    d = cfg.stat_decay
    for path in _LAYERS:
        p = tuple(path)
        a = acts[p]
        a1 = jnp.concatenate([a, jnp.ones((B, 1))], axis=1)    # bias augment
        g = grads[p] * B                                        # sum-scale like torch hooks
        aa[p] = d * aa[p] + (1 - d) * (a1.T @ a1) / B
        gg[p] = d * gg[p] + (1 - d) * (g.T @ g) / B
    return state.replace(aa=aa, gg=gg)


def precondition(params, grads, state: KFACState, cfg: KFACConfig):
    """Apply the Kronecker-factored inverse Fisher to the gradients."""
    new_grads = jax.tree.map(lambda g: g, grads)
    gp = new_grads["params"]

    vs = {}
    for path in _LAYERS:
        p = tuple(path)
        d = gp
        for k in path:
            d = d[k]
        dW, db = d["kernel"], d["bias"]
        dWb = jnp.concatenate([dW, db[None, :]], axis=0)       # (in+1, out)

        la, Qa = jnp.linalg.eigh(state.aa[p])
        lg, Qg = jnp.linalg.eigh(state.gg[p])
        v1 = Qa.T @ dWb @ Qg
        v2 = v1 / (la[:, None] * lg[None, :] + cfg.damping)
        v = Qa @ v2 @ Qg.T
        vs[p] = v

    # KL clipping: nu = sqrt(kl_clip / sum(v * g * lr^2))
    vg_sum = sum(jnp.sum(vs[tuple(p)] * jnp.concatenate(
        [_get(gp, p)["kernel"], _get(gp, p)["bias"][None, :]], axis=0)) * cfg.lr ** 2
        for p in _LAYERS)
    nu = jnp.minimum(1.0, jnp.sqrt(cfg.kl_clip / jnp.maximum(vg_sum, 1e-12)))

    for path in _LAYERS:
        p = tuple(path)
        v = vs[p] * nu
        d = _get(gp, p)
        d["kernel"] = v[:-1]
        d["bias"] = v[-1]
    return new_grads


def _get(tree, path):
    d = tree
    for k in path:
        d = d[k]
    return d


def kfac_update(model, params, state: KFACState, batch_obs, batch_loss_grads,
                key, cfg: KFACConfig):
    """One ACKTR step: update stats, precondition, SGD-with-momentum."""
    state = fisher_stats(model, params, state, batch_obs, key, cfg)
    pgrads = precondition(params, batch_loss_grads, state, cfg)

    def sgd(m, g, p):
        m_new = cfg.momentum * m + g + cfg.weight_decay * p
        return m_new, p - cfg.lr * m_new

    flat_m, tdef = jax.tree.flatten(state.momentum)
    flat_g = jax.tree.leaves(pgrads)
    flat_p = jax.tree.leaves(params)
    new_m, new_p = [], []
    for m, g, p in zip(flat_m, flat_g, flat_p):
        mn, pn = sgd(m, g, p)
        new_m.append(mn)
        new_p.append(pn)
    return (jax.tree.unflatten(tdef, new_p),
            state.replace(momentum=jax.tree.unflatten(tdef, new_m),
                          steps=state.steps + 1))
