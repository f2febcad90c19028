"""Policy / value / discriminator networks (flax), matching the reference nets.

Parity map (all sizes/inits mirror the PyTorch originals):
  * MLPPolicy  = Policy(MLPBase 2xH tanh actor+critic, DiagGaussian head)
      reference: third_party/a2c_ppo_acktr/model.py:233-264, 37-114,
      distributions.py:91-118 (orthogonal init gain sqrt(2) hidden, mean head
      orthogonal/50, state-independent logstd bias init -0.5).
  * SplitPolicy = SplitPolicyBaseNew + StateDiagGaussianNew
      reference: third_party/a2c_ppo_acktr/model_split.py:157-238 (dual
      trunk, shared critic, state-dependent logstd heads with bias -0.5 and
      mean gain 0.02).
  * Discriminator trunk = Linear(h) tanh x2 + Linear(1)
      reference: third_party/a2c_ppo_acktr/algo/gail.py:40-43 (default
      PyTorch Linear init).

These are tiny MLPs; batched over thousands of env replicas the matmuls land
on the MXU in bf16-by-default which is plenty for 64-100 wide nets.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Params = Any

_ortho = nn.initializers.orthogonal


def _torch_linear_init():
    """PyTorch nn.Linear default init (kaiming-uniform fan_in, a=sqrt(5))."""
    def kernel(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = math.sqrt(1.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return kernel


class _Trunk(nn.Module):
    """2-layer tanh MLP with orthogonal(sqrt(2)) init, zero bias."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        x = jnp.tanh(nn.Dense(self.hidden, kernel_init=_ortho(math.sqrt(2)),
                              bias_init=nn.initializers.zeros)(x))
        x = jnp.tanh(nn.Dense(self.hidden, kernel_init=_ortho(math.sqrt(2)),
                              bias_init=nn.initializers.zeros)(x))
        return x


class MLPPolicy(nn.Module):
    """Gaussian actor-critic (reference Policy/MLPBase/DiagGaussian)."""

    action_dim: int
    hidden: int = 64

    @nn.compact
    def __call__(self, obs):
        actor_h = _Trunk(self.hidden, name="actor")(obs)
        critic_h = _Trunk(self.hidden, name="critic")(obs)
        value = nn.Dense(1, kernel_init=_ortho(1.0),
                         bias_init=nn.initializers.zeros, name="critic_linear")(critic_h)
        # DiagGaussian: orthogonal then weights/50 => orthogonal(0.02)
        mean = nn.Dense(self.action_dim, kernel_init=_ortho(1.0 / 50.0),
                        bias_init=nn.initializers.zeros, name="fc_mean")(actor_h)
        logstd = self.param("logstd", nn.initializers.constant(-0.5), (self.action_dim,))
        logstd = jnp.broadcast_to(logstd, mean.shape)
        return value[..., 0], mean, logstd


class SplitPolicy(nn.Module):
    """Dual-trunk dynamics policy with state-dependent log-std heads.

    ``contact_dims`` is 4 per foot in the reference (friction, spin,
    restitution, damping — model_split.py head widths); 5 when the
    ``dyn_stiffness`` framework extension unpins contact stiffness as an
    extra pi_dyn output (see envs/hopper_combined.contact_coeff_and_battery).
    """

    num_feet: int = 1
    hidden: int = 64
    contact_dims: int = 4

    @property
    def action_dim(self) -> int:
        return (self.contact_dims + 3) * self.num_feet

    @nn.compact
    def __call__(self, obs):
        contact_h = _Trunk(self.hidden, name="actor_contact")(obs)
        actuator_h = _Trunk(self.hidden, name="actor_actuator")(obs)
        critic_h = _Trunk(self.hidden, name="critic_full")(obs)
        value = nn.Dense(1, kernel_init=_ortho(1.0),
                         bias_init=nn.initializers.zeros, name="critic_linear")(critic_h)
        nf = self.num_feet
        c_mean = nn.Dense(self.contact_dims * nf, kernel_init=_ortho(0.02),
                          bias_init=nn.initializers.zeros, name="contact_mean")(contact_h)
        a_mean = nn.Dense(3 * nf, kernel_init=_ortho(0.02),
                          bias_init=nn.initializers.zeros, name="actuator_mean")(actuator_h)
        c_logstd = nn.Dense(self.contact_dims * nf, kernel_init=_ortho(1.0),
                            bias_init=nn.initializers.constant(-0.5), name="contact_logstd")(contact_h)
        a_logstd = nn.Dense(3 * nf, kernel_init=_ortho(1.0),
                            bias_init=nn.initializers.constant(-0.5), name="actuator_logstd")(actuator_h)
        mean = jnp.concatenate([c_mean, a_mean], axis=-1)
        logstd = jnp.concatenate([c_logstd, a_logstd], axis=-1)
        return value[..., 0], mean, logstd


class Discriminator(nn.Module):
    """GAIL discriminator trunk (logit output)."""

    hidden: int = 100

    @nn.compact
    def __call__(self, x):
        k = _torch_linear_init()
        x = jnp.tanh(nn.Dense(self.hidden, kernel_init=k)(x))
        x = jnp.tanh(nn.Dense(self.hidden, kernel_init=k)(x))
        return nn.Dense(1, kernel_init=k)(x)[..., 0]


# ---------------------------------------------------------------------------
# Diagonal-gaussian distribution helpers (reference FixedNormal,
# distributions.py:51-59: log_probs summed over action dim)
# ---------------------------------------------------------------------------

_LOG_SQRT_2PI = 0.5 * math.log(2 * math.pi)


def normal_log_prob(mean, logstd, x):
    var_term = (x - mean) / jnp.exp(logstd)
    lp = -0.5 * var_term**2 - logstd - _LOG_SQRT_2PI
    return jnp.sum(lp, axis=-1)


def normal_entropy(logstd):
    return jnp.sum(logstd + 0.5 + _LOG_SQRT_2PI, axis=-1)


def normal_sample(key, mean, logstd):
    return mean + jnp.exp(logstd) * jax.random.normal(key, mean.shape)


# --- discrete-action heads (reference Categorical/Bernoulli,
# distributions.py:33-48, 63-88, 157-168; unused by the six experiments but
# part of the Policy surface for Discrete/MultiBinary action spaces) ---


def categorical_log_prob(logits, actions):
    logp = jax.nn.log_softmax(logits)
    return jnp.take_along_axis(logp, actions[..., None], axis=-1)[..., 0]


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(logits)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def categorical_sample(key, logits):
    return jax.random.categorical(key, logits, axis=-1)


def bernoulli_log_prob(logits, actions):
    lp = -jnp.maximum(logits, 0) + logits * actions - jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(lp, axis=-1)


def bernoulli_entropy(logits):
    p = jax.nn.sigmoid(logits)
    eps = 1e-7
    return -jnp.sum(p * jnp.log(p + eps) + (1 - p) * jnp.log(1 - p + eps), axis=-1)


class CategoricalPolicy(nn.Module):
    """Actor-critic with a categorical head (reference Policy + Categorical)."""

    num_actions: int
    hidden: int = 64

    @nn.compact
    def __call__(self, obs):
        actor_h = _Trunk(self.hidden, name="actor")(obs)
        critic_h = _Trunk(self.hidden, name="critic")(obs)
        value = nn.Dense(1, kernel_init=_ortho(1.0),
                         bias_init=nn.initializers.zeros, name="critic_linear")(critic_h)
        logits = nn.Dense(self.num_actions, kernel_init=_ortho(0.01),
                          bias_init=nn.initializers.zeros, name="linear")(actor_h)
        return value[..., 0], logits


class CNNPolicy(nn.Module):
    """Pixel actor-critic: Nature-CNN base + categorical head.

    Reference CNNBase (third_party/a2c_ppo_acktr/model.py:204-230): /255
    input, conv 32@8s4 / 64@4s2 / 32@3s1 + ReLU, 512-wide FC, orthogonal
    init with ReLU gain, critic head orthogonal(1).  Unused by the six
    SimGAN experiments but part of the Policy surface for image obs.
    TPU-native notes: NHWC layout (XLA's preferred conv layout) instead of
    torch's NCHW; the shared trunk feeds both heads as in the reference.
    """

    num_actions: int
    hidden: int = 512

    @nn.compact
    def __call__(self, obs):
        # obs: (..., H, W, C) uint8 or float pixels
        relu_gain = math.sqrt(2.0)
        x = obs.astype(jnp.float32) / 255.0
        for features, kernel, stride in ((32, 8, 4), (64, 4, 2), (32, 3, 1)):
            x = nn.relu(nn.Conv(features, (kernel, kernel), (stride, stride),
                                padding="VALID", kernel_init=_ortho(relu_gain),
                                bias_init=nn.initializers.zeros)(x))
        x = x.reshape(*x.shape[:-3], -1)
        x = nn.relu(nn.Dense(self.hidden, kernel_init=_ortho(relu_gain),
                             bias_init=nn.initializers.zeros)(x))
        value = nn.Dense(1, kernel_init=_ortho(1.0),
                         bias_init=nn.initializers.zeros,
                         name="critic_linear")(x)
        logits = nn.Dense(self.num_actions, kernel_init=_ortho(0.01),
                          bias_init=nn.initializers.zeros, name="linear")(x)
        return value[..., 0], logits


def policy_act(model: nn.Module, params: Params, obs, key=None, deterministic=False):
    """(value, action, log_prob) — reference Policy.act (model.py:89-101)."""
    value, mean, logstd = model.apply(params, obs)
    if deterministic or key is None:
        action = mean
    else:
        action = normal_sample(key, mean, logstd)
    return value, action, normal_log_prob(mean, logstd, action)


def policy_evaluate(model: nn.Module, params: Params, obs, action):
    """(value, log_prob, entropy) — reference Policy.evaluate_actions."""
    value, mean, logstd = model.apply(params, obs)
    return value, normal_log_prob(mean, logstd, action), normal_entropy(logstd)


def reset_logstd(model: nn.Module, params: Params, value: float) -> Params:
    """Reference reset_variance (model.py:76-78): overwrite the logstd.

    For MLPPolicy this sets the state-independent logstd parameter.  Used to
    re-diversify frozen behavior policies (--behavior-logstd -1.3) and
    warm-started policies (--warm-start-logstd -1.3).
    """
    def _replace(d):
        out = {}
        for k, v in d.items():
            if k == "logstd":
                out[k] = jnp.full_like(v, value)
            elif isinstance(v, dict):
                out[k] = _replace(v)
            else:
                out[k] = v
        return out

    return _replace(params)


def reset_critic(model: nn.Module, params: Params, key, obs_dim: int) -> Params:
    """Reference reset_critic (model.py:80-87): re-init critic trunk + head."""
    fresh = model.init(key, jnp.zeros((1, obs_dim)))

    def _swap(old, new):
        out = {}
        for k, v in old.items():
            if k in ("critic", "critic_linear", "critic_full"):
                out[k] = new[k]
            elif isinstance(v, dict):
                out[k] = _swap(v, new[k])
            else:
                out[k] = v
        return out

    return _swap(params, fresh)
