"""SPD-inverse Pallas kernel parity vs linalg.spd_inverse.

The kernel (ops/spd_pallas.py) unrolls the identical column-wise Cholesky +
row-wise triangular solves, so batched results must match the XLA path to
float32 round-off.  The batched rule only fires under ``jax.vmap``
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.ops.spd_pallas import make_spd_inverse
from simgan_tpu.physics.linalg import spd_inverse


def _random_spd(rng, n, batch, cond=1.0):
    a = rng.randn(batch, n, n).astype(np.float32)
    m = np.einsum("bij,bkj->bik", a, a) + np.eye(n, dtype=np.float32)
    # scale some diagonals to vary conditioning like dt*damping does
    m[:, 0, 0] *= cond
    return jnp.asarray(m)


def test_spd_inverse_parity_18():
    rng = np.random.RandomState(0)
    M = _random_spd(rng, 18, 37, cond=50.0)   # odd batch exercises padding
    ref = jax.jit(jax.vmap(spd_inverse))(M)
    pl = jax.jit(jax.vmap(make_spd_inverse(18)))(M)
    np.testing.assert_allclose(np.asarray(pl), np.asarray(ref),
                               rtol=0, atol=2e-5)
    # it is actually an inverse
    eye = jnp.einsum("bij,bjk->bik", M, pl)
    np.testing.assert_allclose(np.asarray(eye),
                               np.broadcast_to(np.eye(18), eye.shape),
                               rtol=0, atol=5e-3)


def test_spd_inverse_parity_6():
    rng = np.random.RandomState(1)
    M = _random_spd(rng, 6, 16)
    ref = jax.jit(jax.vmap(spd_inverse))(M)
    pl = jax.jit(jax.vmap(make_spd_inverse(6)))(M)
    np.testing.assert_allclose(np.asarray(pl), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_spd_inverse_unbatched_fallback():
    rng = np.random.RandomState(2)
    M = _random_spd(rng, 6, 1)[0]
    ref = spd_inverse(M)
    pl = make_spd_inverse(6)(M)
    np.testing.assert_array_equal(np.asarray(pl), np.asarray(ref))


def test_laikago_env_rollout_parity():
    """spd_pallas=True combined-env rollout tracks the default engine over
    a vmapped multi-step contact-rich rollout."""
    from simgan_tpu.agents.networks import MLPPolicy
    from simgan_tpu.envs.laikago_combined import (LaikagoCombinedConfig,
                                                  LaikagoCombinedEnv)

    key = jax.random.PRNGKey(0)
    behavior = MLPPolicy(action_dim=12, hidden=16)
    b_params = behavior.init(key, jnp.zeros((1, 111)))

    def rollout(spd_pallas):
        env = LaikagoCombinedEnv(
            LaikagoCombinedConfig(spd_pallas=spd_pallas),
            behavior_model=behavior, behavior_params=b_params)
        keys = jax.random.split(jax.random.PRNGKey(3), 4)
        states, obs = jax.jit(jax.vmap(env.reset))(keys)

        def body(carry, k):
            states, obs = carry
            a = 0.1 * jax.random.normal(k, (4, env.act_dim))
            s = jax.vmap(env.step)(states, a)
            return (s.state, s.obs), (s.reward, s.state.phys.q)

        ks = jax.random.split(jax.random.PRNGKey(4), 10)
        _, (rew, q) = jax.jit(
            lambda c, k: jax.lax.scan(body, c, k))((states, obs), ks)
        return np.asarray(rew), np.asarray(q)

    r0, q0 = rollout(False)
    r1, q1 = rollout(True)
    np.testing.assert_allclose(q1, q0, rtol=0, atol=1e-4)
    np.testing.assert_allclose(r1, r0, rtol=0, atol=1e-3)
