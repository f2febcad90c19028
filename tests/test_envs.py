"""Env parity tests: dims, window semantics, reward math, determinism,
auto-reset, registry — checked against the reference's documented behavior
(file:line cites in the env modules)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simgan_tpu import envs as registry
from simgan_tpu.agents.networks import MLPPolicy, SplitPolicy
from simgan_tpu.envs.base import AutoResetEnv
from simgan_tpu.envs.hopper_combined import (HopperCombinedConfig,
                                             HopperCombinedEnv,
                                             contact_coeff_and_battery)
from simgan_tpu.envs.hopper_env import HopperConfig, HopperEnv
from simgan_tpu.envs.laikago_env import LaikagoConfig, LaikagoEnv
from simgan_tpu.envs.laikago_mirror import mirror_action, mirror_obs


def _behavior(obs_dim, act_dim, hidden=64, seed=0):
    m = MLPPolicy(action_dim=act_dim, hidden=hidden)
    p = m.init(jax.random.PRNGKey(seed), jnp.zeros((1, obs_dim)))
    return m, p


# ---------------------------------------------------------------------------
# dims & windows
# ---------------------------------------------------------------------------

def test_hopper_dims():
    env = HopperEnv(HopperConfig())
    st, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (11,)
    s = env.step(st, jnp.zeros(3))
    assert s.obs.shape == (11,)
    # D-input dim for s_idx=[0] a_idx=[0]: 2*11+3 = 25 (main_gail_dyn_ppo.py:159)
    assert s.window.select_and_merge().shape == (25,)


def test_laikago_dims():
    env = LaikagoEnv(LaikagoConfig())
    st, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (111,)   # 3 x 37 frame stack (laikago_env_v4.py:119)
    s = env.step(st, jnp.zeros(12))
    assert s.obs.shape == (111,)
    # D-input: 2*37+12 = 86 (laikago analog)
    assert s.window.select_and_merge().shape == (86,)


def test_hopper_combined_dims():
    m, p = _behavior(11, 3)
    env = HopperCombinedEnv(HopperCombinedConfig(train_dyn=True),
                            behavior_model=m, behavior_params=p)
    assert env.obs_dim == 14 and env.act_dim == 7
    st, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (14,)
    s = env.step(st, jnp.zeros(7))
    assert s.obs.shape == (14,)
    assert s.window.select_and_merge().shape == (25,)


def test_hopper_combined_dyn_stiffness():
    """dyn_stiffness extension: act_dim grows by 1/foot, pi_dyn's stiffness
    reaches the foot geoms (series combine with the 1e9 floor passes it
    through), and the env steps with the wider action."""
    from simgan_tpu.models import hopper as hopper_model
    from simgan_tpu.physics.contact import _combined_params

    m, p = _behavior(11, 3)
    env = HopperCombinedEnv(
        HopperCombinedConfig(train_dyn=True, dyn_stiffness=True),
        behavior_model=m, behavior_params=p)
    assert env.act_dim == 8
    st, obs = env.reset(jax.random.PRNGKey(0))
    dp, _ = env._apply_env_action(st.dp, jnp.full(8, 10.0))  # tanh -> ~1
    foot = hopper_model.FOOT_GEOMS[0]
    np.testing.assert_allclose(
        float(dp.contact_stiffness[foot]), 1e5, rtol=1e-3)
    _, _, _, k, d = _combined_params(env.sys, dp, env.phys_cfg.contact)
    np.testing.assert_allclose(float(k[foot]), 1e5, rtol=1e-3)
    np.testing.assert_allclose(float(d[foot]), np.exp(5.0) * 2, rtol=1e-3)
    s = env.step(st, jnp.zeros(8))
    assert s.obs.shape == (14,)
    # refinement mode: a contact_dims=5 ensemble round-trips through the env
    dyn = SplitPolicy(num_feet=1, hidden=32, contact_dims=5)
    assert dyn.action_dim == 8
    member = dyn.init(jax.random.PRNGKey(1), jnp.zeros((1, 14)))
    ensemble = jax.tree.map(lambda x: jnp.stack([x] * 5), member)
    env_r = HopperCombinedEnv(
        HopperCombinedConfig(train_dyn=False, dyn_stiffness=True),
        dyn_model=dyn, dyn_ensemble_params=ensemble)
    st, _ = env_r.reset(jax.random.PRNGKey(0))
    s = env_r.step(st, jnp.zeros(3))
    assert s.obs.shape == (11,)


def test_hopper_combined_refinement_dims():
    dyn = SplitPolicy(num_feet=1, hidden=32)
    member = dyn.init(jax.random.PRNGKey(1), jnp.zeros((1, 14)))
    ensemble = jax.tree.map(lambda x: jnp.stack([x] * 5), member)
    env = HopperCombinedEnv(HopperCombinedConfig(train_dyn=False),
                            dyn_model=dyn, dyn_ensemble_params=ensemble)
    assert env.obs_dim == 11 and env.act_dim == 3
    st, obs = env.reset(jax.random.PRNGKey(0))
    s = env.step(st, jnp.zeros(3))
    assert s.obs.shape == (11,)


def test_window_semantics():
    """First pushed action pads the whole act window; obs window rolls with
    newest at index 0 (utils.push_recent_value)."""
    env = HopperEnv(HopperConfig(obs_noise=False, act_noise=False, init_noise=False))
    st, obs = env.reset(jax.random.PRNGKey(0))
    a0 = jnp.array([0.5, -0.5, 0.2])
    s1 = env.step(st, a0)
    # all 10 act frames equal tanh(a0)
    np.testing.assert_allclose(s1.window.act, jnp.tile(jnp.tanh(a0), (10, 1)), atol=1e-6)
    # obs window filled with reset obs (window built before stepping)
    np.testing.assert_allclose(s1.window.obs, jnp.tile(obs, (10, 1)), atol=1e-6)
    a1 = jnp.array([-0.3, 0.1, 0.0])
    s2 = env.step(s1.state, a1)
    np.testing.assert_allclose(s2.window.act[0], jnp.tanh(a1), atol=1e-6)
    np.testing.assert_allclose(s2.window.act[1], jnp.tanh(a0), atol=1e-6)
    # next_obs is the newest post-step obs = next window's obs[0]
    np.testing.assert_allclose(s1.window.next_obs, s2.window.obs[0], atol=1e-6)


# ---------------------------------------------------------------------------
# reward math
# ---------------------------------------------------------------------------

def test_hopper_reward_formula():
    """Cross-check the composed reward against a hand computation."""
    env = HopperEnv(HopperConfig(obs_noise=False, act_noise=False, init_noise=False))
    st, _ = env.reset(jax.random.PRNGKey(0))
    a = jnp.array([0.2, -0.4, 0.6])
    dq_old = st.phys.qd[3:6]
    s = env.step(st, a)
    obs_unnorm = np.array(s.obs) / np.array([1.0] * 7 + [0.1] * 4)
    r = 3.0 + float(s.metrics["ave_dx"]) - 0.5 * float(jnp.sum(a**2))
    q = obs_unnorm[2:5]
    ll = np.array([-2.61799, -2.61799, -0.785398])
    ul = np.array([0.5, 0.5, 0.785398])
    qs = 2 * (q - 0.5 * (ll + ul)) / (ul - ll)
    r += -3.0 * np.count_nonzero(np.abs(qs) > 0.97)
    dq = obs_unnorm[8:11]
    r -= min(np.sum(np.abs(dq - np.array(dq_old))) * 0.05, 5.0)
    np.testing.assert_allclose(float(s.reward), r, atol=1e-4)


def test_contact_coeff_mapping():
    """tanh squash ranges (hopper_env_combined_policy.py:270-287)."""
    big = jnp.full(7, 10.0)   # tanh -> ~1
    lat, spin, resti, damp, stiff, batt = contact_coeff_and_battery(big, 1)
    assert stiff is None  # reference semantics: stiffness pinned (at 1)
    np.testing.assert_allclose(lat, [5.0], atol=1e-3)
    np.testing.assert_allclose(spin, [5.0], atol=1e-3)
    np.testing.assert_allclose(resti, [15.0], atol=1e-2)
    np.testing.assert_allclose(damp, [np.exp(3.0) * 2], rtol=1e-3)
    np.testing.assert_allclose(batt, [1.5] * 3, atol=1e-3)
    small = jnp.full(7, -10.0)
    lat, spin, resti, damp, stiff, batt = contact_coeff_and_battery(small, 1)
    np.testing.assert_allclose(damp, [np.exp(1.0) * 2], rtol=1e-3)  # ~5.44... min
    np.testing.assert_allclose(batt, [-0.5] * 3, atol=1e-3)


def test_contact_coeff_mapping_dyn_stiffness():
    """dyn_stiffness extension: 5 contact dims/foot; the deform mattress's
    exact (k=60000, d=150) pair is inside the squash ranges."""
    big = jnp.full(8, 10.0)
    lat, spin, resti, damp, stiff, batt = contact_coeff_and_battery(
        big, 1, stiffness=True)
    np.testing.assert_allclose(lat, [5.0], atol=1e-3)
    np.testing.assert_allclose(damp, [np.exp(5.0) * 2], rtol=1e-3)   # max 297
    np.testing.assert_allclose(stiff, [1e5], rtol=1e-3)
    np.testing.assert_allclose(batt, [1.5] * 3, atol=1e-3)
    small = jnp.full(8, -10.0)
    _, _, _, damp, stiff, _ = contact_coeff_and_battery(small, 1, stiffness=True)
    np.testing.assert_allclose(damp, [2.0], rtol=1e-3)
    np.testing.assert_allclose(stiff, [1.0], rtol=1e-3)
    # invert the squash for the laikago deform target (k=60000, d=150):
    # both pre-tanh values must be finite and within tanh's open range
    t_k = 2.0 * np.log(60000.0) / np.log(1e5) - 1.0
    t_d = 2.0 * np.log(150.0 / 2.0) / 5.0 - 1.0
    assert -1.0 < t_k < 1.0 and -1.0 < t_d < 1.0
    a = jnp.zeros(8).at[3].set(np.arctanh(t_d)).at[4].set(np.arctanh(t_k))
    _, _, _, damp, stiff, _ = contact_coeff_and_battery(a, 1, stiffness=True)
    np.testing.assert_allclose(damp, [150.0], rtol=1e-4)
    np.testing.assert_allclose(stiff, [60000.0], rtol=1e-4)


def test_contact_coeff_mapping_battery_prior():
    """battery_prior extension: battery squashes to [0, 1] (derate-only)
    instead of the reference's [-0.5, 1.5]; contact dims unchanged."""
    big = jnp.full(7, 10.0)
    lat, spin, resti, damp, stiff, batt = contact_coeff_and_battery(
        big, 1, battery01=True)
    np.testing.assert_allclose(batt, [1.0] * 3, atol=1e-3)
    np.testing.assert_allclose(lat, [5.0], atol=1e-3)   # contact unchanged
    small = jnp.full(7, -10.0)
    _, _, _, _, _, batt = contact_coeff_and_battery(small, 1, battery01=True)
    np.testing.assert_allclose(batt, [0.0] * 3, atol=1e-3)
    zero = jnp.zeros(7)
    _, _, _, _, _, batt = contact_coeff_and_battery(zero, 1, battery01=True)
    np.testing.assert_allclose(batt, [0.5] * 3, atol=1e-6)  # same center


# ---------------------------------------------------------------------------
# determinism / auto-reset / registry
# ---------------------------------------------------------------------------

def test_env_determinism():
    env = HopperEnv(HopperConfig())
    st1, o1 = env.reset(jax.random.PRNGKey(42))
    st2, o2 = env.reset(jax.random.PRNGKey(42))
    np.testing.assert_array_equal(o1, o2)
    a = jnp.array([0.1, 0.2, 0.3])
    s1 = env.step(st1, a)
    s2 = env.step(st2, a)
    np.testing.assert_array_equal(s1.obs, s2.obs)
    assert float(s1.reward) == float(s2.reward)


def test_autoreset_returns_fresh_obs():
    env = AutoResetEnv(HopperEnv(HopperConfig(max_episode_steps=2)))
    st, obs = env.reset(jax.random.PRNGKey(0))
    s = env.step(st, jnp.zeros(3))
    s = env.step(s.state, jnp.zeros(3))
    assert bool(s.done) and bool(s.truncated)
    # after auto-reset, step_count is back to 0
    assert int(s.state.env.step_count) == 0
    assert float(s.state.stats.last_length) == 2


def test_registry_kwargs():
    env = registry.make("HopperURDFEnv-v3", deform_floor_env=1.0, obs_noise=0.0)
    assert env.cfg.deform_floor_env is True
    assert env.cfg.obs_noise is False
    with pytest.raises(TypeError):
        registry.make("HopperURDFEnv-v3", not_a_flag=1)


# ---------------------------------------------------------------------------
# laikago mirror maps
# ---------------------------------------------------------------------------

def test_mirror_involution():
    """Mirroring twice is the identity (obs up to rotmat roundtrip; action exact)."""
    rng = np.random.RandomState(0)
    act = jnp.asarray(rng.randn(5, 12), dtype=jnp.float32)
    np.testing.assert_allclose(mirror_action(mirror_action(act)), act, atol=1e-6)

    env = LaikagoEnv(LaikagoConfig(obs_noise=False, init_noise=False))
    _, obs = env.reset(jax.random.PRNGKey(0))
    m2 = mirror_obs(mirror_obs(obs))
    np.testing.assert_allclose(m2, obs, atol=1e-4)


def test_mirror_preserves_height_and_negates_y():
    env = LaikagoEnv(LaikagoConfig(obs_noise=False, init_noise=False))
    _, obs = env.reset(jax.random.PRNGKey(0))
    m = mirror_obs(obs)
    for f in range(3):
        base = f * 37
        assert abs(float(m[base] - obs[base])) < 1e-6           # root z
        assert abs(float(m[base + 11] + obs[base + 11])) < 1e-5  # lin vel y negated


def test_combined_solver_knobs_plumb_to_contact_config():
    """solver_iterations/solver_warm_start on the combined configs reach the
    ContactConfig (construction only, no compile)."""
    from simgan_tpu.envs.hopper_combined import (HopperCombinedConfig,
                                                 HopperCombinedEnv)
    from simgan_tpu.envs.laikago_combined import (LaikagoCombinedConfig,
                                                  LaikagoCombinedEnv)
    from simgan_tpu.agents.networks import MLPPolicy

    beh = MLPPolicy(action_dim=12, hidden=8)
    bp = beh.init(jax.random.PRNGKey(0), jnp.zeros((1, 111)))
    env = LaikagoCombinedEnv(
        LaikagoCombinedConfig(solver_iterations=17, solver_warm_start=False),
        behavior_model=beh, behavior_params=bp)
    assert env.phys_cfg.contact.iterations == 17
    assert env.phys_cfg.contact.warm_start is False

    beh_h = MLPPolicy(action_dim=3, hidden=8)
    bph = beh_h.init(jax.random.PRNGKey(0), jnp.zeros((1, 11)))
    env_h = HopperCombinedEnv(
        HopperCombinedConfig(solver_iterations=3),
        behavior_model=beh_h, behavior_params=bph)
    assert env_h.phys_cfg.contact.iterations == 3


def test_pessimistic_refinement_penalty():
    """pessimism_lambda=0 reproduces reference rewards exactly; lambda>0
    lowers the refinement reward by exactly lambda * ensemble disagreement
    (framework extension; MOPO-style uncertainty penalty)."""
    dyn = SplitPolicy(num_feet=1, hidden=32)
    members = [dyn.init(jax.random.PRNGKey(i), jnp.zeros((1, 14)))
               for i in range(3)]
    ensemble = jax.tree.map(lambda *xs: jnp.stack(xs), *members)

    def run(lam):
        env = HopperCombinedEnv(
            HopperCombinedConfig(train_dyn=False, pessimism_lambda=lam),
            dyn_model=dyn, dyn_ensemble_params=ensemble)
        st, _ = env.reset(jax.random.PRNGKey(0))
        s = env.step(st, jnp.full(3, 0.3))
        return env, st, float(s.reward)

    env0, st, r0 = run(0.0)
    _, _, r1 = run(1.5)
    # recompute the expected disagreement on the same env_pi input
    robo = jnp.tanh(jnp.full(3, 0.3))
    env_pi_obs = jnp.concatenate([st.past_obs[0], robo])
    pen = float(env0._disagreement(env_pi_obs))
    assert pen > 1e-4          # distinct members must disagree
    assert abs((r0 - r1) - 1.5 * pen) < 1e-4
