"""deform_nodes mattress field: the reference's 8-vertex mass-spring cube
(assets/cube_fat.obj, loadSoftBody hopper_env_v3.py:143-149 /
laikago_env_v4.py:177-183) as a 4-vertex vertical field coupled to the
contact solve (physics/deformable.py, engine.substep)."""

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.physics import deformable
from simgan_tpu.physics.deformable import DeformableConfig


def test_bary_weights_partition_of_unity():
    cfg = DeformableConfig()
    for xy in ([-3.0, -10.0], [17.0, 10.0], [7.0, 0.0], [1.2, -4.4], [99.0, 0.0]):
        w = deformable.bary_weights(jnp.asarray(xy), cfg)
        np.testing.assert_allclose(float(jnp.sum(w)), 1.0, atol=1e-6)
        assert np.all(np.asarray(w) >= 0)
    # corner concentrates on one vertex; center is uniform
    w = deformable.bary_weights(jnp.asarray([-3.0, -10.0]), cfg)
    np.testing.assert_allclose(np.asarray(w), [1, 0, 0, 0], atol=1e-6)
    w = deformable.bary_weights(jnp.asarray([7.0, 0.0]), cfg)
    np.testing.assert_allclose(np.asarray(w), [0.25] * 4, atol=1e-6)


def test_node_substep_statics_and_decay():
    """Constant force settles at u = F/k_eff; free vibration decays."""
    cfg = DeformableConfig(k=1500.0, d=50.0, mass=20.0)
    dt = 1.0 / 500.0
    F = -100.0  # steady downward force [N]
    u = jnp.zeros(4)
    v = jnp.zeros(4)
    for _ in range(3000):  # 6 s
        u, v = deformable.node_substep(u, v, jnp.full(4, F * dt), cfg, dt)
    np.testing.assert_allclose(np.asarray(u), F / cfg.k_eff, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-6)
    # release: decays back toward zero
    for _ in range(3000):
        u, v = deformable.node_substep(u, v, jnp.zeros(4), cfg, dt)
    assert float(jnp.max(jnp.abs(u))) < 5e-3
    # the stiff laikago constants stay stable too (implicit update)
    cfg2 = DeformableConfig(k=60000.0, d=150.0, mass=4000.0)
    u = jnp.full(4, -0.05)
    v = jnp.zeros(4)
    for _ in range(2000):
        u, v = deformable.node_substep(u, v, jnp.zeros(4), cfg2, dt)
    assert np.all(np.isfinite(np.asarray(u))) and float(jnp.max(jnp.abs(u))) < 0.05


def test_hopper_deform_nodes_rollout_craters_and_remembers():
    """End-to-end: the hopper standing on the node mattress sinks it (static
    load ~ m g distributed by bary weights), and the crater persists as field
    state (the memory the half-space surrogate cannot represent)."""
    from simgan_tpu.envs.hopper_env import HopperConfig, HopperEnv

    env = HopperEnv(HopperConfig(deform_floor_env=True, deform_nodes=True,
                                 init_noise=False, act_noise=False,
                                 obs_noise=False))
    step = jax.jit(env.step)
    s, _ = env.reset(jax.random.PRNGKey(0))
    assert s.phys.field_u is not None and s.phys.field_u.shape == (4,)
    lowest = 0.0
    for _ in range(40):
        out = step(s, jnp.zeros(3))
        s = out.state
        lowest = min(lowest, float(jnp.min(s.phys.field_u)))
    assert np.all(np.isfinite(np.asarray(s.phys.field_u)))
    # the hopper starts near x=0 y=0: the two x0 vertices carry most load
    assert lowest < -1e-4, lowest
    # memory: vertices stay deflected while the robot stands on the face
    assert float(jnp.min(s.phys.field_u)) < -1e-4


def test_laikago_deform_nodes_rollout_sinks_and_couples():
    """Laikago (4 feet near x~0) on the stiff node mattress: the x0-side
    vertices deflect under the standing load and stay finite; deflections
    are shared surface state (one crater, seen by all feet)."""
    from simgan_tpu.envs.laikago_env import LaikagoConfig, LaikagoEnv

    env = LaikagoEnv(LaikagoConfig(deform_floor_env=True, deform_nodes=True,
                                   init_noise=False, act_noise=False,
                                   obs_noise=False))
    step = jax.jit(env.step)
    s, _ = env.reset(jax.random.PRNGKey(1))
    assert s.phys.field_u is not None and s.phys.field_u.shape == (4,)
    for _ in range(25):
        out = step(s, jnp.zeros(12))
        s = out.state
    u = np.asarray(s.phys.field_u)
    assert np.all(np.isfinite(u))
    # standing weight ~25g*9.8=245N/leg concentrated near x0: x0 vertices
    # deflect measurably more than the far (x1) pair on the 84 kN/m field
    assert u.min() < -1e-5, u
    assert abs(u[[0, 2]].mean()) > abs(u[[1, 3]].mean()), u


def test_deform_nodes_vs_surrogate_pytree_compat():
    """Flag off keeps the original pytree (None leaves flatten to nothing),
    so existing rollout/checkpoint code is unaffected."""
    from simgan_tpu.envs.hopper_env import HopperConfig, HopperEnv

    env = HopperEnv(HopperConfig(deform_floor_env=True, init_noise=False,
                                 act_noise=False, obs_noise=False))
    s, _ = env.reset(jax.random.PRNGKey(0))
    assert s.phys.field_u is None
    leaves = jax.tree.leaves(s.phys)
    assert len(leaves) == 2  # q, qd only
