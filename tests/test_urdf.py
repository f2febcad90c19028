"""URDF compiler tests: parse a hand-written URDF, check System equivalence
against the hand-compiled model registry path and simulate it."""

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.core.system import DomainParams, PhysState
from simgan_tpu.core.urdf import parse_urdf
from simgan_tpu.physics.dynamics import compute_dynamics
from simgan_tpu.physics.engine import PhysicsConfig, substep
from simgan_tpu.physics.kinematics import forward_kinematics

PENDULUM = """
<robot name="pendulum">
  <link name="base">
    <inertial><mass value="0"/><origin xyz="0 0 0"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/></inertial>
  </link>
  <link name="arm">
    <inertial><mass value="2.0"/><origin xyz="0 0 -0.5"/>
      <inertia ixx="0.1" ixy="0" ixz="0" iyy="0.1" iyz="0" izz="0.01"/></inertial>
    <collision><origin xyz="0 0 -0.5"/><geometry><sphere radius="0.05"/></geometry></collision>
  </link>
  <link name="tip">
    <inertial><mass value="1.0"/><origin xyz="0 0 0"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.01"/></inertial>
    <collision><geometry><sphere radius="0.03"/></geometry></collision>
  </link>
  <joint name="hinge" type="revolute">
    <parent link="base"/><child link="arm"/>
    <origin xyz="0 0 0"/><axis xyz="0 1 0"/>
    <dynamics damping="0.1"/>
    <limit lower="-3.0" upper="3.0" effort="10" velocity="10"/>
  </joint>
  <joint name="weld" type="fixed">
    <parent link="arm"/><child link="tip"/>
    <origin xyz="0 0 -1.0"/>
  </joint>
</robot>
"""


def test_parse_pendulum_merges_fixed():
    sys = parse_urdf(PENDULUM, fixed_base=True)
    assert sys.n_links == 2          # tip merged into arm
    assert sys.nv == 1
    # merged mass and COM: 2kg@-0.5 + 1kg@-1.0 -> 3kg @ -2/3
    np.testing.assert_allclose(float(sys.mass[1]), 3.0)
    np.testing.assert_allclose(float(sys.com[1][2]), -2.0 / 3.0, rtol=1e-5)
    # tip collision sphere carried over at offset -1.0
    assert sys.n_geoms == 2
    np.testing.assert_allclose(float(sys.geom_offset[1][2]), -1.0, atol=1e-6)


def test_pendulum_dynamics_analytic():
    """Pendulum period/energy vs the analytic point of comparison: with q=90deg
    the gravity torque equals g * sum(m_i * l_i)."""
    sys = parse_urdf(PENDULUM, fixed_base=True)
    dp = DomainParams.default(sys).replace(floor_z=jnp.asarray(-100.0),
                                           joint_damping=jnp.zeros(sys.n_links))
    q = jnp.array([jnp.pi / 2])
    dyn = compute_dynamics(sys, dp, q, jnp.zeros(1))
    # bias at rest = -gravity generalized torque; |tau_g| = g*(2*0.5+1*1.0+... )
    # arm COM merged at -2/3 with m=3: torque = 3*10*(2/3) = 20
    np.testing.assert_allclose(float(dyn.bias[0]), 20.0, rtol=1e-4)
    # inertia about hinge: urdf inertias (0.1+0.01 about own COMs) + parallel axis
    # 2*(0.5^2)+1*(1^2) = 1.5 -> M = 0.1 + 0.01 + 1.5 + tiny
    np.testing.assert_allclose(float(dyn.mass_matrix[0, 0]), 1.61, rtol=1e-3)


def test_parse_box_inertia_fallback():
    urdf = """
    <robot name="boxy">
      <link name="root">
        <inertial><mass value="4.0"/>
          <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/></inertial>
        <collision><geometry><box size="0.2 0.4 0.6"/></geometry></collision>
      </link>
    </robot>
    """
    sys = parse_urdf(urdf, fixed_base=False)
    # box half extents (0.1,0.2,0.3): Ixx = m/3*(0.04+0.09)
    np.testing.assert_allclose(float(sys.inertia[0, 0, 0]), 4 / 3 * 0.13, rtol=1e-5)
    assert sys.n_geoms == 8  # corner spheres


def test_urdf_robot_simulates():
    sys = parse_urdf(PENDULUM, fixed_base=True)
    dp = DomainParams.default(sys).replace(floor_z=jnp.asarray(-100.0))
    cfg = PhysicsConfig(base_pos=(0.0, 0.0, 2.0))
    st = PhysState(q=jnp.array([1.0]), qd=jnp.zeros(1))
    step = jax.jit(lambda s: substep(sys, dp, s, jnp.zeros(len(sys.actuated)), cfg))
    for _ in range(100):
        st = step(st)
    assert bool(jnp.isfinite(st.q).all())
    assert abs(float(st.q[0])) <= 3.0  # within limits
