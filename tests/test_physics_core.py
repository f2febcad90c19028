"""Unit tests for core math + the physics engine.

The reference has no test suite (SURVEY.md §4); this pyramid validates the
rebuilt engine against physical invariants and independent AD-computed
references instead of PyBullet traces (pybullet is not available in the
image)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simgan_tpu.core import maths
from simgan_tpu.core.system import DomainParams, PhysState
from simgan_tpu.models.hopper import BASE_INIT_POS, make_hopper
from simgan_tpu.models.laikago import BASE_INIT_EULER, BASE_INIT_POS as LAIKA_POS, INIT_Q, make_laikago
from simgan_tpu.physics.contact import ContactConfig
from simgan_tpu.physics.dynamics import compute_dynamics
from simgan_tpu.physics.engine import PhysicsConfig, control_step, substep
from simgan_tpu.physics.kinematics import forward_kinematics


# ---------------------------------------------------------------------------
# math
# ---------------------------------------------------------------------------

def test_quat_roundtrips():
    rng = np.random.RandomState(0)
    for _ in range(20):
        q = rng.randn(4)
        q = q / np.linalg.norm(q)
        q = jnp.asarray(q)
        m = maths.quat_to_mat(q)
        q2 = maths.mat_to_quat(m)
        # q and -q are the same rotation
        assert min(np.linalg.norm(q - q2), np.linalg.norm(q + q2)) < 1e-5
        v = jnp.asarray(rng.randn(3))
        np.testing.assert_allclose(maths.quat_rotate(q, v), m @ v, atol=1e-5)


def test_euler_matches_pybullet_convention():
    # R = Rz(yaw) Ry(pitch) Rx(roll)
    rpy = jnp.array([0.3, -0.4, 1.1])
    q = maths.quat_from_euler(rpy)
    def rx(a): return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    def ry(a): return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
    def rz(a): return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
    R = rz(1.1) @ ry(-0.4) @ rx(0.3)
    np.testing.assert_allclose(maths.quat_to_mat(q), R, atol=1e-6)
    np.testing.assert_allclose(maths.quat_to_euler(q), rpy, atol=1e-6)


def test_laikago_init_orientation_maps_forward():
    # URDF z -> world x, URDF y -> world z (SURVEY: laikago.py:60 convention)
    q = maths.quat_from_euler(jnp.array(BASE_INIT_EULER))
    np.testing.assert_allclose(maths.quat_rotate(q, jnp.array([0.0, 0, 1])), [1, 0, 0], atol=1e-4)
    np.testing.assert_allclose(maths.quat_rotate(q, jnp.array([0.0, 1, 0])), [0, 0, 1], atol=1e-4)


# ---------------------------------------------------------------------------
# kinematics / dynamics
# ---------------------------------------------------------------------------

def _hopper_state(q=None, qd=None):
    sys = make_hopper()
    st = PhysState.zero(sys)
    if q is not None:
        st = st.replace(q=jnp.asarray(q, dtype=jnp.float32))
    if qd is not None:
        st = st.replace(qd=jnp.asarray(qd, dtype=jnp.float32))
    return sys, st


def test_hopper_fk_heights():
    sys, st = _hopper_state()
    kin = forward_kinematics(sys, st.q, base_pos=jnp.asarray(BASE_INIT_POS))
    # zero config: torso frame at 1.3, thigh joint at 1.1, leg at 0.65, foot at 0.15
    np.testing.assert_allclose(kin.pos[3], [0, 0, 1.3], atol=1e-6)
    np.testing.assert_allclose(kin.pos[4], [0, 0, 1.1], atol=1e-6)
    np.testing.assert_allclose(kin.pos[5], [0, 0, 0.65], atol=1e-6)
    np.testing.assert_allclose(kin.pos[6], [0, 0, 0.15], atol=1e-6)
    # prismatic roots translate the whole chain
    q2 = st.q.at[0].set(0.5).at[1].set(0.2)
    kin2 = forward_kinematics(sys, q2, base_pos=jnp.asarray(BASE_INIT_POS))
    np.testing.assert_allclose(kin2.pos[6], [0.5, 0, 0.35], atol=1e-5)


def test_mass_matrix_matches_kinetic_energy_hessian():
    """M from jacobian assembly == Hessian_qd of the kinetic energy (indep path)."""
    sys = make_hopper()
    dp = DomainParams.default(sys)
    q = jnp.asarray(np.random.RandomState(1).uniform(-0.4, 0.4, 6), dtype=jnp.float32)

    dyn = compute_dynamics(sys, dp, q, jnp.zeros(6), base_pos=jnp.asarray(BASE_INIT_POS))

    def kinetic(qd):
        k = forward_kinematics(sys, q, base_pos=jnp.asarray(BASE_INIT_POS))
        t = 0.0
        for i in range(sys.n_links):
            v = k.jv[i] @ qd
            w = k.jw[i] @ qd
            R = maths.quat_to_mat(k.quat[i])
            Iw = R @ sys.inertia[i] @ R.T
            t = t + 0.5 * sys.mass[i] * v @ v + 0.5 * w @ Iw @ w
        return t

    H = jax.hessian(kinetic)(jnp.zeros(6))
    np.testing.assert_allclose(dyn.mass_matrix, H, atol=1e-4)


def test_hopper_lagrangian_bias_crosscheck():
    """bias == Mdot qd - dT/dq + dV/dq via pure autodiff (fixed base => plain q)."""
    sys = make_hopper()
    dp = DomainParams.default(sys)
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.uniform(-0.3, 0.3, 6), dtype=jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, 6), dtype=jnp.float32)
    base = jnp.asarray(BASE_INIT_POS)

    dyn = compute_dynamics(sys, dp, q, qd, base_pos=base)

    def mass_mat(q_):
        return compute_dynamics(sys, dp, q_, jnp.zeros(6), base_pos=base).mass_matrix

    def kinetic(q_, qd_):
        return 0.5 * qd_ @ mass_mat(q_) @ qd_

    def potential(q_):
        k = forward_kinematics(sys, q_, base_pos=base)
        return jnp.sum(10.0 * sys.mass * jnp.stack(k.com)[:, 2])  # g = 10

    mdot_qd = jax.jvp(lambda q_: mass_mat(q_) @ qd, (q,), (qd,))[1]
    bias_ref = mdot_qd - jax.grad(kinetic)(q, qd) + jax.grad(potential)(q)
    np.testing.assert_allclose(dyn.bias, bias_ref, atol=2e-3)


def test_free_fall_no_contact():
    sys = make_hopper()
    dp = DomainParams.default(sys).replace(floor_z=jnp.asarray(-100.0), joint_damping=jnp.zeros(7))
    cfg = PhysicsConfig(base_pos=BASE_INIT_POS)
    st = PhysState.zero(sys)
    for _ in range(50):
        st = substep(sys, dp, st, jnp.zeros(3), cfg)
    t = 50 * cfg.dt
    # rootz should follow -1/2 g t^2 closely (semi-implicit euler, g=10)
    assert abs(float(st.q[1]) - (-0.5 * 10 * t**2)) < 2e-3
    assert abs(float(st.qd[1]) - (-10 * t)) < 1e-4


def test_energy_conservation_pendulum_mode():
    """No damping/friction/contact: total energy drift stays small at 500Hz."""
    sys = make_hopper()
    dp = DomainParams.default(sys).replace(floor_z=jnp.asarray(-100.0), joint_damping=jnp.zeros(7))
    sys = sys.replace(joint_friction=jnp.zeros(7))
    cfg = PhysicsConfig(base_pos=BASE_INIT_POS)
    st = PhysState.zero(sys).replace(q=jnp.array([0, 0, 0.3, -0.5, 0.2, 0.1], dtype=jnp.float32))

    def energy(s):
        dyn = compute_dynamics(sys, dp, s.q, s.qd, base_pos=jnp.asarray(BASE_INIT_POS))
        k = dyn.kin
        return 0.5 * s.qd @ dyn.mass_matrix @ s.qd + jnp.sum(10.0 * sys.mass * jnp.stack(k.com)[:, 2])

    e0 = float(energy(st))
    step = jax.jit(lambda s: substep(sys, dp, s, jnp.zeros(3), cfg))
    for _ in range(250):  # 0.5 s
        st = step(st)
    e1 = float(energy(st))
    assert abs(e1 - e0) / max(abs(e0), 1.0) < 0.02


def test_resting_contact_supports_robot():
    """Hopper with joints locked (huge implicit damping) settles on the floor.

    (With free joints the unactuated hopper physically buckles under gravity
    — the reference env needs a policy to stand — so the static-support test
    locks the chain.)  Also regression-tests implicit joint damping
    stability for large damping values."""
    sys = make_hopper()
    dp = DomainParams.default(sys)
    dp = dp.replace(
        floor_friction=jnp.asarray(0.8), floor_restitution=jnp.asarray(0.0),
        restitution=jnp.zeros(sys.n_geoms),
        floor_stiffness=jnp.asarray(10000.0), floor_damping=jnp.asarray(2000.0),
        contact_stiffness=jnp.full(sys.n_geoms, 10000.0),
        joint_damping=jnp.array([0, 0, 0, 0, 1e4, 1e4, 1e4]),
    )
    cfg = PhysicsConfig(base_pos=BASE_INIT_POS)
    # start just above floor: foot bottom at z = 1.3-0.2-0.45-0.5 - 0.06 = 0.09
    st = PhysState.zero(sys)
    step = jax.jit(lambda s: substep(sys, dp, s, jnp.zeros(3), cfg))
    for _ in range(1500):  # 3 s
        st = step(st)
    kin = forward_kinematics(sys, st.q, base_pos=jnp.asarray(BASE_INIT_POS))
    foot_bottom = float(kin.com[6][2]) - 0.06
    assert foot_bottom > -0.05            # did not fall through
    assert abs(float(st.qd[1])) < 0.05    # settled
    assert abs(float(st.q[3])) < 0.01     # joints held by implicit damping


def test_restitution_bounce():
    """High restitution (pi_dyn can set up to 15) must bounce the foot."""
    sys = make_hopper()
    dp = DomainParams.default(sys).replace(
        restitution=jnp.full(sys.n_geoms, 1.0),
        floor_restitution=jnp.asarray(1.0),
        floor_damping=jnp.asarray(1e7),   # near-rigid
        floor_stiffness=jnp.asarray(1e7),
        contact_stiffness=jnp.full(sys.n_geoms, 1e7),
    )
    cfg = PhysicsConfig(base_pos=BASE_INIT_POS)
    st = PhysState.zero(sys).replace(qd=jnp.array([0, -1.0, 0, 0, 0, 0], dtype=jnp.float32))
    # drop from slightly above the floor, watch vertical velocity flip sign
    st = st.replace(q=st.q.at[1].set(-0.085))  # foot bottom ~5mm above floor
    step = jax.jit(lambda s: substep(sys, dp, s, jnp.zeros(3), cfg))
    bounced = False
    for _ in range(100):
        st = step(st)
        if float(st.qd[1]) > 0.3:
            bounced = True
            break
    assert bounced


def test_friction_stops_sliding():
    """Sliding hopper (joints locked) is arrested by friction; slides freely
    with mu=0.  Displacement-based because the decelerating body physically
    rocks on its flat foot (velocity oscillates around zero)."""
    sys = make_hopper()
    mkdp = lambda mu: DomainParams.default(sys).replace(
        floor_friction=jnp.asarray(mu), lateral_friction=jnp.full(sys.n_geoms, 1.0),
        floor_restitution=jnp.asarray(0.0), restitution=jnp.zeros(sys.n_geoms),
        floor_damping=jnp.asarray(50000.0), floor_stiffness=jnp.asarray(50000.0),
        contact_stiffness=jnp.full(sys.n_geoms, 50000.0),
        joint_damping=jnp.array([0, 0, 0, 0, 1e4, 1e4, 1e4]),
    )
    cfg = PhysicsConfig(base_pos=BASE_INIT_POS)
    # resting on floor with initial x velocity 1 m/s
    st0 = PhysState.zero(sys).replace(
        q=jnp.array([0, -0.0899, 0, 0, 0, 0], dtype=jnp.float32),
        qd=jnp.array([1.0, 0, 0, 0, 0, 0], dtype=jnp.float32),
    )
    final_x = {}
    for mu in (0.0, 0.8):
        st = st0
        step = jax.jit(lambda s, mu=mu: substep(sys, mkdp(mu), s, jnp.zeros(3), cfg))
        for _ in range(250):  # 0.5 s
            st = step(st)
        final_x[mu] = float(st.q[0])
    # mu g = 8 m/s^2 stops 1 m/s in ~0.125 s, ~6 cm travelled
    assert final_x[0.8] < 0.2
    assert final_x[0.0] > 0.45          # frictionless keeps sliding


def test_laikago_stands_briefly():
    """Floating-base sanity: unactuated laikago on a stiff floor collapses
    gracefully (legs fold to the knee limit) and comes to rest on the floor —
    state stays finite, no fall-through, no energy blow-up."""
    sys = make_laikago()
    dp = DomainParams.default(sys).replace(
        floor_friction=jnp.asarray(0.5), floor_restitution=jnp.asarray(0.0),
        restitution=jnp.zeros(sys.n_geoms),
        floor_damping=jnp.asarray(2000.0),
    )
    cfg = PhysicsConfig()
    quat = maths.quat_from_euler(jnp.asarray(BASE_INIT_EULER))
    q = jnp.concatenate([jnp.asarray(LAIKA_POS), quat, jnp.asarray(INIT_Q)]).astype(jnp.float32)
    st = PhysState(q=q, qd=jnp.zeros(sys.nv))
    step = jax.jit(lambda s: substep(sys, dp, s, jnp.zeros(12), cfg))
    for _ in range(250):
        st = step(st)
        assert bool(jnp.all(jnp.isfinite(st.q))), "state blew up"
    # base z ends in the collapsed-resting range (no fall-through, no launch)
    kin = forward_kinematics(sys, st.q)
    assert 0.04 < float(kin.com[0][2]) < 0.7


def test_vmap_consistency():
    """vmapped substep == per-env substep (core contract of the vec-env rebuild)."""
    sys = make_hopper()
    dp = DomainParams.default(sys)
    cfg = PhysicsConfig(base_pos=BASE_INIT_POS)
    rng = np.random.RandomState(3)
    qs = jnp.asarray(rng.uniform(-0.2, 0.2, (4, 6)), dtype=jnp.float32)
    qds = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 6)), dtype=jnp.float32)
    taus = jnp.asarray(rng.uniform(-50, 50, (4, 3)), dtype=jnp.float32)

    single = [substep(sys, dp, PhysState(q=qs[i], qd=qds[i]), taus[i], cfg) for i in range(4)]
    batched = jax.vmap(lambda q, qd, t: substep(sys, dp, PhysState(q=q, qd=qd), t, cfg))(qs, qds, taus)
    for i in range(4):
        np.testing.assert_allclose(batched.q[i], single[i].q, atol=1e-5)
        np.testing.assert_allclose(batched.qd[i], single[i].qd, atol=1e-5)


def test_control_step_runs_jitted():
    sys = make_hopper()
    dp = DomainParams.default(sys)
    cfg = PhysicsConfig(base_pos=BASE_INIT_POS)
    st = PhysState.zero(sys)
    out = jax.jit(lambda s: control_step(sys, dp, s, jnp.array([0.1, -0.1, 0.05]), cfg))(st)
    assert out.q.shape == (6,)
    assert bool(jnp.all(jnp.isfinite(out.q)))
