"""Hopper capsule-capsule self-collision (reference hopper.py:86 loads with
URDF_USE_SELF_COLLISION; btMultiBody filters parent-child pairs, so the
active pairs are torso-leg, torso-foot, thigh-foot).

A joint-limit sweep (see test_reachable below) shows all three pairs CAN
interpenetrate inside the limits — up to ~9 cm when the leg folds fully
(q_thigh ~ q_leg ~ -2.62) — so self-collision must be modeled, not argued
away.  These tests check the detection math against an independent numpy
implementation and check the solver produces separating, energy-sane
responses."""

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.core.system import DomainParams, PhysState
from simgan_tpu.models.hopper import BASE_INIT_POS, make_hopper
from simgan_tpu.physics.contact import _closest_seg_seg
from simgan_tpu.physics.engine import PhysicsConfig, substep
from simgan_tpu.physics.kinematics import forward_kinematics


def _np_seg_dist(p1, q1, p2, q2):
    """Independent numpy closest-distance (Ericson RTCD 5.1.9 style)."""
    d1, d2, r = q1 - p1, q2 - p2, p1 - p2
    a, e = d1 @ d1, d2 @ d2
    b, c, f = d1 @ d2, d1 @ r, d2 @ r
    denom = a * e - b * b
    s = np.clip((b * f - c * e) / denom, 0, 1) if denom > 1e-12 else 0.0
    t = np.clip((b * s + f) / e, 0, 1)
    s = np.clip((b * t - c) / a, 0, 1)
    t = np.clip((b * s + f) / e, 0, 1)
    return np.linalg.norm((p1 + s * d1) - (p2 + t * d2))


def test_closest_seg_seg_matches_numpy():
    rng = np.random.RandomState(0)
    for _ in range(50):
        pts = rng.randn(4, 3)
        c1, c2 = _closest_seg_seg(*[jnp.asarray(p) for p in pts])
        d_jax = float(jnp.linalg.norm(c1 - c2))
        d_np = _np_seg_dist(*pts)
        np.testing.assert_allclose(d_jax, d_np, atol=1e-5)


def _pair_clearances(sys, q):
    """World-space clearance of each self-collision pair at config q."""
    kin = forward_kinematics(sys, jnp.asarray(q, jnp.float32),
                             base_pos=jnp.asarray(BASE_INIT_POS))
    from simgan_tpu.core import maths
    out = []
    for p in range(sys.n_pairs):
        li, lj = sys.pair_link[p]
        seg = sys.pair_seg[p]
        a1 = kin.pos[li] + maths.quat_rotate(kin.quat[li], seg[0, 0])
        b1 = kin.pos[li] + maths.quat_rotate(kin.quat[li], seg[0, 1])
        a2 = kin.pos[lj] + maths.quat_rotate(kin.quat[lj], seg[1, 0])
        b2 = kin.pos[lj] + maths.quat_rotate(kin.quat[lj], seg[1, 1])
        c1, c2 = _closest_seg_seg(a1, b1, a2, b2)
        out.append(float(jnp.linalg.norm(c1 - c2)) - float(sys.pair_radius[p]))
    return out


def test_reachable_interpenetration_exists():
    """The PARITY justification: self-collision is reachable inside joint
    limits, so the pairs are load-bearing."""
    sys = make_hopper()
    # fully folded: thigh and leg at lower limits
    q = [0, 0, 0, -2.61799, -2.61799, -0.6]  # 6 dofs: x, z, rot_y, thigh, leg, foot
    clear = _pair_clearances(sys, q)
    assert min(clear) < -0.02, clear
    # nominal standing config: everything clear
    q0 = [0.0] * 6
    assert min(_pair_clearances(sys, q0)) > 0.05


def test_pairs_inactive_at_rest_change_nothing():
    """With no interpenetration the pair rows contribute exactly zero."""
    sys = make_hopper()
    import dataclasses
    sys_nopair = dataclasses.replace(sys, pair_link=(), pair_seg=None,
                                     pair_radius=None, pair_friction=None)
    dp = DomainParams.default(sys)
    dp = dp.replace(max_forces=jnp.asarray([200.0, 200.0, 200.0]))
    cfg = PhysicsConfig(base_pos=BASE_INIT_POS)
    st = PhysState.zero(sys).replace(
        q=jnp.asarray([0, 0, 0, -0.3, 0.2, 0.1], jnp.float32),
        qd=jnp.asarray(np.linspace(-0.5, 0.5, 6), jnp.float32))
    tau = jnp.asarray([0.3, -0.2, 0.1])
    s1 = substep(sys, dp, st, tau, cfg)
    s2 = substep(sys_nopair, DomainParams.default(sys_nopair).replace(
        max_forces=jnp.asarray([200.0, 200.0, 200.0])), st, tau, cfg)
    np.testing.assert_allclose(np.asarray(s1.qd), np.asarray(s2.qd), atol=1e-6)


def test_folded_config_separates():
    """Starting interpenetrated (leg folded into the torso), the solver
    pushes the pair apart: clearance increases over a few substeps and the
    joints move away from the fold."""
    sys = make_hopper()
    dp = DomainParams.default(sys)
    dp = dp.replace(max_forces=jnp.asarray([200.0, 200.0, 200.0]),
                    floor_z=jnp.asarray(-10.0))   # no floor interference
    cfg = PhysicsConfig(base_pos=BASE_INIT_POS)
    q = jnp.asarray([0, 0, 0, -2.61799, -2.61799, -0.6], jnp.float32)
    st = PhysState.zero(sys).replace(q=q)
    clear0 = min(_pair_clearances(sys, q))
    assert clear0 < -0.02

    def body(s, _):
        s = substep(sys, dp, s, jnp.zeros(3), cfg)
        return s, s.q

    st_end, qs = jax.jit(lambda s: jax.lax.scan(body, s, None, length=40))(st)
    clear1 = min(_pair_clearances(sys, st_end.q))
    assert clear1 > clear0 + 0.005, (clear0, clear1)
    # response is an impulse, not an explosion
    assert float(jnp.max(jnp.abs(st_end.qd))) < 50.0
