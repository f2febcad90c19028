"""Laikago leg-leg self-collision (VERDICT r2 item 3a).

The reference loads laikago with URDF_USE_SELF_COLLISION
(my_pybullet_envs/laikago.py:104).  The modeled capsule pairs (left-right
upper-upper / lower-lower, same-side fore-aft lower-lower;
models/laikago.py) were selected by a trajectory-distribution clearance
sweep over expert data (scripts/laika_selfcol_sweep.py): each engages in
0.3-2.5% of gait/fall frames with penetrations up to 10 cm when
self-collision is unmodeled.

Reachability proof: the configs below are inside the ctrl joint limits
(hip +-0.873/1.0472, upper -1.3/3.4, knee -2.164/0) and interpenetrate the
pair by >= 5 cm, while the nominal standing pose clears every pair by
>= 13 cm -- self-collision is load-bearing, not vestigial, and the pairs
contribute nothing at rest.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.core import maths
from simgan_tpu.core.system import DomainParams, PhysState
from simgan_tpu.models.laikago import BASE_INIT_EULER, BASE_INIT_POS, make_laikago
from simgan_tpu.physics.contact import _closest_seg_seg
from simgan_tpu.physics.engine import PhysicsConfig, substep
from simgan_tpu.physics.kinematics import forward_kinematics

# joint-limit-respecting configs found by random search in
# scripts/laika_selfcol_sweep.py geometry (seed 3, 100k samples)
Q_LOWER_CROSS = [0.371, 3.287, -1.391, 0.628, 2.933, -0.297,
                 0.384, 2.865, -1.387, 0.893, 3.146, -1.477]   # FR-FL lower pen 6 cm
Q_UPPER_CROSS = [1.023, 2.758, -0.536, 0.128, 2.879, -2.149,
                 0.817, 1.456, -0.495, 0.111, 0.568, -2.055]   # FR-FL upper pen 10 cm
Q_FORE_AFT = [-0.751, 1.211, -1.932, 0.703, 2.963, -2.118,
              -0.177, -1.205, -1.616, 0.946, 2.837, -1.516]    # FR-RR lower pen 6 cm
Q_NOMINAL = [0.0, 0.0, -0.5] * 4


def _full_q(sys, q12):
    quat = maths.quat_from_euler(jnp.asarray(BASE_INIT_EULER))
    return jnp.concatenate([jnp.asarray(BASE_INIT_POS), quat,
                            jnp.asarray(q12, jnp.float32)])


def _pair_clearances(sys, q12):
    kin = forward_kinematics(sys, _full_q(sys, q12))
    out = {}
    for p in range(sys.n_pairs):
        li, lj = sys.pair_link[p]
        seg = sys.pair_seg[p]
        a1 = kin.pos[li] + maths.quat_rotate(kin.quat[li], seg[0, 0])
        b1 = kin.pos[li] + maths.quat_rotate(kin.quat[li], seg[0, 1])
        a2 = kin.pos[lj] + maths.quat_rotate(kin.quat[lj], seg[1, 0])
        b2 = kin.pos[lj] + maths.quat_rotate(kin.quat[lj], seg[1, 1])
        c1, c2 = _closest_seg_seg(a1, b1, a2, b2)
        out[(li, lj)] = float(jnp.linalg.norm(c1 - c2)) - float(sys.pair_radius[p])
    return out


def test_pair_count_and_nominal_clearance():
    sys = make_laikago()
    assert sys.n_pairs == 6
    clear = _pair_clearances(sys, Q_NOMINAL)
    assert min(clear.values()) > 0.1, clear


def test_reachable_interpenetration_exists():
    sys = make_laikago()
    up = {leg: 2 + 3 * i for i, leg in enumerate(["FR", "FL", "RR", "RL"])}
    lo = {leg: 3 + 3 * i for i, leg in enumerate(["FR", "FL", "RR", "RL"])}
    c1 = _pair_clearances(sys, Q_LOWER_CROSS)
    assert c1[(lo["FR"], lo["FL"])] < -0.05, c1
    c2 = _pair_clearances(sys, Q_UPPER_CROSS)
    assert c2[(up["FR"], up["FL"])] < -0.08, c2
    c3 = _pair_clearances(sys, Q_FORE_AFT)
    assert c3[(lo["FR"], lo["RR"])] < -0.05, c3
    # all configs inside ctrl limits
    for q in (Q_LOWER_CROSS, Q_UPPER_CROSS, Q_FORE_AFT):
        q = np.asarray(q).reshape(4, 3)
        assert (q >= np.array([-0.873, -1.3, -2.164]) - 1e-6).all()
        assert (q <= np.array([1.0472, 3.4, 0.0]) + 1e-6).all()


def test_pairs_inactive_at_nominal_change_nothing():
    sys = make_laikago()
    sys_np = dataclasses.replace(sys, pair_link=(), pair_seg=None,
                                 pair_radius=None, pair_friction=None)
    cfg = PhysicsConfig()
    st = PhysState.zero(sys).replace(q=_full_q(sys, Q_NOMINAL))
    tau = jnp.asarray(np.linspace(-3, 3, 12), jnp.float32)

    def dp_for(s):
        return DomainParams.default(s).replace(max_forces=jnp.full(12, 30.0))

    s1 = substep(sys, dp_for(sys), st, tau, cfg)
    s2 = substep(sys_np, dp_for(sys_np), st, tau, cfg)
    np.testing.assert_allclose(np.asarray(s1.qd), np.asarray(s2.qd), atol=1e-6)


def test_crossed_legs_separate():
    """Starting with the FR/FL lower legs interpenetrated, the solver pushes
    them apart without blowing up."""
    sys = make_laikago()
    dp = DomainParams.default(sys).replace(
        max_forces=jnp.full(12, 30.0), floor_z=jnp.asarray(-10.0))
    cfg = PhysicsConfig()
    st = PhysState.zero(sys).replace(q=_full_q(sys, Q_LOWER_CROSS))
    lo = {leg: 3 + 3 * i for i, leg in enumerate(["FR", "FL", "RR", "RL"])}
    key = (lo["FR"], lo["FL"])
    clear0 = _pair_clearances(sys, Q_LOWER_CROSS)[key]
    assert clear0 < -0.05

    def body(s, _):
        s = substep(sys, dp, s, jnp.zeros(12), cfg)
        return s, None

    st_end, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=40))(st)
    clear1 = _pair_clearances(sys, np.asarray(st_end.q[7:]))[key]
    assert clear1 > clear0 + 0.005, (clear0, clear1)
    assert float(jnp.max(jnp.abs(st_end.qd))) < 60.0
