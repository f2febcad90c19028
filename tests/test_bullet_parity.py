"""Contact-model macro-parity vs Bullet's documented soft-constraint semantics.

pybullet cannot run in this image (no pip installs), so instead of trajectory
diffs these tests assert the *closed-form macro behaviors* that Bullet's
ERP/CFM soft-contact mapping produces in the exact parameter regimes the
reference trains in:

  * canonical hybrid-sim floor: contactStiffness k=1.0, contactDamping
    d=1000-2000 (the canonical floor sets foot k=1, d=1000 at
    hopper_env_combined_policy.py:165-178; pi_dyn then rewrites d within
    exp([1,3])*2 = [5.44, 40.2] each step — :270-287's code, NOT the
    "20 ~ 2000" its comment claims);
  * deformable mattress surrogate: spring stiffness/damping 1500/50 (hopper,
    hopper_env_v3.py:143-149) and 60000/150 (laikago, laikago_env_v4.py:
    177-183), modeled as a compliant half-space with ``combine='floor'``.

Derivations (Bullet manual, constraint-softness section; the same mapping our
solver implements in physics/contact.py:110-115):

    erp = dt*k / (dt*k + d)          cfm = 1 / (dt*k + d)

With one resting contact of supported mass m, the converged row equation is
``v' + (cfm/dt)*lam = (erp/dt)*depth`` and each substep must absorb the
gravity impulse ``lam = m*g*dt``:

  (1) k=1, d>>1 regime  =>  erp ~ 0: no positional correction; steady state
      is a constant SINK VELOCITY  v_sink = m*g*cfm = m*g/(dt*k + d).
      (The reference's canonical floor is viscous, not springy.)
  (2) mattress regime (erp > 0): equilibrium where pushout balances the
      gravity impulse =>  PENETRATION DEPTH  depth* = m*g/k  — exactly a
      spring of stiffness k.  The d only sets the settling rate.
  (3) restitution: approach speed v > threshold 0.2 gives a velocity bias
      e*v; with softness s = cfm/dt the rebound is
      v' = (e*v + s*m*v)/(1 + s*m)  ->  e*v as k -> inf.  Below the
      threshold: no bounce (penetration handling only).
  (4) Coulomb friction: tangent rows clamp at mu*lam_n, so a sliding ball
      under gravity decelerates at a = mu*g until it stops, and stays
      stopped (no reversal).

All tests run the real engine substep (physics/engine.py) on a minimal
1-geom system so every number is analytically checkable.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simgan_tpu.core.system import (FREE, PRISMATIC, REVOLUTE, DomainParams,
                                    PhysState, make_system)
from simgan_tpu.physics.contact import ContactConfig
from simgan_tpu.physics.engine import PhysicsConfig, substep

DT = 1.0 / 500.0
G = 10.0  # reference setGravity(0,0,-10)


def make_ball(mass=1.0, radius=0.1, dofs=("z",)):
    """Fixed-base chain of prismatic joints ending in one contact sphere.

    dofs: subset of ("x", "z", "rz") — lateral slide, drop, spin.
    """
    axis_of = {"x": [1, 0, 0], "z": [0, 0, 1], "rz": [0, 0, 1]}
    L = 1 + len(dofs)
    parent = [-1] + list(range(L - 1))
    joint_type = [FREE] + [REVOLUTE if d == "rz" else PRISMATIC for d in dofs]
    joint_axis = [[0, 0, 1]] + [axis_of[d] for d in dofs]
    mass_l = [0.0] * (L - 1) + [mass]
    inertia = [[1e-9] * 3] * (L - 1) + [[0.4 * mass * radius**2] * 3]
    return make_system(
        name="ball", parent=parent, joint_type=joint_type,
        joint_pos=[[0, 0, 0]] * L, joint_rpy=[[0, 0, 0]] * L,
        joint_axis=joint_axis, mass=mass_l,
        com=[[0, 0, 0]] * L, inertia_diag=inertia,
        joint_damping=[0.0] * L, joint_lower=[-100.0] * L,
        joint_upper=[100.0] * L, actuated=[], fixed_base=True,
        geom_link=[L - 1], geom_offset=[[0, 0, 0]], geom_radius=[radius],
    )


def run_substeps(sys, dp, state, cfg, n):
    def body(s, _):
        s = substep(sys, dp, s, jnp.zeros((0,)), cfg)
        return s, (s.q, s.qd)
    return jax.jit(lambda s: jax.lax.scan(body, s, None, length=n))(state)


def ball_params(sys, *, k_geom=1.0, d_geom=0.0, mu_geom=1.0, e_geom=0.0,
                spin_geom=0.0, floor=dict()):
    dp = DomainParams.default(sys)
    Gn = sys.n_geoms
    dp = dp.replace(
        contact_stiffness=jnp.full(Gn, k_geom),
        contact_damping=jnp.full(Gn, d_geom),
        lateral_friction=jnp.full(Gn, mu_geom),
        restitution=jnp.full(Gn, e_geom),
        spinning_friction=jnp.full(Gn, spin_geom),
        floor_friction=jnp.asarray(floor.get("friction", 1.0)),
        floor_spinning_friction=jnp.asarray(floor.get("spin", 0.0)),
        floor_restitution=jnp.asarray(floor.get("restitution", 1.0)),
        floor_stiffness=jnp.asarray(floor.get("k", 1e9)),
        floor_damping=jnp.asarray(floor.get("d", 0.0)),
        floor_z=jnp.asarray(0.0),
    )
    return dp


@pytest.mark.parametrize("d", [1000.0, 2000.0])
def test_canonical_floor_is_viscous_sink(d):
    """(1): k=1, d=1000/2000 — the regime pi_dyn writes via changeDynamics.

    Combined stiffness: series(k_geom=1, k_floor=1e9) ~ 1; combined damping:
    d_geom + d_floor = d.  Expected steady sink speed m*g/(dt*k + d)."""
    m, r = 2.0, 0.1
    sys = make_ball(mass=m, radius=r)
    dp = ball_params(sys, k_geom=1.0, d_geom=d, floor=dict(k=1e9, d=0.0))
    cfg = PhysicsConfig(dt=DT, gravity=-G)
    # start just touching the floor
    st = PhysState(q=jnp.array([r]), qd=jnp.array([0.0]))
    _, (qs, qds) = run_substeps(sys, dp, st, cfg, 3000)
    v_expected = -m * G / (DT * 1.0 + d)
    v_late = np.asarray(qds[-500:, 0])
    np.testing.assert_allclose(v_late.mean(), v_expected, rtol=0.03)
    # and effectively no positional correction: monotone sinking, erp ~ 2e-6
    assert float(qs[-1, 0]) < float(qs[1000, 0]) < r


@pytest.mark.parametrize("k,d,settle", [(1500.0, 50.0, 4000),
                                        (60000.0, 150.0, 4000)])
def test_deform_mattress_penetration_equals_mg_over_k(k, d, settle):
    """(2): the deform-floor surrogate (combine='floor', hopper 1500/50 and
    laikago 60000/150 spring constants) reaches depth* = m*g/k."""
    m, r = 5.0, 0.1
    sys = make_ball(mass=m, radius=r)
    dp = ball_params(sys, floor=dict(k=k, d=d))
    cfg = PhysicsConfig(dt=DT, gravity=-G,
                        contact=ContactConfig(combine="floor"))
    st = PhysState(q=jnp.array([r]), qd=jnp.array([0.0]))
    _, (qs, qds) = run_substeps(sys, dp, st, cfg, settle)
    depth = r - float(qs[-1, 0])
    np.testing.assert_allclose(depth, m * G / k, rtol=0.05)
    # settled: residual velocity far below the k=1 sink regime
    assert abs(float(qds[-1, 0])) < 1e-3


def test_restitution_bounce_and_threshold():
    """(3): e=0.8 ball bouncing on a stiff floor rebounds at ~e*v_in above
    the 0.2 m/s threshold and does not bounce below it.

    The k, d are chosen so erp = dt*k/(dt*k + d) ~ 0.2 (Bullet's default
    contact erp2), so the one-substep penetration pushout (erp * v_in) stays
    below the restitution bias (e * v_in) — the regime where restitution is
    observable.  The full one-row prediction from the documented semantics:
      after one free substep: v_free = -(v_in + g*dt), pen = |v_free|*dt
      rhs  = max(e*(v_in + g*dt), (erp/dt)*pen)
      lam  = (rhs - v_free) / (1/m + cfm/dt)
      v'   = v_free + lam/m
    """
    m, r, e = 1.0, 0.1, 0.8
    k_geom, k_floor = 1e9, 1e7
    k_eff = k_geom * k_floor / (k_geom + k_floor)   # series combine rule
    d_eff = 4.0 * DT * k_eff                        # => erp = 0.2 exactly
    sys = make_ball(mass=m, radius=r)
    dp = ball_params(sys, k_geom=k_geom, d_geom=0.0, e_geom=e,
                     floor=dict(k=k_floor, d=d_eff, restitution=1.0))
    cfg = PhysicsConfig(dt=DT, gravity=-G)

    v_in = 1.0
    st = PhysState(q=jnp.array([r]), qd=jnp.array([-v_in]))  # phi=0: 1 free substep
    _, (qs, qds) = run_substeps(sys, dp, st, cfg, 50)
    v_out = float(np.max(np.asarray(qds[:, 0])))

    erp = DT * k_eff / (DT * k_eff + d_eff)
    cfm = 1.0 / (DT * k_eff + d_eff)
    v_free = -(v_in + G * DT)
    pen = -v_free * DT
    rhs = max(e * (v_in + G * DT), (erp / DT) * pen)
    lam = (rhs - v_free) / (1.0 / m + cfm / DT)
    v_pred = v_free + lam / m
    np.testing.assert_allclose(v_out, v_pred, rtol=0.03)
    # and the macro claim: rebound ~ e * v_in
    assert abs(v_out - e * v_in) < 0.05 * v_in

    # below the 0.2 m/s restitution threshold: no rebound beyond pushout
    st = PhysState(q=jnp.array([r]), qd=jnp.array([-0.1]))
    _, (_, qds) = run_substeps(sys, dp, st, cfg, 50)
    assert float(np.max(np.asarray(qds[:, 0]))) < 0.25 * 0.1


def test_coulomb_sliding_friction_deceleration():
    """(4): sliding ball decelerates at mu*g and stays stopped.

    mu_combined = mu_geom * mu_floor = 1.4 * 0.5 = 0.7 (the reference floor
    friction is 0.5, hopper_env_combined_policy.py:165-178)."""
    m, r = 3.0, 0.1
    sys = make_ball(mass=m, radius=r, dofs=("x", "z"))
    dp = ball_params(sys, k_geom=1.0, d_geom=2000.0, mu_geom=1.4,
                     floor=dict(k=1e9, d=0.0, friction=0.5))
    cfg = PhysicsConfig(dt=DT, gravity=-G)
    v0 = 1.0
    st = PhysState(q=jnp.array([0.0, r]), qd=jnp.array([v0, 0.0]))
    n = 1000
    _, (qs, qds) = run_substeps(sys, dp, st, cfg, n)
    vx = np.asarray(qds[:, 0])
    mu = 1.4 * 0.5
    # deceleration while sliding (first 30 ms, well before stopping)
    t0, t1 = 5, 15
    a_meas = (vx[t1] - vx[t0]) / ((t1 - t0) * DT)
    np.testing.assert_allclose(a_meas, -mu * G, rtol=0.05)
    # stops at ~ v0/(mu*g) and never reverses
    assert abs(vx[-1]) < 1e-3
    assert np.min(vx) > -1e-3


def test_torsional_friction_spin_down():
    """Torsional (spinning) friction row: angular deceleration clamps at
    mu_spin * lam_n / I_z  (lam_n = m*g*dt per substep)."""
    m, r = 1.0, 0.1
    sys = make_ball(mass=m, radius=r, dofs=("z", "rz"))
    dp = ball_params(sys, k_geom=1.0, d_geom=2000.0, spin_geom=0.4,
                     floor=dict(k=1e9, d=0.0, friction=0.5))
    cfg = PhysicsConfig(dt=DT, gravity=-G)
    w0 = 30.0
    st = PhysState(q=jnp.array([r - 1e-4, 0.0]), qd=jnp.array([0.0, w0]))
    _, (_, qds) = run_substeps(sys, dp, st, cfg, 400)
    w = np.asarray(qds[:, 1])
    # combined mu_spin = spin_geom * mu_floor + spin_floor * mu_geom = 0.2
    mu_spin = 0.4 * 0.5
    I_z = 0.4 * m * r**2
    # alpha = mu_spin * lam_n / (I_z * dt), lam_n = m*g*dt  =>  500 rad/s^2;
    # measure while still spinning (w0/alpha = 60 ms = 30 substeps)
    alpha_expected = mu_spin * (m * G) / I_z
    t0, t1 = 8, 16
    a_meas = (w[t1] - w[t0]) / ((t1 - t0) * DT)
    np.testing.assert_allclose(a_meas, -alpha_expected, rtol=0.1)
    # spins down, never reverses
    assert np.min(w) > -1e-2
