"""Contact-solver fidelity under the TRAINING distribution (VERDICT r2
items 2+3c).

Context (measured by scripts/solver_fidelity_diag.py, round 3):

* Trajectory-level parity with cold PGS@100 is NOT achievable over the
  identification distribution (pi_dyn-randomized contact params: lateral/
  spin 0-5, restitution 0-15, damping 20-2000,
  laikago_env_combined_policy.py:365-386): with restitution near/above 1
  the dynamics are chaotic and even the production warm-PGS@5 diverges to
  O(1) trajectory error within 25 control steps (as would any two solvers
  differing at 1e-6).  The meaningful metric is ONE-control-step error
  from identical states, which isolates solver error from chaos:

      pgs@5+warm  1-step qd err  mean 3.5e-2   (production, all envs)
      pgs@10+warm                mean 1.1e-2
      staged@5..80+warm          mean 1.7e-1 .. 2.8e-1  (does NOT converge)

* The 'staged' solver (all-normal-rows then all-friction-rows matvec
  sweeps) converges on the benign target-env distribution it was validated
  on in round 2, but STALLS on bouncy/high-friction pi_dyn draws — its
  block iteration cycles between the normal and friction stages.  It is
  therefore NOT used by the experiment pipeline (scripts/run_experiment.py
  defaults to pgs); the identification wall-clock fix is the rollout shape
  (128 lanes x 125 steps), which keeps the physics byte-identical.

This test pins both facts so they cannot silently regress: the production
solver's one-step error stays bounded, and it stays several times more
accurate than staged at equal sweep count.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simgan_tpu.core import maths
from simgan_tpu.core.system import DomainParams, PhysState
from simgan_tpu.models.laikago import (BASE_INIT_EULER, BASE_INIT_POS,
                                       INIT_Q, MAX_FORCES, make_laikago)
from simgan_tpu.physics.contact import ContactConfig
from simgan_tpu.physics.engine import PhysicsConfig, control_step

slow = pytest.mark.skipif(
    not os.environ.get("SIMGAN_RUN_SLOW"), reason="set SIMGAN_RUN_SLOW=1")


def _gait_state(sys, n_ctrl=40, seed=0):
    """Roll a sinusoidal trot from stance; return the final state (contact
    switching, sliding, multi-foot support)."""
    quat = np.asarray(maths.quat_from_euler(jnp.asarray(BASE_INIT_EULER)))
    q0 = np.concatenate([BASE_INIT_POS, quat, INIT_Q]).astype(np.float32)
    dp = DomainParams.default(sys).replace(max_forces=jnp.asarray(MAX_FORCES))
    cfg = PhysicsConfig(contact=ContactConfig(iterations=10, warm_start=True))
    st = PhysState(q=jnp.asarray(q0), qd=jnp.zeros(sys.nv))

    def body(s, t):
        phase = 2.0 * jnp.pi * t / 25.0
        a = 0.4 * jnp.sin(phase + jnp.arange(12.0)) * jnp.asarray([0.2, 1, 1] * 4)
        s = control_step(sys, dp, s, a * jnp.asarray(MAX_FORCES), cfg, 10)
        return s, None

    out, _ = jax.jit(lambda s: jax.lax.scan(
        body, s, jnp.arange(n_ctrl, dtype=jnp.float32)))(st)
    return np.asarray(out.q), np.asarray(out.qd)


def _dyn_policy_params(sys, rng):
    """DomainParams draw from the pi_dyn output ranges (toe geoms get the
    written coefficients, laikago_env_combined_policy.py:365-386)."""
    G = sys.n_geoms
    dp = DomainParams.default(sys).replace(max_forces=jnp.asarray(MAX_FORCES))
    lat = np.ones(G) * 0.5
    spin = np.zeros(G)
    resti = np.zeros(G)
    damp = np.zeros(G)
    lat[:4] = rng.uniform(0.0, 5.0, 4)
    spin[:4] = rng.uniform(0.0, 5.0, 4)
    resti[:4] = rng.uniform(0.0, 2.0, 4)   # physically active part of 0-15
    damp[:4] = np.exp(rng.uniform(np.log(20.0), np.log(2000.0), 4))
    return dp.replace(
        lateral_friction=jnp.asarray(lat), spinning_friction=jnp.asarray(spin),
        restitution=jnp.asarray(resti), contact_damping=jnp.asarray(damp),
        contact_stiffness=jnp.ones(G),
        floor_friction=jnp.asarray(0.5), floor_restitution=jnp.asarray(1.0),
        floor_stiffness=jnp.asarray(1.0), floor_damping=jnp.asarray(0.0))


def _one_step_fn(sys, solver, warm):
    """(dp_batch, q, qd, tau, iters) -> qd after ONE 10-substep control step,
    vmapped over a batch of (dp, state, tau) draws.  iters is a dynamic
    fori_loop bound so one compile covers every sweep count."""

    @jax.jit
    def f(dp, q, qd, tau, iters):
        def one(dp_, q_, qd_, tau_):
            cfg = PhysicsConfig(contact=ContactConfig(
                iterations=iters, solver=solver, warm_start=warm))
            s = control_step(sys, dp_, PhysState(q=q_, qd=qd_), tau_, cfg, 10)
            return s.qd

        return jax.vmap(one, in_axes=(0, None, None, 0))(dp, q, qd, tau)

    return f


@slow
def test_production_pgs5_one_step_error_bounded_and_beats_staged():
    sys = make_laikago()
    q0, qd0 = _gait_state(sys)
    rng = np.random.RandomState(11)
    B = 16
    dps = jax.tree.map(lambda *xs: jnp.stack(xs),
                       *[_dyn_policy_params(sys, rng) for _ in range(B)])
    taus = jnp.asarray(
        rng.uniform(-0.3, 0.3, (B, 12)).astype(np.float32)
        * np.asarray(MAX_FORCES))
    q0 = jnp.asarray(q0)
    qd0 = jnp.asarray(qd0)

    ref = _one_step_fn(sys, "pgs", False)(dps, q0, qd0, taus, 100)
    got_pgs = _one_step_fn(sys, "pgs", True)(dps, q0, qd0, taus, 5)
    got_staged = _one_step_fn(sys, "staged", True)(dps, q0, qd0, taus, 5)

    err_pgs = float(jnp.abs(got_pgs - ref).mean())
    err_staged = float(jnp.abs(got_staged - ref).mean())
    # production fidelity: warm pgs@5 close to cold pgs@100 in one step
    assert err_pgs < 0.08, err_pgs
    # staged stalls on this distribution; it must never silently become
    # competitive-looking via a solver change that actually breaks pgs
    assert err_pgs < err_staged / 2.0, (err_pgs, err_staged)
