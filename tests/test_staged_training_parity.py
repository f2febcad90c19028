"""Contact-solver fidelity under the TRAINING distribution (VERDICT r2
items 2+3c).

Context (measured by scripts/solver_fidelity_diag.py, round 3, corrected):

* The pi_dyn-reachable contact-damping range is exp(U[1,3])*2 = [5.44,
  40.2] — the reference's *code* (laikago_env_combined_policy.py:374-375:
  np.exp of a [1,3] tanh-squash, times 2), NOT the "20 ~ 2000" its inline
  comment claims.  Round 3's first fidelity pass sampled the comment's
  range by mistake; every conclusion drawn from it is superseded by the
  corrected measurements below.

* Under the TRUE training distribution (lateral/spin 0-5, restitution
  0-2 active part, damping 5.44-40.2), warm-started PGS@5 — the
  production solver — is accurate at BOTH metrics: one-control-step qd
  error mean 1.2e-3, and 25-control-step trajectory max-q error 1.5e-2
  vs cold sequential PGS@100.  The round-3 first-pass "chaos makes
  trajectory parity impossible" caveat was an artifact of the wrong
  damping range (near-zero effective contact damping made bouncy draws
  chaotic).

* The 'staged' solver (all-normal-rows then all-friction-rows matvec
  sweeps, built for the TPU latency-bound regime) matches pgs at equal
  sweep count on the true distribution (staged@5 == pgs@5 to 3 digits;
  staged@40 reaches 2.3e-6 traj error).  Its earlier "stalls at any
  sweep count" verdict was measured on the wrong [20, 2000] damping
  range — where it genuinely does stall (one-step qd err ~0.2 at 80
  sweeps) — a regime pi_dyn cannot reach.

  (The wide-range stall is real but state-dependent — at some gait
  states staged@80 converges even on damping [20, 2000] — so it is
  recorded in RESULTS.md rather than pinned here; staged should be
  re-validated before any use outside the pi_dyn coefficient ranges.)

This test pins two facts so they cannot silently regress: production
pgs@5 stays accurate on the training distribution, and staged@5 stays
equivalent to pgs@5 there.
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
    written coefficients, laikago_env_combined_policy.py:365-386; damping
    is the code's exp([1,3])*2 range, not the comment's "20 ~ 2000")."""
    G = sys.n_geoms
    dp = DomainParams.default(sys).replace(max_forces=jnp.asarray(MAX_FORCES))
    lat = np.ones(G) * 0.5
    spin = np.zeros(G)
    resti = np.zeros(G)
    damp = np.zeros(G)
    lat[:4] = rng.uniform(0.0, 5.0, 4)
    spin[:4] = rng.uniform(0.0, 5.0, 4)
    resti[:4] = rng.uniform(0.0, 2.0, 4)   # physically active part of 0-15
    damp[:4] = np.exp(rng.uniform(1.0, 3.0, 4)) * 2.0
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


def _draws(sys, rng, B):
    dps = jax.tree.map(lambda *xs: jnp.stack(xs),
                       *[_dyn_policy_params(sys, rng) for _ in range(B)])
    taus = jnp.asarray(
        rng.uniform(-0.3, 0.3, (B, 12)).astype(np.float32)
        * np.asarray(MAX_FORCES))
    return dps, taus


@slow
def test_pgs5_and_staged5_accurate_on_training_distribution():
    sys = make_laikago()
    q0, qd0 = _gait_state(sys)
    rng = np.random.RandomState(11)
    dps, taus = _draws(sys, rng, B=16)
    q0 = jnp.asarray(q0)
    qd0 = jnp.asarray(qd0)

    ref = _one_step_fn(sys, "pgs", False)(dps, q0, qd0, taus, 100)
    got_pgs = _one_step_fn(sys, "pgs", True)(dps, q0, qd0, taus, 5)
    got_staged = _one_step_fn(sys, "staged", True)(dps, q0, qd0, taus, 5)

    err_pgs = float(jnp.abs(got_pgs - ref).mean())
    err_staged = float(jnp.abs(got_staged - ref).mean())
    # production fidelity: warm pgs@5 close to cold pgs@100 in one step
    # (diag measured mean 1.2e-3 on the true pi_dyn damping range)
    assert err_pgs < 0.02, err_pgs
    # staged is equivalent at equal sweep count on this distribution
    assert err_staged < 2.0 * err_pgs + 1e-3, (err_pgs, err_staged)


