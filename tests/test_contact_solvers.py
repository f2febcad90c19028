"""Contact-solver variants agree: staged (TPU-parallel) vs sequential PGS.

Ground truth is PGS at 100 iterations (Bullet's numSolverIterations,
hopper_env_v3.py:118).  The production settings — PGS@10 and staged@k —
must stay within the convergence envelope measured in round 1 (laikago
rel-qd error 1.3e-3 @ PGS 10 iters)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simgan_tpu.core.system import DomainParams, PhysState
from simgan_tpu.models.hopper import BASE_INIT_POS as HOP_POS, make_hopper
from simgan_tpu.models.laikago import (BASE_INIT_EULER, BASE_INIT_POS,
                                       INIT_Q, make_laikago)
from simgan_tpu.physics.contact import ContactConfig, contact_impulses
from simgan_tpu.physics.dynamics import compute_dynamics
from simgan_tpu.core import maths


def _laika_contact_states(n=8, seed=0):
    sys = make_laikago()
    rng = np.random.RandomState(seed)
    quat = np.asarray(maths.quat_from_euler(jnp.asarray(BASE_INIT_EULER)))
    states = []
    for _ in range(n):
        # base low enough that toes (and sometimes knees) penetrate
        pos = np.array(BASE_INIT_POS) + rng.uniform(-0.06, 0.01, 3) * [1, 1, 4]
        jq = np.array(INIT_Q) + rng.uniform(-0.3, 0.3, 12)
        q = np.concatenate([pos, quat, jq]).astype(np.float32)
        qd = rng.uniform(-1.0, 1.0, sys.nv).astype(np.float32)
        states.append((q, qd))
    return sys, states


def _post_contact(sys, q, qd, cfg):
    dp = DomainParams.default(sys)
    dyn = compute_dynamics(sys, dp, jnp.asarray(q), jnp.asarray(qd),
                           gravity=-10.0, dt=1.0 / 500.0)
    qd_free = jnp.asarray(qd) + (1.0 / 500.0) * jax.numpy.zeros(sys.nv)
    return np.asarray(contact_impulses(sys, dp, dyn, jnp.asarray(qd), 1 / 500.0, cfg))


@pytest.mark.parametrize("solver,iters,tol", [("pgs", 10, 5e-3),
                                              ("staged", 20, 8e-3)])
def test_laikago_solver_convergence(solver, iters, tol):
    sys, states = _laika_contact_states()
    ref_cfg = ContactConfig(iterations=100)
    cfg = ContactConfig(iterations=iters, solver=solver)
    worst = 0.0
    any_contact = False
    for q, qd in states:
        ref = _post_contact(sys, q, qd, ref_cfg)
        got = _post_contact(sys, q, qd, cfg)
        if np.linalg.norm(ref - qd) > 1e-6:
            any_contact = True
        err = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
        worst = max(worst, err)
    assert any_contact, "test states never touched the floor"
    assert worst < tol, f"{solver}@{iters}: rel err {worst:.2e}"


def test_hopper_staged_matches_pgs_with_pairs():
    """Staged solver handles the self-collision pair rows too."""
    sys = make_hopper()
    # folded AND touching the floor
    q = np.array([0, -1.0, 0.3, -2.5, -2.5, -0.5], np.float32)
    qd = np.linspace(-0.5, 0.5, 6).astype(np.float32)
    ref = _post_contact(sys, q, qd, ContactConfig(iterations=100))
    got = _post_contact(sys, q, qd, ContactConfig(iterations=30, solver="staged"))
    assert np.linalg.norm(ref - qd) > 1e-6
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert err < 2e-2, err
