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


def _rollout(sys, q0, qd0, contact_cfg, n_ctrl=25, base_pos=None, tau=None):
    from simgan_tpu.physics.engine import PhysicsConfig, control_step

    cfg = PhysicsConfig(contact=contact_cfg,
                        **({"base_pos": base_pos} if base_pos else {}))
    dp = DomainParams.default(sys)
    st = PhysState(q=jnp.asarray(q0), qd=jnp.asarray(qd0))
    tau = jnp.zeros(len(sys.actuated)) if tau is None else jnp.asarray(tau)
    step = jax.jit(lambda s: control_step(sys, dp, s, tau, cfg))
    traj = []
    for _ in range(n_ctrl):
        st = step(st)
        traj.append(np.concatenate([np.asarray(st.q), np.asarray(st.qd)]))
    return np.stack(traj)


def test_warm_start_trajectory_laikago():
    """Warm-started PGS@5 tracks cold PGS@100 over a 0.5 s contact-rich
    rollout (settling from above the floor onto all four feet)."""
    sys, states = _laika_contact_states(n=1, seed=3)
    q0, qd0 = states[0]
    ref = _rollout(sys, q0, qd0, ContactConfig(iterations=100, warm_start=False))
    warm = _rollout(sys, q0, qd0, ContactConfig(iterations=5, warm_start=True))
    # compare generalized positions (q includes base pose + 12 joints)
    nq = sys.nq if hasattr(sys, "nq") else len(q0)
    err = np.abs(warm[:, :nq] - ref[:, :nq]).max()
    assert err < 5e-3, f"warm@5 vs cold@100 max q err {err:.2e}"


def test_warm_start_trajectory_hopper():
    from simgan_tpu.models.hopper import BASE_INIT_POS, make_hopper

    sys = make_hopper()
    q0 = np.array([0.0, 0.02, 0.1, -0.3, -0.2, 0.1], np.float32)
    qd0 = np.array([0.5, -0.3, 0.1, 0.2, -0.1, 0.3], np.float32)
    ref = _rollout(sys, q0, qd0, ContactConfig(iterations=100, warm_start=False),
                   base_pos=tuple(BASE_INIT_POS))
    warm = _rollout(sys, q0, qd0, ContactConfig(iterations=5, warm_start=True),
                    base_pos=tuple(BASE_INIT_POS))
    err = np.abs(warm - ref).max()
    assert err < 5e-3, f"warm@5 vs cold@100 max err {err:.2e}"


def test_row_unroll_bit_parity():
    """The row-statically-unrolled pgs sweep (ContactConfig.row_unroll, the
    default) matches the fully-rolled iterations*R fori_loop — same row
    order, same float ops.  On the real TPU the two are BIT-IDENTICAL over
    25-control-step vmapped rollouts of both robots (probed 2026-08-18 on
    v5e); on the CPU backend LLVM makes different mul+add FMA-contraction
    choices between the two programs, so this test allows ulp-level
    (~1e-6) differences while still requiring exactness wherever the
    backend happens to agree."""
    for robot in ("laikago", "hopper"):
        if robot == "laikago":
            sys, states = _laika_contact_states(n=6, seed=5)
        else:
            sys = make_hopper()
            rng = np.random.RandomState(7)
            states = [(np.array([0, -1.0 + 0.1 * i, 0.3, -2.0, -2.0, -0.4],
                                np.float32) + rng.uniform(-0.05, 0.05, 6),
                       rng.uniform(-1.0, 1.0, 6).astype(np.float32))
                      for i in range(6)]
        dp = DomainParams.default(sys)
        from simgan_tpu.physics.contact import n_rows

        rng = np.random.RandomState(11)
        lam0s = [np.zeros(n_rows(sys), np.float32),
                 rng.uniform(0.0, 0.3, n_rows(sys)).astype(np.float32)]

        def solve(q, qd, lam0, unroll):
            cfg = ContactConfig(iterations=5, solver="pgs", row_unroll=unroll)
            dyn = compute_dynamics(sys, dp, jnp.asarray(q), jnp.asarray(qd),
                                   gravity=-10.0, dt=1.0 / 500.0)
            qd_new, lam = contact_impulses(sys, dp, dyn, jnp.asarray(qd),
                                           1.0 / 500.0, cfg,
                                           lam0=jnp.asarray(lam0))
            return np.asarray(qd_new), np.asarray(lam)

        any_contact = False
        for q, qd in states:
            for lam0 in lam0s:
                qd_u, lam_u = solve(q, qd, lam0, True)
                qd_r, lam_r = solve(q, qd, lam0, False)
                if np.abs(lam_r).max() > 0:
                    any_contact = True
                np.testing.assert_allclose(qd_u, qd_r, rtol=1e-5, atol=2e-6)
                np.testing.assert_allclose(lam_u, lam_r, rtol=1e-5, atol=2e-6)
        assert any_contact, f"{robot} states never touched the floor"

        # vmapped (the production shape): still bitwise
        qs = jnp.asarray(np.stack([q for q, _ in states]))
        qds = jnp.asarray(np.stack([qd for _, qd in states]))

        def batched(unroll):
            cfg = ContactConfig(iterations=5, solver="pgs", row_unroll=unroll)

            def one(q, qd):
                dyn = compute_dynamics(sys, dp, q, qd, gravity=-10.0,
                                       dt=1.0 / 500.0)
                return contact_impulses(sys, dp, dyn, qd, 1.0 / 500.0, cfg,
                                        lam0=jnp.asarray(lam0s[1]))

            return jax.jit(jax.vmap(one))(qs, qds)

        qd_u, lam_u = batched(True)
        qd_r, lam_r = batched(False)
        np.testing.assert_allclose(np.asarray(qd_u), np.asarray(qd_r),
                                   rtol=1e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(lam_u), np.asarray(lam_r),
                                   rtol=1e-5, atol=2e-6)
