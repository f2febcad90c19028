"""Matrix-free Pallas PGS parity vs the rolled XLA solver.

The kernel (ops/pgs_matfree_pallas.py) runs the identical projected
Gauss-Seidel recursion — same row order, projection, masking — but
contracts the row dot over NV via the maintained w = M⁻¹Jᵀλ instead of
over R via a materialized Delassus row, so results match the rolled path
to float-association round-off (NOT bit-identical; tolerances here are
the accepted band).  Batched rule fires under ``jax.vmap`` (interpret
mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.core.system import DomainParams
from simgan_tpu.models.hopper import make_hopper
from simgan_tpu.physics.contact import ContactConfig, contact_impulses, n_rows
from simgan_tpu.physics.dynamics import compute_dynamics
from tests.test_contact_solvers import _laika_contact_states


def _batched_solve(sys, qs, qds, cfg, lam0):
    def one(q, qd, l0):
        dp = DomainParams.default(sys)
        dyn = compute_dynamics(sys, dp, q, qd, gravity=-10.0, dt=1 / 500.0)
        return contact_impulses(sys, dp, dyn, qd, 1 / 500.0, cfg, lam0=l0)

    return jax.jit(jax.vmap(one))(jnp.asarray(qs), jnp.asarray(qds), lam0)


def test_laikago_batched_parity():
    sys, states = _laika_contact_states(n=6, seed=1)
    qs = np.stack([q for q, _ in states])
    qds = np.stack([qd for _, qd in states])
    lam0 = jnp.zeros((len(states), n_rows(sys)))
    qd_ref, lam_ref = _batched_solve(sys, qs, qds, ContactConfig(iterations=5), lam0)
    qd_mf, lam_mf = _batched_solve(
        sys, qs, qds, ContactConfig(iterations=5, solver="pgs_matfree"), lam0)
    assert np.linalg.norm(np.asarray(qd_ref) - qds) > 1e-6, "no contact hit"
    np.testing.assert_allclose(np.asarray(qd_mf), np.asarray(qd_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lam_mf), np.asarray(lam_ref),
                               rtol=1e-4, atol=1e-3)


def test_laikago_warm_start_parity():
    """Second solve seeded with the first's impulses (the substep-scan
    threading) stays in the association band too."""
    sys, states = _laika_contact_states(n=4, seed=2)
    qs = np.stack([q for q, _ in states])
    qds = np.stack([qd for _, qd in states])
    lam0 = jnp.zeros((len(states), n_rows(sys)))
    _, lam_ref = _batched_solve(sys, qs, qds, ContactConfig(iterations=5), lam0)
    qd_ref, lam_ref2 = _batched_solve(sys, qs, qds, ContactConfig(iterations=5),
                                      lam_ref)
    qd_mf, lam_mf2 = _batched_solve(
        sys, qs, qds, ContactConfig(iterations=5, solver="pgs_matfree"), lam_ref)
    np.testing.assert_allclose(np.asarray(qd_mf), np.asarray(qd_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lam_mf2), np.asarray(lam_ref2),
                               rtol=1e-4, atol=1e-3)


def test_hopper_batched_parity():
    """Hopper (fixed base, NV=6, self-collision pair rows included): a
    penetrating pose so several rows are active."""
    sys = make_hopper()
    rng = np.random.RandomState(3)
    n = 5
    qs = np.stack([
        np.array([0, -1.0, 0.3, -2.5, -2.5, -0.5], np.float32)
        + rng.uniform(-0.1, 0.1, 6).astype(np.float32) for _ in range(n)])
    qds = rng.uniform(-0.5, 0.5, (n, sys.nv)).astype(np.float32)
    lam0 = jnp.zeros((n, n_rows(sys)))
    qd_ref, lam_ref = _batched_solve(sys, qs, qds, ContactConfig(iterations=5), lam0)
    qd_mf, lam_mf = _batched_solve(
        sys, qs, qds, ContactConfig(iterations=5, solver="pgs_matfree"), lam0)
    assert np.abs(np.asarray(lam_ref)).max() > 1e-6, "no contact hit"
    np.testing.assert_allclose(np.asarray(qd_mf), np.asarray(qd_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lam_mf), np.asarray(lam_ref),
                               rtol=1e-4, atol=1e-3)


def test_unbatched_falls_back_to_rolled():
    sys, states = _laika_contact_states(n=1, seed=4)
    q, qd = states[0]
    lam0 = jnp.zeros(n_rows(sys))
    dp = DomainParams.default(sys)
    dyn = compute_dynamics(sys, dp, jnp.asarray(q), jnp.asarray(qd),
                           gravity=-10.0, dt=1 / 500.0)
    qd_ref, lam_ref = contact_impulses(sys, dp, dyn, jnp.asarray(qd),
                                       1 / 500.0, ContactConfig(iterations=5),
                                       lam0=lam0)
    qd_mf, lam_mf = contact_impulses(
        sys, dp, dyn, jnp.asarray(qd), 1 / 500.0,
        ContactConfig(iterations=5, solver="pgs_matfree"), lam0=lam0)
    np.testing.assert_allclose(np.asarray(qd_mf), np.asarray(qd_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lam_mf), np.asarray(lam_ref),
                               rtol=1e-4, atol=1e-3)
