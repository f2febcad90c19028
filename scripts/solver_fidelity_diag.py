"""Solver-fidelity diagnostic: pgs/staged @ N sweeps (warm) vs cold PGS@100.

Separates *solver error* from *chaos amplification* on laikago under the
identification training distribution (pi_dyn-randomized contact params,
laikago_env_combined_policy.py:365-386):

  A) one-control-step error: from identical states sampled along the
     reference (cold pgs@100) trajectory, run ONE 10-substep control step
     with each variant and compare qd/q.  This is pure solver error.
  B) 25-control-step trajectory max-q error (the chaotic metric the
     staged-parity test uses).

Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/solver_fidelity_diag.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from simgan_tpu.core import maths
from simgan_tpu.core.system import DomainParams, PhysState
from simgan_tpu.models.laikago import (BASE_INIT_EULER, BASE_INIT_POS,
                                       INIT_Q, MAX_FORCES, make_laikago)
from simgan_tpu.physics.contact import ContactConfig
from simgan_tpu.physics.engine import PhysicsConfig, control_step

N_CTRL = 25
N_STARTS = 4


def gait_states(sys, n_keep=N_STARTS, n_ctrl=60):
    quat = np.asarray(maths.quat_from_euler(jnp.asarray(BASE_INIT_EULER)))
    q0 = np.concatenate([BASE_INIT_POS, quat, INIT_Q]).astype(np.float32)
    dp = DomainParams.default(sys).replace(max_forces=jnp.asarray(MAX_FORCES))
    cfg = PhysicsConfig(contact=ContactConfig(iterations=10, warm_start=True))
    st = PhysState(q=jnp.asarray(q0), qd=jnp.zeros(sys.nv))

    def body(s, t):
        phase = 2.0 * jnp.pi * t / 25.0
        a = 0.4 * jnp.sin(phase + jnp.arange(12.0)) * jnp.asarray([0.2, 1, 1] * 4)
        s = control_step(sys, dp, s, a * jnp.asarray(MAX_FORCES), cfg, 10)
        return s, (s.q, s.qd)

    _, (qs, qds) = jax.jit(lambda s: jax.lax.scan(
        body, s, jnp.arange(n_ctrl, dtype=jnp.float32)))(st)
    stride = n_ctrl // n_keep
    idx = list(range(stride - 1, n_ctrl, stride))
    return np.asarray(qs)[idx], np.asarray(qds)[idx]


def dyn_policy_params(sys, rng):
    G = sys.n_geoms
    dp = DomainParams.default(sys).replace(max_forces=jnp.asarray(MAX_FORCES))
    lat = np.ones(G) * 0.5
    spin = np.zeros(G)
    resti = np.zeros(G)
    damp = np.zeros(G)
    stiff = np.ones(G)
    lat[:4] = rng.uniform(0.0, 5.0, 4)
    spin[:4] = rng.uniform(0.0, 5.0, 4)
    resti[:4] = rng.uniform(0.0, 2.0, 4)
    # pi_dyn-reachable damping is exp(U[1,3])*2 = [5.44, 40.2] — the
    # reference's code (laikago_env_combined_policy.py:374-375: np.exp of a
    # [1,3] squash, times 2), NOT the "20 ~ 2000" its comment claims.
    # SIMGAN_DIAG_WIDE_DAMP=1 restores the round-3 first-pass (wrong) range.
    import os
    if os.environ.get("SIMGAN_DIAG_WIDE_DAMP"):
        damp[:4] = np.exp(rng.uniform(np.log(20.0), np.log(2000.0), 4))
    else:
        damp[:4] = np.exp(rng.uniform(1.0, 3.0, 4)) * 2.0
    return dp.replace(
        lateral_friction=jnp.asarray(lat), spinning_friction=jnp.asarray(spin),
        restitution=jnp.asarray(resti), contact_damping=jnp.asarray(damp),
        contact_stiffness=jnp.asarray(stiff),
        floor_friction=jnp.asarray(0.5), floor_restitution=jnp.asarray(1.0),
        floor_stiffness=jnp.asarray(1.0), floor_damping=jnp.asarray(0.0))


def make_traj_fn(sys, solver, warm):
    """(dp, q0, qd0, taus, iters) -> (qs, qds) over N_CTRL control steps.
    iters is dynamic (fori_loop trip count) so one compile covers all N."""

    @jax.jit
    def f(dp, q0, qd0, taus, iters):
        cfg = PhysicsConfig(contact=ContactConfig(
            iterations=iters, solver=solver, warm_start=warm))
        st = PhysState(q=q0, qd=qd0)

        def body(s, tau):
            s = control_step(sys, dp, s, tau, cfg, 10)
            return s, (s.q, s.qd)

        _, out = jax.lax.scan(body, st, taus)
        return out

    return f


def make_onestep_fn(sys, solver, warm):
    @jax.jit
    @functools.partial(jax.vmap, in_axes=(None, 0, 0, 0, None))
    def f(dp, q, qd, tau, iters):
        cfg = PhysicsConfig(contact=ContactConfig(
            iterations=iters, solver=solver, warm_start=warm))
        s = control_step(sys, dp, PhysState(q=q, qd=qd), tau, cfg, 10)
        return s.q, s.qd

    return f


def main():
    sys = make_laikago()
    q0s, qd0s = gait_states(sys)
    print("gait states ready", flush=True)
    rng = np.random.RandomState(11)
    dps = [dyn_policy_params(sys, rng) for _ in range(N_STARTS)]
    taus = [np.random.RandomState(1).uniform(-0.3, 0.3, (N_CTRL, 12)).astype(
        np.float32) * np.asarray(MAX_FORCES) for _ in range(N_STARTS)]

    fns = {
        ("pgs", True): (make_traj_fn(sys, "pgs", True),
                        make_onestep_fn(sys, "pgs", True)),
        ("staged", True): (make_traj_fn(sys, "staged", True),
                           make_onestep_fn(sys, "staged", True)),
        ("pgs", False): (make_traj_fn(sys, "pgs", False),
                         make_onestep_fn(sys, "pgs", False)),
    }

    # reference: cold pgs@100 trajectories + states along them
    ref_traj, ref_states = [], []
    for i in range(N_STARTS):
        qs, qds = fns[("pgs", False)][0](
            dps[i], jnp.asarray(q0s[i]), jnp.asarray(qd0s[i]),
            jnp.asarray(taus[i]), 100)
        ref_traj.append((np.asarray(qs), np.asarray(qds)))
        ref_states.append((np.asarray(qs), np.asarray(qds)))
    print("reference trajectories ready", flush=True)

    variants = [("pgs", True, 5), ("pgs", True, 10), ("pgs", True, 20),
                ("staged", True, 5), ("staged", True, 10),
                ("staged", True, 20), ("staged", True, 40),
                ("staged", True, 80)]

    print(f"{'variant':>16} {'1step qd max':>12} {'1step qd mean':>13} "
          f"{'traj q max':>10}", flush=True)
    for solver, warm, iters in variants:
        traj_fn, one_fn = fns[(solver, warm)]
        one_max = one_mean = 0.0
        traj_max = 0.0
        for i in range(N_STARTS):
            # (B) trajectory error
            qs, _ = traj_fn(dps[i], jnp.asarray(q0s[i]), jnp.asarray(qd0s[i]),
                            jnp.asarray(taus[i]), iters)
            traj_max = max(traj_max, float(np.abs(np.asarray(qs) - ref_traj[i][0]).max()))
            # (A) one-step error from ref states (prepend the start state)
            qs_r = np.concatenate([q0s[i][None], ref_states[i][0][:-1]])
            qds_r = np.concatenate([qd0s[i][None], ref_states[i][1][:-1]])
            q1, qd1 = one_fn(dps[i], jnp.asarray(qs_r), jnp.asarray(qds_r),
                             jnp.asarray(taus[i]), iters)
            q1r, qd1r = one_fn.__wrapped__ if False else fns[("pgs", False)][1](
                dps[i], jnp.asarray(qs_r), jnp.asarray(qds_r),
                jnp.asarray(taus[i]), 100)
            e = np.abs(np.asarray(qd1) - np.asarray(qd1r))
            one_max = max(one_max, float(e.max()))
            one_mean += float(e.mean()) / N_STARTS
        print(f"{solver+'@'+str(iters)+('+w' if warm else ''):>16} "
              f"{one_max:12.2e} {one_mean:13.2e} {traj_max:10.2e}", flush=True)


if __name__ == "__main__":
    main()
