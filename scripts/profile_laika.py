"""Ablation timing of the laikago control-step pipeline on the real chip.

Times each stage of the hot path (FK+jvp, mass-matrix assembly, SPD inverse,
contact rows + Delassus, PGS sweep, full substep, full combined-env step)
jitted and vmapped over a large batch, to locate where the 5x hopper/laikago
throughput gap lives.  Not a test; a perf tool.

Usage: python scripts/profile_laika.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.core import maths
from simgan_tpu.core.system import DomainParams, PhysState
from simgan_tpu.models.laikago import (BASE_INIT_EULER, BASE_INIT_POS, INIT_Q,
                                       make_laikago)
from simgan_tpu.physics import smallmm
from simgan_tpu.physics.contact import ContactConfig, contact_impulses
from simgan_tpu.physics.dynamics import compute_dynamics, joint_space_torques
from simgan_tpu.physics.engine import PhysicsConfig, control_step, substep
from simgan_tpu.physics.kinematics import config_tangent, forward_kinematics
from simgan_tpu.physics.linalg import spd_inverse

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
SUBSTEPS = 10

sys_ = make_laikago()
rng = np.random.RandomState(0)
quat = np.asarray(maths.quat_from_euler(jnp.asarray(BASE_INIT_EULER)))
pos = np.array(BASE_INIT_POS) + rng.uniform(-0.05, 0.01, (B, 3)) * [1, 1, 4]
jq = np.array(INIT_Q) + rng.uniform(-0.3, 0.3, (B, 12))
q = np.concatenate([pos, np.tile(quat, (B, 1)), jq], axis=1).astype(np.float32)
qd = rng.uniform(-1.0, 1.0, (B, sys_.nv)).astype(np.float32)
tau = rng.uniform(-1.0, 1.0, (B, 12)).astype(np.float32)
q, qd, tau = jnp.asarray(q), jnp.asarray(qd), jnp.asarray(tau)

dp = DomainParams.default(sys_)
dp_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), dp)
cfg = PhysicsConfig()


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s} {dt * 1e3:8.3f} ms  ({B / dt / 1e6:7.2f}M elem/s)",
          flush=True)
    return dt


def scan10(f):
    """Apply a per-example fn 10x in a scan with a REAL dependency chain:
    the q argument is perturbed by the previous iteration's output so XLA
    cannot hoist the body out of the loop."""

    def g(q, *args):
        def body(qc, _):
            out = f(qc, *args)
            return qc + 1e-9 * jnp.sum(out), None

        qf, _ = jax.lax.scan(body, q, None, length=SUBSTEPS)
        return qf

    return g


# --- stage 1: FK + jvp ---
@jax.jit
@jax.vmap
@scan10
def fk_jvp(q, qd, tau, dp):
    qdot = config_tangent(sys_, q, qd)
    kin, dkin = jax.jvp(lambda q_: forward_kinematics(sys_, q_, None, None),
                        (q,), (qdot,))
    return jnp.stack(list(kin.pos)) + jnp.stack(list(dkin.pos))  # force both


# --- stage 2: full dynamics (FK + M + bias + spd_inverse) ---
@jax.jit
@jax.vmap
@scan10
def dynamics_full(q, qd, tau, dp):
    _, damp = joint_space_torques(sys_, dp, q, qd, tau)
    dyn = compute_dynamics(sys_, dp, q, qd, damping_diag=damp, dt=cfg.dt,
                           explicit_cholesky=True)
    return dyn.m_inv + dyn.bias


# --- stage 3: spd_inverse alone on a fixed SPD matrix ---
M0 = jnp.eye(sys_.nv) * 3.0 + 0.1
Mb = jnp.broadcast_to(M0, (B, sys_.nv, sys_.nv)) + 1e-3 * q[:, :1, None]


@jax.jit
@jax.vmap
def inv_chain(M):
    def body(Mc, _):
        inv = spd_inverse(Mc)
        return Mc + 1e-9 * inv, None

    out, _ = jax.lax.scan(body, M, None, length=SUBSTEPS)
    return out


# --- stage 4: contact only (dynamics recomputed per substep) ---
def make_contact_fn(solver, iters):
    @jax.jit
    @jax.vmap
    @scan10
    def contact_only(q, qd, tau, dp):
        dyn = compute_dynamics(sys_, dp, q, qd, dt=cfg.dt, explicit_cholesky=True)
        return contact_impulses(sys_, dp, dyn, qd, cfg.dt,
                                ContactConfig(solver=solver, iterations=iters))

    return contact_only


# --- stage 5: full substep / control step ---
@jax.jit
def ctrl(q, qd, tau, dp):
    st = PhysState(q=q, qd=qd)
    return jax.vmap(lambda s, t, d: control_step(sys_, d, s, t, cfg))(
        st, tau, dp_b).q


print(f"laikago ablation @ B={B}, {SUBSTEPS} substeps per call", flush=True)
t_fk = timeit("FK+jvp x10", fk_jvp, q, qd, tau, dp_b)
t_dyn = timeit("dynamics(FK+M+bias+inv) x10", dynamics_full, q, qd, tau, dp_b)
t_inv = timeit("spd_inverse 18x18 x10", inv_chain, Mb)
t_con = timeit("dyn+contact pgs@10 x10", make_contact_fn("pgs", 10), q, qd, tau, dp_b)
t_con_s = timeit("dyn+contact staged@10 x10", make_contact_fn("staged", 10), q, qd, tau, dp_b)
t_ctrl = timeit("full control_step (10 substeps)", ctrl, q, qd, tau, dp_b)
print(f"\ncontact-only pgs:    {(t_con - t_dyn) * 1e3:7.3f} ms")
print(f"contact-only staged: {(t_con_s - t_dyn) * 1e3:7.3f} ms")
print(f"steps/s full ctrl:   {B / t_ctrl:,.0f}")
