"""Physics engine front-end: one 500 Hz substep and the 10-substep control step.

The whole reference hot loop — ``changeDynamics`` contact writes + torque
application + ``stepSimulation`` × control_skip (reference:
my_pybullet_envs/hopper_env_v3.py:243-251,
hopper_env_combined_policy.py:227-235) — compiles into a single
``lax.scan`` inside one XLA program, ``vmap``-able over env replicas.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from simgan_tpu.core import maths
from simgan_tpu.core.system import DomainParams, PhysState, System
from simgan_tpu.physics import smallmm
from simgan_tpu.physics.contact import ContactConfig, contact_impulses, n_rows
from simgan_tpu.physics.deformable import DeformableConfig, geom_weights, node_substep, surface_offset
from simgan_tpu.physics.dynamics import compute_dynamics, joint_space_torques


class PhysicsConfig(NamedTuple):
    dt: float = 1.0 / 500.0            # reference physics rate (hopper_env_v3.py:60)
    gravity: float = -10.0             # p.setGravity(0,0,-10) (hopper_env_v3.py:115)
    contact: ContactConfig = ContactConfig()
    base_pos: tuple = (0.0, 0.0, 0.0)  # world pose of the base for fixed_base systems
    joint_limit_margin: float = 0.0
    # Unrolled jnp Cholesky (physics/linalg.py) instead of lax.linalg's
    # blocked lowering.  Default True: measured 5.3x (hopper) / 4.2x
    # (laikago) total physics throughput on v5e — XLA's TPU cholesky path
    # dominates the substep at these tiny (6..18) sizes.  Also required
    # inside Pallas kernels (no custom calls in Mosaic).
    explicit_cholesky: bool = True
    # Run the M_eff⁻¹ chain (factor + 2 triangular solves, ~500 chained
    # vector ops) as ONE Mosaic kernel per batch tile (ops/spd_pallas.py)
    # instead of XLA fusions — the partial-fusion answer to the blocked
    # whole-substep kernel.  Same math/op order as linalg.spd_inverse.
    spd_pallas: bool = False
    # deform_nodes mattress: the reference's 8-vertex mass-spring cube as a
    # 4-vertex vertical field coupled to the contact solve
    # (physics/deformable.py).  None = half-space surrogate semantics.
    deform: "DeformableConfig | None" = None


def substep(
    sys: System,
    dp: DomainParams,
    state: PhysState,
    motor_torque: jax.Array,
    cfg: PhysicsConfig,
    ext_forces: jax.Array | None = None,
    lam0: jax.Array | None = None,
) -> PhysState | tuple[PhysState, jax.Array]:
    """One dt=1/500 step: smooth forces, contact impulses, semi-implicit Euler.

    ``ext_forces``: optional (G, 3) world-frame forces applied at the contact
    geom centers — used by the laikago random-push training mode
    (laikago_env_v4.py:303-315, utils.apply_external_world_force_on_local_point).

    ``lam0``: optional (R,) contact-impulse warm start; when given the return
    is ``(state, lam)`` so ``control_step`` can thread impulses across the
    substep scan (Bullet's solver warm-starts the same way).
    """
    base_pos = jnp.asarray(cfg.base_pos) if sys.fixed_base else None

    tau, damp_diag = joint_space_torques(sys, dp, state.q, state.qd, motor_torque)
    dyn = compute_dynamics(
        sys, dp, state.q, state.qd, gravity=cfg.gravity, base_pos=base_pos,
        damping_diag=damp_diag, dt=cfg.dt,
        explicit_cholesky=cfg.explicit_cholesky, spd_pallas=cfg.spd_pallas,
    )
    if ext_forces is not None:
        from simgan_tpu.physics.kinematics import geom_world

        p_geom, _ = geom_world(sys, dyn.kin)
        for g in range(sys.n_geoms):
            l = sys.geom_link[g]
            r = p_geom[g] - dyn.kin.com[l]
            j_pt = dyn.kin.jv[l] - smallmm.mm(maths.skew(r), dyn.kin.jw[l])
            tau = tau + smallmm.vm(ext_forces[g], j_pt)
    # implicit joint damping: (M + dt D) qd⁺ = M qd + dt (tau - bias)
    #   <=> qd⁺ = qd + M_eff⁻¹ (dt (tau - bias) - dt D qd)
    qd_free = state.qd + smallmm.mv(
        dyn.m_inv, cfg.dt * (tau - dyn.bias) - cfg.dt * damp_diag * state.qd
    )
    # --- deform_nodes mattress field: contacts see the deflected, moving
    # surface; their normal impulses push the vertices down (deformable.py) ---
    use_field = cfg.deform is not None and state.field_u is not None
    if use_field:
        from simgan_tpu.physics.kinematics import geom_world

        p_geom, _ = geom_world(sys, dyn.kin)
        w = geom_weights(p_geom, cfg.deform)                 # (G, 4)
        on_mat = ((p_geom[:, 0] >= dp.mattress_x[0])
                  & (p_geom[:, 0] <= dp.mattress_x[1])
                  & (p_geom[:, 1] >= dp.mattress_y[0])
                  & (p_geom[:, 1] <= dp.mattress_y[1]))
        w = w * on_mat[:, None]
        floor_du = surface_offset(w, state.field_u)
        floor_dv = surface_offset(w, state.field_v)
        qd_new, lam = contact_impulses(
            sys, dp, dyn, qd_free, cfg.dt, cfg.contact,
            lam0=jnp.zeros(n_rows(sys)) if lam0 is None else lam0,
            floor_du=floor_du, floor_dv=floor_dv)
        lam_n = jnp.stack([lam[4 * g] for g in range(sys.n_geoms)])
        node_imp = -jnp.sum(w * lam_n[:, None], axis=0)      # (4,) downward
        field_u, field_v = node_substep(
            state.field_u, state.field_v, node_imp, cfg.deform, cfg.dt)
        if lam0 is None:
            lam = None
    elif lam0 is None:
        qd_new = contact_impulses(sys, dp, dyn, qd_free, cfg.dt, cfg.contact)
        lam = None
        field_u, field_v = state.field_u, state.field_v
    else:
        qd_new, lam = contact_impulses(
            sys, dp, dyn, qd_free, cfg.dt, cfg.contact, lam0=lam0)
        field_u, field_v = state.field_u, state.field_v

    # --- integrate configuration ---
    if sys.fixed_base:
        q_new = state.q + cfg.dt * qd_new
        jq, jqd = q_new, qd_new
        joff = 0
    else:
        pos = state.q[0:3] + cfg.dt * qd_new[0:3]
        quat = maths.quat_integrate(state.q[3:7], qd_new[3:6], cfg.dt)
        jq = state.q[7:] + cfg.dt * qd_new[6:]
        jqd = qd_new[6:]
        joff = 6

    # --- joint limits: projection (Bullet uses unilateral constraint rows;
    # at 500 Hz a position projection with inward velocity zeroing is an
    # accurate, cheap stand-in) ---
    lo, hi = [], []
    for i in range(sys.n_links):
        if sys.dof_index[i] >= 0:
            lo.append(sys.joint_lower[i])
            hi.append(sys.joint_upper[i])
    lo = jnp.stack(lo)
    hi = jnp.stack(hi)
    clipped = jnp.clip(jq, lo, hi)
    at_lo = jq <= lo
    at_hi = jq >= hi
    jqd = jnp.where(at_lo & (jqd < 0), 0.0, jnp.where(at_hi & (jqd > 0), 0.0, jqd))

    if sys.fixed_base:
        out = PhysState(q=clipped, qd=jqd, field_u=field_u, field_v=field_v)
    else:
        q_out = jnp.concatenate([pos, quat, clipped])
        qd_out = jnp.concatenate([qd_new[0:6], jqd])
        out = PhysState(q=q_out, qd=qd_out, field_u=field_u, field_v=field_v)
    return out if lam is None else (out, lam)


def control_step(
    sys: System,
    dp: DomainParams,
    state: PhysState,
    motor_torque: jax.Array,
    cfg: PhysicsConfig,
    control_skip: int = 10,
    ext_forces: jax.Array | None = None,
) -> PhysState:
    """control_skip x substep with constant torque (the 50 Hz control tick).

    ``ext_forces``: optional (control_skip, G, 3) per-substep external forces.

    With ``cfg.contact.warm_start`` (default) the contact impulses are
    threaded through the substep scan: each substep's PGS starts from the
    previous substep's solution, like Bullet's warm-started sequential
    impulse solver.  Contacts persist across the 2 ms substeps, so far fewer
    sweeps are needed per substep for the same converged trajectory.
    """
    if cfg.contact.warm_start and n_rows(sys) > 0:

        def body_w(carry, f):
            s, lam = carry
            return substep(sys, dp, s, motor_torque, cfg, ext_forces=f,
                           lam0=lam), None

        (out, _), _ = jax.lax.scan(
            body_w, (state, jnp.zeros(n_rows(sys))), ext_forces,
            length=control_skip)
        return out

    def body(s, f):
        return substep(sys, dp, s, motor_torque, cfg, ext_forces=f), None

    out, _ = jax.lax.scan(body, state, ext_forces, length=control_skip)
    return out
