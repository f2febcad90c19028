"""Articulated rigid body dynamics: mass matrix, bias forces, forward dynamics.

TPU-native replacement for Bullet's Featherstone ``btMultiBody`` solver that
the reference drives at 500 Hz through ``stepSimulation``
(my_pybullet_envs/hopper_env_v3.py:247, laikago_env_v4.py:316).

Formulation: with per-link world Jacobians ``Jw_i, Jv_i`` (kinematics.py),

    M(q)      = Σ_i Jvᵢᵀ mᵢ Jvᵢ + Jwᵢᵀ Iᵢʷ Jwᵢ
    bias(q,qd)= Σ_i Jvᵢᵀ mᵢ (J̇vᵢ qd) + Jwᵢᵀ (Iᵢʷ (J̇wᵢ qd) + ωᵢ × Iᵢʷ ωᵢ)
                − Σ_i Jvᵢᵀ mᵢ g

The ``J̇ qd`` terms are obtained with a single ``jax.jvp`` through the
Jacobian builder along the configuration tangent ``q̇ = G(q) qd`` — exact,
branch-free, and it keeps the whole pipeline differentiable.  Everything is
dense math over ≤18 dofs, which XLA vectorizes across thousands of
``vmap``-ed env replicas (the batch dimension is where the TPU throughput
comes from, not the per-robot solve).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from simgan_tpu.core import maths
from simgan_tpu.core.system import System
from simgan_tpu.core.system import DomainParams
from simgan_tpu.physics import smallmm
from simgan_tpu.physics.kinematics import Kin, config_tangent, forward_kinematics


class Dyn(NamedTuple):
    kin: Kin
    mass_matrix: jax.Array   # (NV, NV)
    bias: jax.Array          # (NV,) Coriolis+gyroscopic+gravity generalized force
    m_inv: jax.Array         # (NV, NV) inverse mass matrix (small, dense)


def _link_inertia_world(sys: System, dp: DomainParams, kin: Kin, i: int):
    """World-frame rotational inertia of link i (3,3)."""
    R = maths.quat_to_mat(kin.quat[i])
    I_local = sys.inertia[i] * dp.inertia_scale[i]
    return smallmm.mm(smallmm.mm(R, I_local), jnp.swapaxes(R, -1, -2))


def compute_dynamics(
    sys: System,
    dp: DomainParams,
    q: jax.Array,
    qd: jax.Array,
    gravity: float = -10.0,
    base_pos=None,
    base_quat=None,
    damping_diag: jax.Array | None = None,
    dt: float = 0.0,
    explicit_cholesky: bool = False,
    spd_pallas: bool = False,
) -> Dyn:
    """Assemble M, bias and M⁻¹ for one robot state.

    All matmuls here are tiny (≤18x18) and run at full float32 precision —
    the TPU's default bf16 MXU path quantizes the dynamics enough to matter,
    and these ops are VPU/latency bound anyway (the batch dimension carries
    the throughput).
    """
    nv = sys.nv

    with jax.default_matmul_precision("highest"):
        return _compute_dynamics_f32(
            sys, dp, q, qd, gravity, base_pos, base_quat, damping_diag, dt,
            explicit_cholesky, spd_pallas,
        )


def _compute_dynamics_f32(
    sys, dp, q, qd, gravity, base_pos, base_quat, damping_diag=None, dt=0.0,
    explicit_cholesky=False, spd_pallas=False,
) -> Dyn:
    nv = sys.nv

    def jac_fn(q_):
        return forward_kinematics(sys, q_, base_pos, base_quat)

    qdot = config_tangent(sys, q, qd)
    kin, dkin = jax.jvp(jac_fn, (q,), (qdot,))
    jw, jv = kin.jw, kin.jv
    djw, djv = dkin.jw, dkin.jv

    # --- per-link accumulation (everything stays rank <= 2 + batch) ---
    g_vec = jnp.array([0.0, 0.0, gravity])
    M = jnp.zeros((nv, nv))
    bias = jnp.zeros(nv)
    for i in range(sys.n_links):
        m_i = sys.mass[i] * dp.mass_scale[i]
        jv_i, jw_i = jv[i], jw[i]                  # (3, NV)
        I_w = _link_inertia_world(sys, dp, kin, i)  # (3, 3)

        # mass matrix: jvᵀ m jv + jwᵀ I jw
        M = M + m_i * smallmm.mtm(jv_i, jv_i)
        M = M + smallmm.mtm(jw_i, smallmm.mm(I_w, jw_i))

        # bias: Coriolis (J̇ qd terms) + gyroscopic + gravity
        omega = smallmm.mv(jw_i, qd)
        a_bias = smallmm.mv(djv[i], qd)
        alpha_bias = smallmm.mv(djw[i], qd)
        gyro = jnp.cross(omega, smallmm.mv(I_w, omega))
        f_lin = m_i * (a_bias - g_vec)
        t_ang = smallmm.mv(I_w, alpha_bias) + gyro
        bias = bias + smallmm.vm(f_lin, jv_i) + smallmm.vm(t_ang, jw_i)

    # regularize: rows/cols of massless chain prefixes still get mass from
    # descendants; tiny epsilon keeps the Cholesky safe under float32.
    M = M + 1e-9 * jnp.eye(nv)
    # m_inv is the *effective* inverse inertia including implicit joint
    # damping (M + dt·D); used for both smooth-force integration and the
    # contact impulse response, keeping the two consistent.
    # eye-mask instead of jnp.diag (diag lowers poorly in Mosaic)
    M_eff = M if damping_diag is None else M + dt * (jnp.eye(nv) * damping_diag)
    if spd_pallas:
        from simgan_tpu.ops.spd_pallas import make_spd_inverse

        m_inv = make_spd_inverse(nv)(M_eff)
    elif explicit_cholesky:
        from simgan_tpu.physics.linalg import spd_inverse

        m_inv = spd_inverse(M_eff)
    else:
        chol = jax.scipy.linalg.cho_factor(M_eff)
        m_inv = jax.scipy.linalg.cho_solve(chol, jnp.eye(nv))

    return Dyn(kin=kin, mass_matrix=M, bias=bias, m_inv=m_inv)


def joint_space_torques(
    sys: System, dp: DomainParams, q: jax.Array, qd: jax.Array, motor_torque: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Generalized forces from motors + dry friction, and the damping diagonal.

    Motor model matches the reference: ``tau = action * max_forces`` applied
    with TORQUE_CONTROL after zeroing the default velocity motors
    (my_pybullet_envs/hopper.py:124-132, laikago.py:285-293).  Joint viscous
    damping (changeDynamics jointDamping, hopper.py:192, laikago.py:111) is
    returned as a diagonal ``D`` so the integrator can treat it implicitly —
    ``(M + dt D) qd⁺ = M qd + dt (tau - bias)`` — which is unconditionally
    stable for the large damping values domain randomization can draw.
    """
    # Build per-dof lists at trace time (no scatters -> full XLA fusion).
    nv = sys.nv
    zero = jnp.zeros(())
    tau = [zero] * nv
    damp = [zero] * nv
    for i in range(sys.n_links):
        d = sys.dof_index[i]
        if d < 0:
            continue
        damp[d] = dp.joint_damping[i]
        tau[d] = tau[d] - sys.joint_friction[i] * jnp.tanh(qd[d] / 0.01)
    for a_idx, link in enumerate(sys.actuated):
        d = sys.dof_index[link]
        tau[d] = tau[d] + motor_torque[a_idx]
    return jnp.stack(tau), jnp.stack(damp)
