"""Forward kinematics and velocity Jacobians.

The engine works in world coordinates: for every link we build the 3xNV
angular Jacobian ``Jw`` and COM linear Jacobian ``Jv`` mapping the
generalized velocity ``qd`` to world angular velocity / COM velocity.  Mass
matrix, bias forces and contact Jacobians are all assembled from these
(see dynamics.py).  Topology is static per robot, so all loops below unroll
at trace time into straight-line XLA.

Performance note (TPU): Jacobians are propagated as *per-dof column lists*
of (3,) vectors — pure elementwise math with a single stack at the end — so
no scatter/dynamic-update-slice ops break XLA fusion on the 500 Hz hot path
(scatters cost ~10-20us each at batch 4096; the original scatter-based
assembly dominated the substep).

Replaces the Bullet ``btMultiBody`` forward-kinematics driven through
``getLinkState``/``getJointStates`` in the reference
(my_pybullet_envs/hopper.py:134-165, laikago.py:295-327).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from simgan_tpu.core import maths
from simgan_tpu.core.system import FREE, PRISMATIC, REVOLUTE, System


class Kin(NamedTuple):
    """World-frame kinematic quantities.

    All fields are *per-link tuples* (length L) of arrays — not stacked —
    so that downstream math never builds tensors above rank 3 under a vmap
    batch (Mosaic's vector-layout ceiling; also keeps everything
    fusion-friendly for XLA).  Indexing ``kin.com[l]`` works the same as a
    stacked array would.
    """

    pos: tuple          # L x (3,) link frame origin
    quat: tuple         # L x (4,) link frame orientation
    com: tuple          # L x (3,) link COM
    joint_anchor: tuple # L x (3,) joint origin (undefined for base)
    joint_axis: tuple   # L x (3,) joint axis (undefined for base)
    jw: tuple           # L x (3, NV) angular velocity jacobian
    jv: tuple           # L x (3, NV) COM linear velocity jacobian


def _base_pose(sys: System, q: jax.Array, base_pos, base_quat):
    if sys.fixed_base:
        pos = jnp.zeros(3) if base_pos is None else jnp.asarray(base_pos)
        quat = maths.quat_identity() if base_quat is None else jnp.asarray(base_quat)
        return pos, quat
    return q[0:3], maths.quat_normalize(q[3:7])


def forward_kinematics(sys: System, q: jax.Array, base_pos=None, base_quat=None) -> Kin:
    """FK + Jacobians for a single robot configuration (vmap for batches)."""
    nv = sys.nv
    L = sys.n_links
    zero3 = jnp.zeros(3)

    pos = [None] * L
    quat = [None] * L
    com = [None] * L
    anchor = [None] * L
    axis_w = [None] * L
    # per-link jacobians as per-dof column lists: jw_cols[i][d] is (3,)
    jw_cols = [None] * L
    jv_cols = [None] * L

    jq = sys.joint_q(q)

    for i in range(L):
        p = sys.parent[i]
        if p < 0:
            pos[i], quat[i] = _base_pose(sys, q, base_pos, base_quat)
            com[i] = pos[i] + maths.quat_rotate(quat[i], sys.com[i])
            anchor[i] = pos[i]
            axis_w[i] = zero3
            if sys.fixed_base:
                jw_cols[i] = [zero3] * nv
                jv_cols[i] = [zero3] * nv
            else:
                # qd = [v_origin(3), omega_world(3), joints...]
                r = com[i] - pos[i]
                e = [jnp.array([1.0, 0, 0]), jnp.array([0.0, 1, 0]), jnp.array([0.0, 0, 1])]
                jw_cols[i] = [zero3] * 3 + e + [zero3] * (nv - 6)
                # v_com = v_o + w x r  =>  col_k (rot part) = e_k x r
                jv_cols[i] = e + [jnp.cross(e_k, r) for e_k in e] + [zero3] * (nv - 6)
            continue

        d = sys.dof_index[i]
        qi = jq[d - (0 if sys.fixed_base else 6)]
        # joint frame in world
        j_pos = pos[p] + maths.quat_rotate(quat[p], sys.joint_pos[i])
        j_quat = maths.quat_mul(quat[p], sys.joint_quat[i])
        if sys.joint_type[i] == REVOLUTE:
            rot = maths.quat_from_axis_angle(sys.joint_axis[i], qi)
            quat[i] = maths.quat_mul(j_quat, rot)
            pos[i] = j_pos
        elif sys.joint_type[i] == PRISMATIC:
            quat[i] = j_quat
            pos[i] = j_pos + maths.quat_rotate(j_quat, sys.joint_axis[i] * qi)
        else:  # pragma: no cover - fixed joints are merged at model build time
            raise ValueError(f"unsupported joint type {sys.joint_type[i]}")

        com[i] = pos[i] + maths.quat_rotate(quat[i], sys.com[i])
        a_w = maths.quat_rotate(quat[i], sys.joint_axis[i])
        anchor[i] = j_pos
        axis_w[i] = a_w

        # propagate columns: same angular basis, shift linear to the new COM
        r_pc = com[i] - com[p]
        jw_i = list(jw_cols[p])
        jv_i = [jv_cols[p][k] + jnp.cross(jw_cols[p][k], r_pc) for k in range(nv)]
        if sys.joint_type[i] == REVOLUTE:
            jw_i[d] = a_w
            jv_i[d] = jnp.cross(a_w, com[i] - j_pos)
        else:  # prismatic
            jv_i[d] = a_w
        jw_cols[i], jv_cols[i] = jw_i, jv_i

    return Kin(
        pos=tuple(pos),
        quat=tuple(quat),
        com=tuple(com),
        joint_anchor=tuple(anchor),
        joint_axis=tuple(axis_w),
        jw=tuple(jnp.stack(cols, axis=-1) for cols in jw_cols),
        jv=tuple(jnp.stack(cols, axis=-1) for cols in jv_cols),
    )


def config_tangent(sys: System, q: jax.Array, qd: jax.Array) -> jax.Array:
    """Kinematic map: qdot = G(q) qd (for jvp-based Coriolis terms).

    For the floating base the quaternion rate is
    ``q̇ = 0.5 * [0, ω_world] ⊗ q``.
    """
    if sys.fixed_base:
        return qd
    quat = q[3:7]
    omega = qd[3:6]
    dquat = 0.5 * maths.quat_mul(jnp.concatenate([jnp.zeros(1), omega]), quat)
    return jnp.concatenate([qd[0:3], dquat, qd[6:]])


def geom_world(sys: System, kin: Kin) -> tuple[jax.Array, jax.Array]:
    """World positions of contact-sphere centers and their link COM offsets.

    Returns (pos (G,3), r (G,3)) with r = p_geom - com_link for jacobian shift.
    """
    ps = []
    rs = []
    for g in range(sys.n_geoms):
        l = sys.geom_link[g]
        p = kin.pos[l] + maths.quat_rotate(kin.quat[l], sys.geom_offset[g])
        ps.append(p)
        rs.append(p - kin.com[l])
    return jnp.stack(ps), jnp.stack(rs)
