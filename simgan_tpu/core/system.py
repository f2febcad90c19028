"""Static robot model (`System`) and dynamic state (`PhysState`, `DomainParams`).

Design note (TPU-first): everything the reference mutates at runtime through
``pybullet.changeDynamics`` — link masses/inertias, joint damping, torque
limits, per-link contact coefficients (reference:
my_pybullet_envs/hopper.py:181-196, hopper_env_combined_policy.py:270-287,
laikago_env_combined_policy.py:365-386) — lives in :class:`DomainParams`,
which is *data* flowing through the jitted step function.  ``System`` holds
only the compile-time-constant topology and nominal values, so one XLA
program serves every domain-randomization draw and every per-step contact
coefficient the learned dynamics policy writes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import struct

# Joint type codes (static python ints).
FREE = 0       # 6-dof floating base (quaternion), only valid for link 0
REVOLUTE = 1
PRISMATIC = 2


@struct.dataclass
class System:
    """Compile-time constant description of an articulated rigid body.

    Link 0 is the base.  For ``fixed_base`` systems the base link is welded to
    the world at ``base_pos``/``base_quat`` passed to FK.  All per-link arrays
    have length ``n_links``; index 0 describes the base link itself (its
    joint_* entries are ignored for fixed-base, and describe the free joint
    for floating-base).
    """

    # --- static metadata (not traced) ---
    name: str = struct.field(pytree_node=False)
    parent: tuple = struct.field(pytree_node=False)        # parent link index, -1 for base
    joint_type: tuple = struct.field(pytree_node=False)    # per link
    actuated: tuple = struct.field(pytree_node=False)      # link indices with motors
    fixed_base: bool = struct.field(pytree_node=False)
    dof_index: tuple = struct.field(pytree_node=False)     # per link: index of its dof in qd (or -1)

    # --- traced arrays (constants folded at jit time) ---
    joint_pos: jax.Array      # (L, 3) joint origin in parent link frame
    joint_quat: jax.Array     # (L, 4) joint frame rotation in parent link frame
    joint_axis: jax.Array     # (L, 3) axis in child link frame
    mass: jax.Array           # (L,)
    com: jax.Array            # (L, 3) center of mass in link frame
    inertia: jax.Array        # (L, 3, 3) about COM, link frame
    joint_damping: jax.Array  # (L,) viscous joint damping (nominal)
    joint_friction: jax.Array # (L,) dry friction coefficient (nominal)
    joint_lower: jax.Array    # (L,)
    joint_upper: jax.Array    # (L,)

    # contact sites: spheres rigidly attached to links
    geom_link: tuple = struct.field(pytree_node=False)  # (G,) link index per geom
    geom_offset: jax.Array = None   # (G, 3) sphere center in link frame
    geom_radius: jax.Array = None   # (G,)

    # self-collision capsule pairs (reference loads the hopper with
    # URDF_USE_SELF_COLLISION, hopper.py:86; btMultiBody always filters
    # parent-child pairs, so only non-adjacent pairs are listed)
    pair_link: tuple = struct.field(pytree_node=False, default=())  # (P, 2) link pairs
    pair_seg: jax.Array = None      # (P, 2, 2, 3) capsule segment endpoints
                                    # [pair, body 0/1, endpoint a/b, xyz], link frame
    pair_radius: jax.Array = None   # (P,) sum of the two capsule radii
    pair_friction: jax.Array = None # (P,) combined lateral friction (Bullet
                                    # default 0.5 per side -> 0.25)

    @property
    def n_links(self) -> int:
        return len(self.parent)

    @property
    def n_geoms(self) -> int:
        return len(self.geom_link)

    @property
    def n_pairs(self) -> int:
        return len(self.pair_link)

    @property
    def nv(self) -> int:
        """Velocity dimension."""
        base = 0 if self.fixed_base else 6
        return base + sum(1 for t, p in zip(self.joint_type, self.parent) if p >= 0 and t in (REVOLUTE, PRISMATIC))

    @property
    def nq(self) -> int:
        """Configuration dimension (quaternion base uses 7)."""
        base = 0 if self.fixed_base else 7
        return base + (self.nv - (0 if self.fixed_base else 6))

    @property
    def n_joint_dofs(self) -> int:
        return self.nv - (0 if self.fixed_base else 6)

    def joint_q(self, q: jax.Array) -> jax.Array:
        """Slice out the internal-joint part of q."""
        return q if self.fixed_base else q[..., 7:]

    def joint_qd(self, qd: jax.Array) -> jax.Array:
        return qd if self.fixed_base else qd[..., 6:]


@struct.dataclass
class DomainParams:
    """Per-env runtime-mutable physical parameters.

    Mirrors everything the reference rewrites through ``changeDynamics`` /
    ``randomize_robot`` (reference: my_pybullet_envs/hopper_env_v3.py:200-216,
    hopper.py:181-196, laikago.py:420-434) plus the per-geom contact
    coefficients the SimGAN dynamics policy writes every control step
    (hopper_env_combined_policy.py:270-287).
    """

    mass_scale: jax.Array        # (L,)
    inertia_scale: jax.Array     # (L,)
    joint_damping: jax.Array     # (L,) absolute values (not scales), like changeDynamics
    max_forces: jax.Array        # (A,) per actuated joint torque limits
    # per-geom contact params (robot side)
    lateral_friction: jax.Array  # (G,)
    spinning_friction: jax.Array # (G,)
    restitution: jax.Array       # (G,)
    contact_stiffness: jax.Array # (G,)
    contact_damping: jax.Array   # (G,)
    # floor contact params
    floor_friction: jax.Array        # ()
    floor_spinning_friction: jax.Array
    floor_restitution: jax.Array
    floor_stiffness: jax.Array
    floor_damping: jax.Array
    floor_z: jax.Array               # () plane height
    # finite deformable-mattress extent (deform_floor_env): the reference
    # mattress is a 20 m cube at basePosition [7, 0, .] (cube_fat.obj spans
    # +-0.5 in x/y, scale 20 => x in [-3, 17], y in [-10, 10];
    # hopper_env_v3.py:134-149, laikago_env_v4.py:172-183).  Outside the
    # extent, contact is against the backup hard plane at ``hard_floor_z``
    # (z=-10.10 hopper / -10.02 laikago).  Defaults (+-1e9) make the soft
    # floor infinite, i.e. the feature is off.
    mattress_x: jax.Array = None     # (2,) [x_lo, x_hi]
    mattress_y: jax.Array = None     # (2,) [y_lo, y_hi]
    hard_floor_z: jax.Array = None   # () backup plane height
    hard_floor_friction: jax.Array = None  # () backup plane lateralFriction

    @classmethod
    def default(cls, sys: System) -> "DomainParams":
        L, G = sys.n_links, sys.n_geoms
        A = len(sys.actuated)
        return cls(
            mass_scale=jnp.ones(L),
            inertia_scale=jnp.ones(L),
            joint_damping=jnp.asarray(sys.joint_damping),
            max_forces=jnp.zeros(A),  # envs fill this in
            lateral_friction=jnp.ones(G),
            spinning_friction=jnp.zeros(G),
            restitution=jnp.zeros(G),
            contact_stiffness=jnp.ones(G),
            contact_damping=jnp.zeros(G),
            floor_friction=jnp.asarray(0.8),
            floor_spinning_friction=jnp.asarray(0.0),
            floor_restitution=jnp.asarray(0.5),
            floor_stiffness=jnp.asarray(1.0),
            floor_damping=jnp.asarray(2000.0),
            floor_z=jnp.asarray(0.0),
            mattress_x=jnp.asarray([-1e9, 1e9]),
            mattress_y=jnp.asarray([-1e9, 1e9]),
            hard_floor_z=jnp.asarray(-10.0),
            hard_floor_friction=jnp.asarray(0.5),
        )


@struct.dataclass
class PhysState:
    """Generalized-coordinate state of one robot instance."""

    q: jax.Array    # (nq,) [pos3, quat4(wxyz), joints...] for floating base, else joints
    qd: jax.Array   # (nv,) [v_world3, omega_world3, joint rates...] / joints
    # deform_nodes mattress field (physics/deformable.py): top-vertex
    # deflections/velocities (4,), or None when the field is disabled
    # (None pytree leaves flatten to nothing, so existing states/checkpoints
    # are unaffected)
    field_u: jax.Array | None = None
    field_v: jax.Array | None = None

    @classmethod
    def zero(cls, sys: System) -> "PhysState":
        if sys.fixed_base:
            q = jnp.zeros(sys.nq)
        else:
            q = jnp.zeros(sys.nq).at[3].set(1.0)  # identity quat
        return cls(q=q, qd=jnp.zeros(sys.nv))


def make_system(
    *,
    name: str,
    parent: Sequence[int],
    joint_type: Sequence[int],
    joint_pos: Any,
    joint_rpy: Any,
    joint_axis: Any,
    mass: Any,
    com: Any,
    inertia_diag: Any = None,
    inertia: Any = None,
    joint_damping: Any,
    joint_friction: Any = None,
    joint_lower: Any,
    joint_upper: Any,
    actuated: Sequence[int],
    fixed_base: bool,
    geom_link: Sequence[int] = (),
    geom_offset: Any = None,
    geom_radius: Any = None,
    pair_link: Sequence[Sequence[int]] = (),
    pair_seg: Any = None,
    pair_radius: Any = None,
    pair_friction: Any = None,
) -> System:
    """Convenience constructor from plain python lists (model registry entry).

    ``joint_rpy`` follows URDF fixed-axis XYZ euler convention.
    """
    from . import maths

    L = len(parent)
    joint_pos = jnp.asarray(joint_pos, dtype=jnp.float32).reshape(L, 3)
    rpy = jnp.asarray(joint_rpy, dtype=jnp.float32).reshape(L, 3)
    joint_quat = jax.vmap(maths.quat_from_euler)(rpy)
    if inertia is None:
        inertia_diag = jnp.asarray(inertia_diag, dtype=jnp.float32).reshape(L, 3)
        inertia = jax.vmap(jnp.diag)(inertia_diag)
    else:
        inertia = jnp.asarray(inertia, dtype=jnp.float32).reshape(L, 3, 3)
    if joint_friction is None:
        joint_friction = [0.0] * L

    # assign dof indices in link order
    dof_index = []
    next_dof = 0 if fixed_base else 6
    for i in range(L):
        if parent[i] >= 0 and joint_type[i] in (REVOLUTE, PRISMATIC):
            dof_index.append(next_dof)
            next_dof += 1
        else:
            dof_index.append(-1)

    n_geoms = len(geom_link)
    return System(
        name=name,
        parent=tuple(parent),
        joint_type=tuple(joint_type),
        actuated=tuple(actuated),
        fixed_base=fixed_base,
        dof_index=tuple(dof_index),
        joint_pos=joint_pos,
        joint_quat=joint_quat,
        joint_axis=jnp.asarray(joint_axis, dtype=jnp.float32).reshape(L, 3),
        mass=jnp.asarray(mass, dtype=jnp.float32),
        com=jnp.asarray(com, dtype=jnp.float32).reshape(L, 3),
        inertia=inertia,
        joint_damping=jnp.asarray(joint_damping, dtype=jnp.float32),
        joint_friction=jnp.asarray(joint_friction, dtype=jnp.float32),
        joint_lower=jnp.asarray(joint_lower, dtype=jnp.float32),
        joint_upper=jnp.asarray(joint_upper, dtype=jnp.float32),
        geom_link=tuple(geom_link),
        geom_offset=(jnp.zeros((0, 3)) if n_geoms == 0 else jnp.asarray(geom_offset, dtype=jnp.float32).reshape(n_geoms, 3)),
        geom_radius=(jnp.zeros((0,)) if n_geoms == 0 else jnp.asarray(geom_radius, dtype=jnp.float32)),
        pair_link=tuple(tuple(p) for p in pair_link),
        pair_seg=(None if not pair_link else
                  jnp.asarray(pair_seg, dtype=jnp.float32).reshape(len(pair_link), 2, 2, 3)),
        pair_radius=(None if not pair_link else
                     jnp.asarray(pair_radius, dtype=jnp.float32)),
        pair_friction=(jnp.full((len(pair_link),), 0.25) if pair_link and pair_friction is None
                       else (None if not pair_link else jnp.asarray(pair_friction, dtype=jnp.float32))),
    )
