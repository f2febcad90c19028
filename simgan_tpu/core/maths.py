"""Rotation / quaternion / rigid-transform math used throughout the engine.

Conventions
-----------
* Quaternions are stored ``(w, x, y, z)`` (scalar first) and kept normalized.
* Euler angles follow the PyBullet/URDF convention: fixed-axis XYZ
  (roll about world x, then pitch about world y, then yaw about world z),
  i.e. ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)``.  This matches
  ``pybullet.getQuaternionFromEuler`` / ``getEulerFromQuaternion`` which the
  reference envs rely on for initial poses and terminations
  (reference: my_pybullet_envs/laikago.py:60, laikago_env_v4.py:353-355).
* All functions are shape-polymorphic over leading batch dims only where
  documented; most operate on single vectors and are used under ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_identity() -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b (rotation b followed by a)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (apply the rotation R(q) @ v)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2 w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conj(q), v)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Quaternion for a rotation of `angle` about (unit) `axis`."""
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[None] if jnp.ndim(half) == 0 else jnp.cos(half)[..., None],
         axis * (jnp.sin(half)[None] if jnp.ndim(half) == 0 else jnp.sin(half)[..., None])],
        axis=-1,
    )


def quat_to_mat(q: jax.Array) -> jax.Array:
    """3x3 rotation matrix from quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(m: jax.Array) -> jax.Array:
    """Quaternion from 3x3 rotation matrix (branch-free, jit-safe)."""
    # Shepperd's method via the 4 candidate traces; pick the most stable.
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = 0.5 * safe_sqrt(1.0 + tr)
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        axis=-1,
    )
    qx1 = 0.5 * safe_sqrt(1.0 + m00 - m11 - m22)
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        axis=-1,
    )
    qy2 = 0.5 * safe_sqrt(1.0 - m00 + m11 - m22)
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        axis=-1,
    )
    qz3 = 0.5 * safe_sqrt(1.0 - m00 - m11 + m22)
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        axis=-1,
    )
    # choose branch
    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return quat_normalize(q)


def quat_from_euler(rpy: jax.Array) -> jax.Array:
    """PyBullet-convention euler (roll, pitch, yaw) -> quaternion.

    R = Rz(yaw) Ry(pitch) Rx(roll).
    """
    roll, pitch, yaw = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        axis=-1,
    )


def quat_to_euler(q: jax.Array) -> jax.Array:
    """Quaternion -> PyBullet-convention euler (roll, pitch, yaw)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    sinp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_integrate(q: jax.Array, omega_world: jax.Array, dt: float) -> jax.Array:
    """Integrate orientation by world-frame angular velocity for dt.

    Uses the exponential map (exact for constant omega over the step), which
    is stabler than the first-order q += 0.5*w*q*dt update at 500 Hz.
    """
    angle = jnp.linalg.norm(omega_world, axis=-1)
    # safe axis
    axis = omega_world / jnp.maximum(angle, 1e-9)[..., None]
    half = 0.5 * angle * dt
    dq = jnp.concatenate([jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1)
    return quat_normalize(quat_mul(dq, q))


# ---------------------------------------------------------------------------
# Misc small helpers
# ---------------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
    """3x3 cross-product matrix: skew(v) @ u == v x u."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def orthonormal_tangents(n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Two unit tangents orthogonal to unit normal n (branch-free)."""
    # pick the world axis least aligned with n
    ref = jnp.where(jnp.abs(n[..., 2:3]) < 0.9, jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
    t1 = jnp.cross(ref, n)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2
