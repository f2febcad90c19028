"""Left-right mirror symmetry maps for the laikago obs/action.

Reference: my_pybullet_envs/laikago.py:437-497 (mirror_obs,
mirror_obs_per_step, mirror_action, mirror_foot_pos, mirror_leg_q).  Used by
the mirror-symmetry PPO loss (--loss-sym) and the duplicated-symmetric
rollout augmentation (--dup-sym) in the behavior trainer (main.py:133-147,
181-245).  Leg order FR, FL, RR, RL; an R<->L swap needs no joint-sign flip
because the URDF hip axes are already mirrored ((0,0,-1) vs (0,0,1)).

All maps are batched (operate on trailing dim), so they can be applied to a
whole rollout tensor in one fused op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from simgan_tpu.core import maths

FRAME = 37


def _mirror_leg_q(q6):
    """Swap right-leg and left-leg joint triples (laikago.py:444-445)."""
    return jnp.concatenate([q6[..., 3:6], q6[..., 0:3]], axis=-1)


def _mirror_foot_pos(rl):
    """Swap R/L foot offsets, negating y (laikago.py:437-441)."""
    r, l = rl[..., 0:3], rl[..., 3:6]
    flip = jnp.asarray([1.0, -1.0, 1.0])
    return jnp.concatenate([l * flip, r * flip], axis=-1)


def mirror_obs_frame(obs37: jax.Array) -> jax.Array:
    """Mirror one 37-D robot obs frame (laikago.py:459-487)."""
    rotmat = obs37[..., 1:10].reshape(obs37.shape[:-1] + (3, 3))
    quat = maths.mat_to_quat(rotmat)
    rpy = maths.quat_to_euler(quat)
    rpy_m = jnp.stack(
        [rpy[..., 0], -rpy[..., 1], 3.14159 - rpy[..., 2]], axis=-1)
    rot_m = maths.quat_to_mat(maths.quat_from_euler(rpy_m))
    rot_m = rot_m.reshape(obs37.shape[:-1] + (9,))

    linvel = obs37[..., 10:13] * jnp.asarray([1.0, -1.0, 1.0])
    q_front = _mirror_leg_q(obs37[..., 13:19])
    q_rear = _mirror_leg_q(obs37[..., 19:25])
    feet_front = _mirror_foot_pos(obs37[..., 25:31])
    feet_rear = _mirror_foot_pos(obs37[..., 31:37])
    return jnp.concatenate(
        [obs37[..., 0:1], rot_m, linvel, q_front, q_rear, feet_front, feet_rear],
        axis=-1,
    )


def mirror_obs(obs: jax.Array) -> jax.Array:
    """Mirror a stacked obs whose last dim is a multiple of 37 (laikago.py:448-456)."""
    d = obs.shape[-1]
    assert d % FRAME == 0, d
    frames = obs.reshape(obs.shape[:-1] + (d // FRAME, FRAME))
    mirrored = mirror_obs_frame(frames)
    return mirrored.reshape(obs.shape)


def mirror_action(act: jax.Array) -> jax.Array:
    """Mirror a 12-D action (laikago.py:490-497)."""
    return jnp.concatenate(
        [_mirror_leg_q(act[..., 0:6]), _mirror_leg_q(act[..., 6:12])], axis=-1)
