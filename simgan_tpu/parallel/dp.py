"""Data-parallel training step over a device mesh.

SPMD layout: env states / rollout tensors sharded on the env axis, policy +
optimizer state replicated.  The update function is the *same* jitted program
as single-chip (train_behavior / train_simgan make_update_fn); sharding is
expressed with in_shardings/out_shardings and jax.lax.with_sharding_constraint
— XLA inserts the all-reduce for the PPO/discriminator gradients over ICI.
This replaces the reference's process-pool + pipes (SURVEY §2.5) with
compiler-scheduled collectives.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simgan_tpu.parallel.mesh import env_sharding, replicated


def shard_train_state(mesh: Mesh, train_state, carry_field: str = "carry", axis: str = "dp"):
    """Place a (params, opt_state, ..., carry) NamedTuple on the mesh: the
    rollout carry (env states/obs/reward-norm) is env-sharded, the rest
    replicated."""
    env_sh = env_sharding(mesh, axis)
    rep = replicated(mesh)

    def place(name, value):
        if name == carry_field:
            def put(x):
                if hasattr(x, "ndim") and x.ndim >= 1:
                    return jax.device_put(x, env_sh)
                return jax.device_put(x, rep)

            # states/obs have leading env axis; key/rms scalars replicated
            states = jax.tree.map(put, value.states)
            obs = jax.device_put(value.obs, env_sh)
            key = jax.device_put(value.key, rep)
            rn = value.reward_norm
            if rn is not None:
                rn = rn.replace(
                    ret=jax.device_put(rn.ret, env_sh),
                    rms=jax.device_put(rn.rms, rep),
                )
            return type(value)(states, obs, key, rn)
        return jax.device_put(value, rep)

    return type(train_state)(*[place(n, v) for n, v in zip(train_state._fields, train_state)])


def jit_dp(update_fn: Callable, mesh: Mesh):
    """Jit an update function for SPMD execution over the mesh.

    Sharding propagates from the operands (placed by shard_train_state): the
    NamedSharding leaves carry the mesh, XLA partitions the rollout along the
    env axis and inserts the gradient all-reduce over ICI."""
    del mesh  # embedded in the operand shardings
    return jax.jit(update_fn)
