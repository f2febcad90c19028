"""Data-parallel training step over a device mesh.

SPMD layout: env states / rollout tensors sharded on the env axis, policy +
optimizer state replicated.  The update function is the *same* jitted program
as single-chip (train_behavior / train_simgan make_update_fn); the layout is
pinned on BOTH sides: operands are placed by ``shard_train_state`` and the
jitted update carries explicit ``out_shardings`` (carry env-sharded, params/
optimizer/stats replicated), so chained updates keep the intended layout
instead of leaving intermediates and update-#1 outputs to GSPMD propagation.
XLA inserts the all-reduce for the PPO/discriminator gradients over ICI.
This replaces the reference's process-pool + pipes (SURVEY §2.5) with
compiler-scheduled collectives.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh

from simgan_tpu.parallel.mesh import env_sharding, replicated


def _carry_shardings(mesh: Mesh, carry, axis: str = "dp"):
    """Sharding tree for a RolloutCarry: env-batch leaves on the 'dp' axis,
    RNG key and running-stat scalars replicated."""
    env_sh = env_sharding(mesh, axis)
    rep = replicated(mesh)
    # env states / obs have a leading env axis; scalars replicated
    states = jax.tree.map(
        lambda x: env_sh if getattr(x, "ndim", 0) >= 1 else rep, carry.states)
    rn = carry.reward_norm
    if rn is not None:
        # per-env return accumulator sharded; the running moments are a
        # single statistic of the whole batch — replicated
        rn = rn.replace(ret=env_sh, rms=jax.tree.map(lambda _: rep, rn.rms))
    return type(carry)(states, env_sh, rep, rn)


def state_shardings(mesh: Mesh, train_state, carry_field: str = "carry",
                    axis: str = "dp"):
    """Sharding tree for a (params, opt_state, ..., carry) train state:
    the rollout carry env-sharded, everything else replicated."""
    rep = replicated(mesh)
    out = []
    for name, value in zip(train_state._fields, train_state):
        if name == carry_field:
            out.append(_carry_shardings(mesh, value, axis))
        else:
            out.append(jax.tree.map(lambda _: rep, value))
    return type(train_state)(*out)


def shard_train_state(mesh: Mesh, train_state, carry_field: str = "carry",
                      axis: str = "dp"):
    """Place a (params, opt_state, ..., carry) NamedTuple on the mesh: the
    rollout carry (env states/obs/reward-norm) is env-sharded, the rest
    replicated."""
    return jax.device_put(
        train_state, state_shardings(mesh, train_state, carry_field, axis))


def jit_dp(update_fn: Callable, mesh: Mesh, train_state=None,
           carry_field: str = "carry", axis: str = "dp"):
    """Jit an ``update(state, key) -> (state, stats)`` function for SPMD
    execution over the mesh.

    Input shardings propagate from the operands (placed by
    shard_train_state); output shardings are pinned explicitly when a
    ``train_state`` template is given — the returned carry stays env-sharded
    and params/optimizer/stats replicated across arbitrarily many chained
    updates (tests/test_parallel.py asserts the layout after 2 updates).
    Stats are replicated because the host fetches them every update."""
    if train_state is None:
        return jax.jit(update_fn)
    out_sh = (state_shardings(mesh, train_state, carry_field, axis),
              replicated(mesh))
    return jax.jit(update_fn, out_shardings=out_sh)
