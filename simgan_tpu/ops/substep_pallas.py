"""Pallas TPU kernel: the fused physics control step.

The profiled bottleneck of the hybrid-sim hot loop is not FLOPs but the
~10^3 tiny sequential XLA ops per 500 Hz substep (FK chain, dynamics
assembly, contact sweep), each paying dispatch/HBM-roundtrip overhead at
(batch, small) shapes.  This kernel runs the *entire* control step —
``control_skip`` substeps — inside one Pallas program per batch tile: the
state lives in VMEM, every "scalar" of the physics becomes a (TILE,) vector
across the batch lanes, and the whole sequential chain executes with zero
kernel-launch overhead.

Crucially the kernel body *reuses the engine's own* ``substep`` via an
in-kernel ``jax.vmap`` — the physics is written once (physics/engine.py) and
traced into either an XLA graph or a Mosaic kernel.  The only substitution
is the Cholesky solve (LAPACK custom calls cannot lower to Mosaic), replaced
by the unrolled factorization in physics/linalg.py.

Use ``pallas_control_step`` as a drop-in for
``jax.vmap(control_step)`` on batched states; set ``interpret=True`` to run
on CPU for tests.

Mosaic status (re-checked 2026-08-17, jax 0.9 / v5e via the axon remote
compile tunnel): still blocked.  Repro: pair-free hopper System, B=256,
tile=256, interpret=False → the Mosaic MLIR (≈387 KB) is generated
client-side but the remote `tpu_compile_helper` subprocess exits 1 and the
HTTP 500 swallows the Mosaic diagnostic (earlier direct runs showed a
`tpu.concatenate` layout limitation: three vector<512x1> → 512x3).  Also
note the kernel predates capsule-pair rows — the in-kernel unrolled PGS
asserts floor-contacts-only, so hopper must be built without `pair_*`
fields to reach the lowering at all.  The XLA path (964k hopper / 157k
laikago hybrid steps/s/chip) already exceeds the north star, so this
kernel remains an interpret-mode-tested experiment, not a production path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simgan_tpu.core.system import DomainParams, PhysState, System
from simgan_tpu.physics.engine import PhysicsConfig, substep


def _flatten_dp(dp: DomainParams):
    leaves, treedef = jax.tree.flatten(dp)
    return leaves, treedef


def pallas_control_step(
    sys: System,
    dp: DomainParams,          # batched (B, ...) leaves
    state: PhysState,          # q (B, nq), qd (B, nv)
    motor_torque: jax.Array,   # (B, A)
    cfg: PhysicsConfig,
    control_skip: int = 10,
    tile: int = 256,
    interpret: bool = False,
) -> PhysState:
    B = state.q.shape[0]
    assert B % tile == 0, (B, tile)
    # explicit (unrolled) cholesky — no custom calls in Mosaic; unrolled PGS —
    # in-kernel scalar chains are pure VPU ops over the batch lanes
    cfg = cfg._replace(
        explicit_cholesky=True,
        contact=cfg.contact._replace(unroll=True),
    )

    dp_leaves, dp_def = _flatten_dp(dp)
    # System arrays (and any literal constants created inside the traced
    # physics) must be explicit kernel inputs — Pallas kernels cannot capture
    # array constants.  jax.closure_convert hoists them all for us.
    sys_leaves, sys_def = jax.tree.flatten(sys)
    n_dp = len(dp_leaves)
    batched_inputs = [state.q, state.qd, motor_torque] + list(dp_leaves)
    n_batched = len(batched_inputs)

    def raw_step(q, qd, torque, *leaves):
        dp_tile = jax.tree.unflatten(dp_def, leaves[:n_dp])
        sys_k = jax.tree.unflatten(sys_def, leaves[n_dp:])

        def one_substep(_, carry):
            cq, cqd = carry
            st = jax.vmap(
                lambda q_, qd_, t_, d_: substep(sys_k, d_, PhysState(q=q_, qd=qd_), t_, cfg)
            )(cq, cqd, torque, dp_tile)
            return (st.q, st.qd)

        # fori_loop, not scan: Mosaic lowers fori_loop natively
        q, qd = jax.lax.fori_loop(0, control_skip, one_substep, (q, qd))
        return q, qd

    tile_examples = (
        [jnp.zeros((tile,) + x.shape[1:], x.dtype) for x in batched_inputs[:3]]
        + [jnp.zeros((tile,) + x.shape[1:], x.dtype) for x in dp_leaves]
        + [jnp.zeros(x.shape, x.dtype) for x in sys_leaves]
    )
    # Hoist every jaxpr constant (incl. literal arrays created inside the
    # physics) into explicit kernel inputs: trace once, then eval the jaxpr
    # with consts passed as arguments.
    closed_jaxpr = jax.make_jaxpr(raw_step)(*tile_examples)
    consts = [jnp.asarray(c) for c in closed_jaxpr.consts]

    def closed(*vals):
        n_const = len(consts)
        const_vals = vals[len(vals) - n_const:] if n_const else ()
        arg_vals = vals[: len(vals) - n_const]
        return jax.core.eval_jaxpr(closed_jaxpr.jaxpr, const_vals, *arg_vals)

    # 0-d arrays can't be VMEM blocks; ship them as (1,) and restore inside.
    rep_inputs = list(sys_leaves) + list(consts)
    rep_scalar = [x.ndim == 0 for x in rep_inputs]
    rep_inputs = [x.reshape(1) if s else x for x, s in zip(rep_inputs, rep_scalar)]
    inputs = batched_inputs + rep_inputs

    def kernel(*refs):
        in_refs = refs[: len(inputs)]
        q_out, qd_out = refs[len(inputs):]
        vals = [r[:] for r in in_refs[:n_batched]]
        for r, s in zip(in_refs[n_batched:], rep_scalar):
            v = r[:]
            vals.append(v[0] if s else v)
        q, qd = closed(*vals)
        q_out[:] = q
        qd_out[:] = qd

    grid = (B // tile,)

    def spec_for(x):
        block = (tile,) + x.shape[1:]
        return pl.BlockSpec(block, lambda i: (i,) + (0,) * (x.ndim - 1),
                            memory_space=pltpu.VMEM)

    def spec_replicated(x):
        return pl.BlockSpec(x.shape, lambda i: (0,) * max(x.ndim, 1),
                            memory_space=pltpu.VMEM)

    in_specs = ([spec_for(x) for x in batched_inputs] +
                [spec_replicated(x) for x in inputs[n_batched:]])

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(spec_for(state.q), spec_for(state.qd)),
        out_shape=(
            jax.ShapeDtypeStruct(state.q.shape, state.q.dtype),
            jax.ShapeDtypeStruct(state.qd.shape, state.qd.dtype),
        ),
        interpret=interpret,
    )(*inputs)
    return PhysState(q=out[0], qd=out[1])
