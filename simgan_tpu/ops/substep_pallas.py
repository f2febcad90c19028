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

Mosaic status (round 3, jax 0.9 / v5e via the axon remote compile tunnel):
the blocker was `tpu.concatenate` of same-array column slices carrying
different lane/sublane offsets — Mosaic reports "Not implemented:
result/input offset mismatch on non-concat dimension" for e.g. three
vector<256x1xf32> with in_layouts offsets {0,0}/{0,1}/{1,2} → 256x3
(isolated stacks of freshly-computed vectors lower fine; the relayout rule
for offset-carrying inputs is what is missing).  Worked around by
intercepting `lax.concatenate_p.bind` while tracing the kernel body and
rewriting every concat whose pieces have extent 1 along the concat axis
(i.e. every `jnp.stack`, which is all the physics' hot concats) into an
accumulated broadcast-multiply with one-hot rows — no tpu.concatenate is
emitted, layouts normalize through the multiply.  Note the in-kernel
unrolled PGS still asserts floor-contacts-only, so systems must be built
without `pair_*` fields (see scripts/pallas_probe.py: pair-free hopper).

With the rewrite, client-side Mosaic MLIR generation now SUCCEEDS (probe:
"LOWERED ok", previously it died in layout inference) — but the remote
`tpu_compile_helper` then burns >20 min without returning even for a
minimal B=128/tile=128/skip=1/iters=1 kernel (the monolithic unrolled
substep is ~10^5 MLIR ops after the one-hot expansion; compile wall-clock,
not another lowering error, is the remaining blocker).  Status: kernel is
interpret-mode exact (slow-gated test) and now lowers; it stays
experimental until a bounded Mosaic compile lands.  Repro:
`PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_probe.py 128 128 1 1`.

RESOLUTION (round 3): the Pallas idea landed at reduced scope in
ops/pgs_pallas.py — the contact PGS solve alone (~700 MLIR ops) compiles
under Mosaic in ~2 min and runs 5.5x faster than the XLA rolled loop in
the latency-bound identification regime (RESULTS.md "Pallas PGS contact-
solve kernel").  This full-substep kernel remains the documented-blocked
maximal version.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simgan_tpu.core.system import DomainParams, PhysState, System
from simgan_tpu.physics.engine import PhysicsConfig, substep


def _flatten_dp(dp: DomainParams):
    leaves, treedef = jax.tree.flatten(dp)
    return leaves, treedef


@contextlib.contextmanager
def stacks_as_onehot_sums():
    """Trace-time rewrite of `jnp.stack`-style concatenates (all pieces have
    extent 1 along the concat axis) into accumulated one-hot broadcast
    multiplies.  Mosaic (jax 0.9) cannot relayout tpu.concatenate inputs
    whose vector layouts carry different lane/sublane offsets ("result/input
    offset mismatch on non-concat dimension"); the multiply path normalizes
    layouts instead.  Concats with wider pieces fall through to the real
    primitive (none are on the physics hot path)."""
    orig_bind = lax.concatenate_p.bind

    def bind(*ops, **params):
        dim = params["dimension"]
        if (len(ops) > 1 and all(getattr(o, "ndim", 0) >= 1
                                 and o.shape[dim] == 1 for o in ops)):
            k = len(ops)
            out = None
            for i, o in enumerate(ops):
                # one-hot from iota+compare, NOT an array constant: consts
                # materialized here would land inside nested pjit sub-jaxprs
                # (e.g. jnp.cross's jitted body), which Mosaic rejects
                # ("assert not jaxpr.constvars").
                hot = (jnp.arange(k) == i).astype(o.dtype).reshape(
                    (k,) + (1,) * (o.ndim - 1 - dim))
                term = o * hot        # broadcasts the size-1 concat axis to k
                out = term if out is None else out + term
            return out
        return orig_bind(*ops, **params)

    # instance attribute shadows the class method for concatenate_p only
    lax.concatenate_p.bind = bind
    try:
        yield
    finally:
        del lax.concatenate_p.bind


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
    # with consts passed as arguments.  Stacks are rewritten to one-hot sums
    # at trace time (Mosaic tpu.concatenate layout limitation, see module
    # docstring) — skipped in interpret mode to keep the CPU equivalence test
    # exercising the untransformed graph too.
    if interpret:
        closed_jaxpr = jax.make_jaxpr(raw_step)(*tile_examples)
    else:
        with stacks_as_onehot_sums():
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
