"""Pallas TPU kernel: batched explicit SPD inverse (the substep's M_eff⁻¹).

VERDICT r3 item 3 ("partial-fusion Pallas substep at a bounded op count"):
the fused whole-substep kernel (ops/substep_pallas.py) is blocked on the
Mosaic compile wall (~10^5 MLIR ops), but the roofline attribution
(RESULTS.md, laikago B=8192) shows the non-contact base of 3.16 us/env-step
is ~150 *serial* small fused ops, and the largest single dependency chain
among them is the explicit Cholesky inverse of the 18x18 effective mass
matrix (physics/linalg.py:spd_inverse — ~500 chained (B, n)-wide ops per
substep: 171 column updates + 2x171 triangular-solve rows).

This kernel runs that whole chain per batch tile with everything resident
in VMEM: ONE HBM read of M_eff (B, n·n) and ONE write of M⁻¹, instead of
~500 fused-op round trips.  The math is op-for-op the same as
linalg.spd_inverse (same column order, same maximum(..., 1e-12) guard, same
row-wise forward/backward substitution with identity rhs), so results match
the XLA path to float associativity — parity-pinned by
tests/test_spd_pallas.py.

Layout: batch on the LANE axis ((n·n, TILE) blocks), the same layout that
fixed pgs_pallas's bandwidth-bound regime — every per-column slice
``m[j·n:(j+1)·n]`` is a static (n, TILE) sublane block with all 128 lanes
busy.  M_eff is symmetric, so the row-major/column-major distinction in the
flattened layout is immaterial.

Integration: ``make_spd_inverse(n)`` returns a ``custom_vmap`` function —
unbatched it falls back to linalg.spd_inverse; under ``jax.vmap(env.step)``
the batched rule dispatches one ``pallas_call`` over batch tiles.  Select
with ``PhysicsConfig(spd_pallas=True)`` (combined-env configs expose it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _spd_inv_kernel(n: int, m_ref, out_ref):
    """One batch tile: factor + 2 triangular solves, VMEM-resident.

    ``m_ref`` is (n·n, T): column j of M occupies sublanes j·n:(j+1)·n
    (symmetric input, so this equals the row interpretation).
    """
    row = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    # --- column-wise right-looking Cholesky (linalg._chol_columns) ---
    cols = []
    for j in range(n):
        c = m_ref[j * n:(j + 1) * n, :]               # (n, T) static slice
        for k in range(j):
            c = c - cols[k][j:j + 1, :] * cols[k]
        d = jnp.sqrt(jnp.maximum(c[j:j + 1, :], 1e-12))
        c = c / d
        cols.append(jnp.where(row >= j, c, 0.0))

    # --- forward substitution L Y = I, row-wise (linalg._fwd_rows with
    # identity rhs rows as iota one-hots) ---
    ys = []
    for i in range(n):
        r = (row == i).astype(jnp.float32)            # (n, 1) -> broadcasts
        for k in range(i):
            r = r - cols[k][i:i + 1, :] * ys[k]
        ys.append(r / cols[i][i:i + 1, :])

    # --- backward substitution Lᵀ X = Y (linalg._bwd_rows) ---
    xs = [None] * n
    for i in reversed(range(n)):
        r = ys[i]
        for k in range(i + 1, n):
            r = r - cols[i][k:k + 1, :] * xs[k]
        xs[i] = r / cols[i][i:i + 1, :]

    out_ref[...] = jnp.concatenate(xs, axis=0)        # row i at i·n:(i+1)·n


@functools.lru_cache(maxsize=None)
def make_spd_inverse(n: int, tile: int = 256, interpret: bool | None = None):
    """Build the custom-vmap SPD-inverse for (n, n) matrices.

    Returned fn signature (unbatched): ``m_inv = inv(M_eff)`` with M_eff
    (n, n) SPD; under one ``jax.vmap`` level the batched rule runs the
    Pallas kernel over batch tiles.
    """

    @jax.custom_batching.custom_vmap
    def inv(M):
        from simgan_tpu.physics.linalg import spd_inverse
        return spd_inverse(M)

    @inv.def_vmap
    def _batched(axis_size, in_batched, M):
        if not in_batched[0]:
            M = jnp.broadcast_to(M, (axis_size,) + M.shape)
        B = axis_size
        t = min(tile, max(8, B))
        pad = (-B) % t
        M2 = M.reshape(B, n * n)
        if pad:
            # pad with identities so the padded lanes factor safely
            eye = jnp.broadcast_to(jnp.eye(n).reshape(n * n), (pad, n * n))
            M2 = jnp.concatenate([M2, eye])
        Bp = B + pad
        itp = (jax.default_backend() != "tpu") if interpret is None else interpret
        spec = pl.BlockSpec((n * n, t), lambda i: (0, i))
        out = pl.pallas_call(
            functools.partial(_spd_inv_kernel, n),
            grid=(Bp // t,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((n * n, Bp), jnp.float32),
            interpret=itp,
        )(M2.T)
        return out.T[:B].reshape(B, n, n), True

    return inv
