"""Small-matrix contractions as broadcast-multiply-reduce.

Mosaic (Pallas TPU) lowers only plain 2-D dots; the physics' contractions
are all tiny (3x3, 6..18-wide) and batched over links and/or envs, so we
express them as elementwise products + reductions.  XLA fuses these exactly
as well as `dot_general` at these sizes, and the same code lowers inside
Pallas kernels — one physics implementation for both paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mv(A: jax.Array, x: jax.Array) -> jax.Array:
    """(..., m, n) @ (..., n) -> (..., m)."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def vm(x: jax.Array, A: jax.Array) -> jax.Array:
    """(..., m) @ (..., m, n) -> (..., n)."""
    return jnp.sum(x[..., :, None] * A, axis=-2)


def mm(A: jax.Array, B: jax.Array) -> jax.Array:
    """(..., m, k) @ (..., k, n) -> (..., m, n).

    The contraction dim is unrolled at trace time so no intermediate exceeds
    rank 3 under a vmap batch (Mosaic's vector-layout limit); k <= 18
    everywhere in the engine.
    """
    k = A.shape[-1]
    out = None
    for i in range(k):
        # static slices only (integer indexing lowers to gathers in Mosaic)
        a_col = A[..., :, i:i + 1]                       # (..., m, 1)
        b_row = B[..., i:i + 1, :]                       # (..., 1, n)
        term = a_col * b_row
        out = term if out is None else out + term
    return out


def mtm(A: jax.Array, B: jax.Array) -> jax.Array:
    """(..., k, m)ᵀ @ (..., k, n) -> (..., m, n), contraction unrolled."""
    k = A.shape[-2]
    out = None
    for i in range(k):
        a_row = jnp.swapaxes(A[..., i:i + 1, :], -1, -2)  # (..., m, 1)
        b_row = B[..., i:i + 1, :]                        # (..., 1, n)
        term = a_row * b_row
        out = term if out is None else out + term
    return out
