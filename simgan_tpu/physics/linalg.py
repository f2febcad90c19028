"""Small dense SPD solves as pure jnp (trace-time-unrolled Cholesky).

The dynamics needs (M + dt·D)⁻¹ for 6x6 (hopper) / 18x18 (laikago) SPD
matrices.  LAPACK/XLA ``cho_factor`` is a custom call — unavailable inside
Pallas kernels and with non-trivial dispatch overhead at these sizes — so we
unroll the factorization at trace time into pure jnp ops.

The unrolling is COLUMN-wise (right-looking outer-product Cholesky), not
scalar-wise: every op in the emitted graph is an (n,)-vector op — (B, n)
under ``vmap`` — instead of a scalar chain.  At n=18 this is ~6x fewer ops,
each 18x wider, than the fully scalar unroll; measured 4.4x faster total
laikago physics on v5e (the scalar version's ~6k width-1 ops dominated the
whole substep).  Static masks/one-hots come from numpy so nothing here ever
lowers to a gather or scatter (Mosaic-safe, fusion-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _chol_columns(M: jax.Array) -> list[jax.Array]:
    """Columns of the lower Cholesky factor of an (n, n) SPD matrix.

    Column j is produced by one (n,)-wide update per previous column:
        c_j = (M[:, j] - Σ_{k<j} L[j, k] · c_k) ;  L[:, j] = c_j / sqrt(c_j[j])
    entries above the diagonal are masked to zero with a static mask.
    """
    n = M.shape[-1]
    cols: list[jax.Array] = []
    for j in range(n):
        c = M[..., :, j]
        for k in range(j):
            c = c - cols[k][..., j:j + 1] * cols[k]
        d = jnp.sqrt(jnp.maximum(c[..., j:j + 1], 1e-12))
        c = c / d
        mask = jnp.asarray(np.arange(n) >= j)
        cols.append(jnp.where(mask, c, 0.0))
    return cols


def cholesky_factor(M: jax.Array) -> jax.Array:
    """Lower-triangular Cholesky factor of an (n, n) SPD matrix."""
    return jnp.stack(_chol_columns(M), axis=-1)


def _fwd_rows(cols: list[jax.Array], B_rows: list[jax.Array]) -> list[jax.Array]:
    """Row-wise forward substitution: solve L Y = B for Y (rows as vectors).

    ``cols`` are the factor's columns; ``B_rows[i]`` is row i of the rhs
    matrix (any width).  Each step is one rhs-width vector op per prior row.
    """
    n = len(cols)
    rows: list[jax.Array] = []
    for i in range(n):
        r = B_rows[i]
        for k in range(i):
            r = r - cols[k][..., i:i + 1] * rows[k]
        rows.append(r / cols[i][..., i:i + 1])
    return rows


def _bwd_rows(cols: list[jax.Array], Y_rows: list[jax.Array]) -> list[jax.Array]:
    """Row-wise backward substitution: solve Lᵀ X = Y for X."""
    n = len(cols)
    xs: list[jax.Array | None] = [None] * n
    for i in reversed(range(n)):
        r = Y_rows[i]
        for k in range(i + 1, n):
            r = r - cols[i][..., k:k + 1] * xs[k]
        xs[i] = r / cols[i][..., i:i + 1]
    return xs  # type: ignore[return-value]


def cholesky_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L Lᵀ) x = b for one rhs vector (n,)."""
    n = L.shape[-1]
    cols = [L[..., :, j] for j in range(n)]
    y = _fwd_rows(cols, [b[..., i:i + 1] for i in range(n)])
    x = _bwd_rows(cols, y)
    return jnp.concatenate(x, axis=-1)


def spd_inverse(M: jax.Array) -> jax.Array:
    """Explicit inverse of an SPD (n, n) matrix via column-wise Cholesky.

    Solves L Lᵀ X = I with identity rows as static numpy one-hots; every op
    is (n,)-wide, totalling ~1.5 n² vector ops instead of ~n³ scalar ops.
    """
    n = M.shape[-1]
    cols = _chol_columns(M)
    eye_rows = [jnp.asarray(np.eye(n, dtype=np.float32)[i]) for i in range(n)]
    y = _fwd_rows(cols, eye_rows)
    x = _bwd_rows(cols, y)
    return jnp.stack(x, axis=-2)
