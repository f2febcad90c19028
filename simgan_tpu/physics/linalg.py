"""Small dense SPD solves as pure jnp (unrolled Cholesky).

The dynamics needs (M + dt·D)⁻¹ for 6x6 (hopper) / 18x18 (laikago) SPD
matrices.  LAPACK/XLA ``cho_factor`` is a custom call — unavailable inside
Pallas kernels and with non-trivial dispatch overhead at these sizes — so we
unroll the factorization at trace time into pure elementwise ops, which both
the TPU vector units and Mosaic handle natively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_factor(M: jax.Array) -> jax.Array:
    """Lower-triangular Cholesky factor of an (n, n) SPD matrix, unrolled."""
    n = M.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = M[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    rows = [jnp.stack([L[i][j] if j <= i else jnp.zeros(()) for j in range(n)])
            for i in range(n)]
    return jnp.stack(rows)


def cholesky_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L Lᵀ) x = b for one rhs vector (n,), unrolled."""
    n = L.shape[-1]
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i, k] * y[k]
        y[i] = s / L[i, i]
    # backward: Lᵀ x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k, i] * x[k]
        x[i] = s / L[i, i]
    return jnp.stack(x)


def spd_inverse(M: jax.Array) -> jax.Array:
    """Explicit inverse of an SPD (n, n) matrix via unrolled Cholesky."""
    n = M.shape[-1]
    L = cholesky_factor(M)
    cols = [cholesky_solve(L, jnp.eye(n)[:, j]) for j in range(n)]
    return jnp.stack(cols, axis=-1)
