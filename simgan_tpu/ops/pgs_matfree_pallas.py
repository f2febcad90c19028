"""Pallas TPU kernel: MATRIX-FREE batched projected Gauss-Seidel.

``pgs_pallas`` keeps the Delassus matrix VMEM-resident across sweeps, but
still pays to *materialize* it: the XLA-side assembly A = J M^-1 J^T writes
B*R*R floats to HBM every substep (110 MB at the laikago bench shape
B=8192, R=58) and the batch-on-lanes relayout re-reads it twice more —
which is why that kernel loses the bandwidth-bound bench regime by 10%
(RESULTS.md round 3) despite winning the latency-bound trainers 5.5x.

This kernel removes the Delassus matrix entirely.  Gauss-Seidel only ever
needs the row dot  a_r . lam = J_r . (M^-1 J^T lam),  so it maintains
w = M^-1 J^T lam — an (NV,)-vector per env — in VMEM and updates it with
one AXPY per row update:

    v      = v0[r] + J_r . w
    lam[r] = project(lam[r] + (rhs[r] - v - soft*lam[r]) * inv_diag[r])
    w     += U_r * (lam[r] - lam_old)          # U = M^-1 J^T, column r

Per-substep HBM traffic drops from O(B R^2) assembly + relayout to
O(2 B R NV) for the J / U operands (R=58, NV=18: ~6x less), and the
A-assembly batched matmul disappears from the XLA graph.  Identical row
order, projection, and masking to the rolled loop in physics/contact.py;
results differ from 'pgs'/'pgs_pallas' only at float-association ulps
(the row dot contracts over NV instead of R, and w is accumulated), so
this solver is NOT bit-identical — production identification stays on
'pgs'/'pgs_pallas' per the solver doctrine (CLAUDE.md); this kernel
targets the bandwidth-bound bench/rollout regime.  Parity to float
round-off and trajectory-level drift are pinned by
tests/test_pgs_matfree.py.

Same integration pattern as ops/pgs_pallas.py: ``make_matfree_solver``
returns a ``custom_vmap`` function — unbatched calls run the rolled XLA
loop on A = (J M^-1) J^T, one vmap level dispatches a single
``pallas_call`` over batch tiles in the proven batch-on-lanes layout
(rows on sublanes, batch on lanes).

Replaces the btSequentialImpulseConstraintSolver step of the reference
(SURVEY §2.4; bullet3 btMultiBodyConstraintSolver) at speed-of-light HBM
cost for large batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _matfree_kernel(R: int, NV: int, iterations: int, is_normal: tuple,
                    norm_idx: tuple, j_ref, u_ref, v0_ref, rhs_ref, mu_ref,
                    soft_ref, act_ref, invd_ref, lam0_ref, lam_out, dqd_out):
    """One batch tile, batch on LANES: rows/dofs on sublanes.

    ``j_ref``/``u_ref`` are (R*NV, T) flattened row-major — the per-row
    slices below are static sublane slices (no gathers).  ``u_ref`` row r
    holds (J M^-1)[r] == (M^-1 J^T)[:, r] by symmetry of M^-1.
    """
    act = act_ref[...]                                  # (R, T) f32 mask
    lam = lam0_ref[...] * act
    v0 = v0_ref[...]
    rhs = rhs_ref[...]
    mu = mu_ref[...]
    soft = soft_ref[...]
    invd = invd_ref[...]
    row = lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    def u_lam(lam):
        """w = M^-1 J^T lam, accumulated in fixed row order."""
        w = u_ref[0:NV, :] * lam[0]
        for k in range(1, R):
            w = w + u_ref[k * NV:(k + 1) * NV, :] * lam[k]
        return w                                        # (NV, T)

    def sweep(_, carry):
        lam, w = carry
        for r in range(R):
            j_r = j_ref[r * NV:(r + 1) * NV, :]         # (NV, T) static slice
            v = v0[r] + jnp.sum(j_r * w, axis=0)
            lr = lam[r]
            cand = lr + (rhs[r] - v - soft[r] * lr) * invd[r]
            if is_normal[r]:
                new = jnp.maximum(cand, 0.0)
            else:
                lim = mu[r] * lam[norm_idx[r]]
                new = jnp.clip(cand, -lim, lim)
            new = new * act[r]
            w = w + u_ref[r * NV:(r + 1) * NV, :] * (new - lr)[None, :]
            lam = jnp.where(row == r, new[None, :], lam)
        return lam, w

    lam, _ = lax.fori_loop(0, iterations, sweep, (lam, u_lam(lam)))
    lam_out[...] = lam
    # fresh accumulation (not the AXPY-drifted carry) so dqd has the same
    # association every call regardless of sweep count
    dqd_out[...] = u_lam(lam)


def _rolled(J, Ut, v0, rhs, mu_r, softness_r, active_r, inv_diag, lam0,
            *, norm_idx, is_normal_r, iterations):
    """Unbatched fallback: form A = (J M^-1) J^T and run the exact rolled
    loop from physics/contact.py."""
    R = v0.shape[-1]
    A = jnp.sum(Ut[:, None, :] * J[None, :, :], axis=-1)   # (R, R)
    norm_idx = jnp.asarray(norm_idx)
    is_normal = jnp.asarray(is_normal_r)

    def row_body(i, lam):
        r = i % R
        a_row = lax.dynamic_slice_in_dim(A, r, 1, 0)[0]
        v = v0[r] + jnp.sum(a_row * lam)
        cand = lam[r] + (rhs[r] - v - softness_r[r] * lam[r]) * inv_diag[r]
        lam_n = lam[norm_idx[r]]
        lo = jnp.where(is_normal[r], 0.0, -mu_r[r] * lam_n)
        hi = jnp.where(is_normal[r], jnp.inf, mu_r[r] * lam_n)
        new = jnp.where(active_r[r], jnp.clip(cand, lo, hi), 0.0)
        return lam.at[r].set(new)

    lam = lax.fori_loop(0, iterations * R, row_body,
                        jnp.where(active_r, lam0, 0.0))
    dqd = jnp.sum(Ut * lam[:, None], axis=0)               # (NV,) = U lam
    return lam, dqd


@functools.lru_cache(maxsize=None)
def make_matfree_solver(R: int, NV: int, iterations: int, is_normal: tuple,
                        norm_idx: tuple, tile: int = 256,
                        interpret: bool | None = None):
    """Build the custom-vmap matrix-free PGS solver for a fixed row set.

    Returned fn signature (unbatched):
        lam, dqd = solve(J, Ut, v0, rhs, mu_r, softness_r, active_f,
                         inv_diag, lam0)
    with J (R, NV) the contact Jacobian, Ut (R, NV) = J @ M^-1, vectors
    (R,); ``dqd`` is M^-1 J^T lam, so the caller integrates
    qd = qd_free + dqd without touching M^-1 again.
    """

    @jax.custom_batching.custom_vmap
    def solve(J, Ut, v0, rhs, mu_r, softness_r, active_f, inv_diag, lam0):
        return _rolled(J, Ut, v0, rhs, mu_r, softness_r, active_f > 0.5,
                       inv_diag, lam0, norm_idx=norm_idx,
                       is_normal_r=is_normal, iterations=iterations)

    @solve.def_vmap
    def _batched(axis_size, in_batched, J, Ut, v0, rhs, mu_r, softness_r,
                 active_f, inv_diag, lam0):
        args = [J, Ut, v0, rhs, mu_r, softness_r, active_f, inv_diag, lam0]
        for i, (a, b) in enumerate(zip(args, in_batched)):
            if not b:
                args[i] = jnp.broadcast_to(a, (axis_size,) + a.shape)
        J, Ut, v0, rhs, mu_r, softness_r, active_f, inv_diag, lam0 = args
        B = axis_size
        t = min(tile, max(8, B))
        pad = (-B) % t
        if pad:
            z = lambda x: jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            J, Ut, v0, rhs, mu_r, softness_r, active_f, inv_diag, lam0 = map(
                z, (J, Ut, v0, rhs, mu_r, softness_r, active_f, inv_diag,
                    lam0))
        Bp = B + pad
        itp = (jax.default_backend() != "tpu") if interpret is None else interpret
        J2 = J.reshape(Bp, R * NV).T                       # (R*NV, Bp)
        U2 = Ut.reshape(Bp, R * NV).T
        vecs = [x.T for x in (v0, rhs, mu_r, softness_r, active_f,
                              inv_diag, lam0)]             # (R, Bp)
        spec = lambda d: pl.BlockSpec((d, t), lambda i: (0, i))
        lam, dqd = pl.pallas_call(
            functools.partial(_matfree_kernel, R, NV, iterations, is_normal,
                              norm_idx),
            grid=(Bp // t,),
            in_specs=[spec(R * NV)] * 2 + [spec(R)] * 7,
            out_specs=[spec(R), spec(NV)],
            out_shape=[jax.ShapeDtypeStruct((R, Bp), jnp.float32),
                       jax.ShapeDtypeStruct((NV, Bp), jnp.float32)],
            interpret=itp,
        )(J2, U2, *vecs)
        return (lam.T[:B], dqd.T[:B]), (True, True)

    return solve
