"""Pallas TPU kernel: the batched projected Gauss-Seidel contact solve.

SURVEY §7.2 calls for the batched contact solve as a Pallas kernel.  The
full fused-substep kernel (ops/substep_pallas.py) lowers but its unrolled
body is ~10^5 MLIR ops and the remote Mosaic compile never returns; this
module lands the same idea at the scope where it pays: the PGS sweep.

Why this is the hot spot (scripts/profile_laika_bench.py, real v5e,
B=8192): the PGS sweeps are 58% of the laikago hybrid env step (4.4 of
7.6 us/step).  The rolled XLA path (physics/contact.py ``row_body``)
executes ``iterations * R`` sequential dynamic-slice + dot + scatter ops
per substep — R=58 rows for laikago — each op touching the full
(B, R) / (B, R, R) operands in HBM.  Per control step (10 substeps) that
is ~2900 dependent HBM-roundtrip ops.

The kernel instead tiles the batch and keeps everything in VMEM: one
program loads its (TILE, R·R) Delassus block once, runs ALL
``iterations`` sweeps over all R rows as (TILE,)-wide vector ops (python
loop over rows — static column indices, no gathers; ``fori_loop`` over
sweeps keeps the MLIR op count at ~10 ops × R, far under the Mosaic
wall), and writes the impulses once.  Gauss-Seidel's sequential row
dependency is preserved exactly — the batch dimension is where the
parallelism lives, matching how the reference amortizes Bullet's solver
over 8 CPU worker processes (SURVEY §2.3 vec-env layer).

Row semantics are identical to physics/contact.py's rolled loop: same
row order, same projection (normal >= 0, friction/torsional clamped by
mu·lambda_n of the controlling normal row), same softness/CFM diagonal
and active-row masking — pinned by tests/test_pgs_pallas.py against the
rolled solver on contact-rich laikago/hopper states.

Integration: ``make_pgs_solver`` returns a ``jax.custom_batching
.custom_vmap`` function.  Unbatched (direct ``substep`` call) it runs
the rolled XLA loop; under ``jax.vmap(env.step)`` the batched rule fires
and dispatches the whole (B, ...) problem to one ``pallas_call`` over
batch tiles.  Select with ``ContactConfig(solver='pgs_pallas')``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _pgs_kernel(R: int, iterations: int, is_normal: tuple, norm_idx: tuple,
                a_ref, v0_ref, rhs_ref, mu_ref, soft_ref, act_ref, invd_ref,
                lam0_ref, out_ref):
    """One batch tile: all sweeps over all rows, state resident in VMEM.

    ``a_ref`` is the (TILE, R*R) row-major flattened Delassus matrix; the
    per-row slice ``a_ref[:, r*R:(r+1)*R]`` is static, so every memory
    access in the sweep is a static VMEM slice (no gathers — the Mosaic
    rule physics/smallmm.py documents).
    """
    act = act_ref[...]                               # (T, R) f32 mask
    lam = lam0_ref[...] * act
    v0 = v0_ref[...]
    rhs = rhs_ref[...]
    mu = mu_ref[...]
    soft = soft_ref[...]
    invd = invd_ref[...]
    # in-kernel iota for the per-row column select (captured host constants
    # are not allowed in pallas kernels; a where on iota==r fuses just as
    # well as a one-hot multiply-add)
    col = lax.broadcasted_iota(jnp.int32, (1, R), 1)

    def sweep(_, lam):
        for r in range(R):
            a_row = a_ref[:, r * R:(r + 1) * R]      # (T, R) static slice
            v = v0[:, r] + jnp.sum(a_row * lam, axis=1)
            lr = lam[:, r]
            cand = lr + (rhs[:, r] - v - soft[:, r] * lr) * invd[:, r]
            if is_normal[r]:
                new = jnp.maximum(cand, 0.0)
            else:
                lim = mu[:, r] * lam[:, norm_idx[r]]
                new = jnp.clip(cand, -lim, lim)
            new = new * act[:, r]
            lam = jnp.where(col == r, new[:, None], lam)
        return lam

    out_ref[...] = lax.fori_loop(0, iterations, sweep, lam)


def _pgs_kernel_t(R: int, iterations: int, is_normal: tuple, norm_idx: tuple,
                  a_ref, v0_ref, rhs_ref, mu_ref, soft_ref, act_ref, invd_ref,
                  lam0_ref, out_ref):
    """Transposed layout: batch on the LANE axis, rows on sublanes.

    Blocks are (R, TILE) (A is (R·R, TILE)), so a per-row read ``x[r]`` is
    a sublane slice with all 128 lanes busy, and the k-reduction in
    ``v = v0[r] + sum_k A[r,k]·lam[k]`` is a sublane-axis tree — no lane
    waste and no per-row relayouts, unlike the (TILE, R) layout where
    R<128 idles half the lanes (measured 1.74× SLOWER than XLA at B=8192;
    this layout is the fix for the bandwidth-bound regime)."""
    act = act_ref[...]                               # (R, T) f32 mask
    lam = lam0_ref[...] * act
    v0 = v0_ref[...]
    rhs = rhs_ref[...]
    mu = mu_ref[...]
    soft = soft_ref[...]
    invd = invd_ref[...]
    row = lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    def sweep(_, lam):
        for r in range(R):
            a_rows = a_ref[r * R:(r + 1) * R, :]     # (R, T) static slice
            v = v0[r] + jnp.sum(a_rows * lam, axis=0)
            lr = lam[r]
            cand = lr + (rhs[r] - v - soft[r] * lr) * invd[r]
            if is_normal[r]:
                new = jnp.maximum(cand, 0.0)
            else:
                lim = mu[r] * lam[norm_idx[r]]
                new = jnp.clip(cand, -lim, lim)
            new = new * act[r]
            lam = jnp.where(row == r, new[None, :], lam)
        return lam

    out_ref[...] = lax.fori_loop(0, iterations, sweep, lam)


def _pgs_rolled(A, v0, rhs, mu_r, softness_r, active_r, inv_diag, lam0,
                *, norm_idx, is_normal_r, iterations):
    """Unbatched reference path: the exact rolled loop from
    physics/contact.py (used as the custom_vmap fallback)."""
    R = v0.shape[-1]
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

    return lax.fori_loop(0, iterations * R, row_body,
                         jnp.where(active_r, lam0, 0.0))


@functools.lru_cache(maxsize=None)
def make_pgs_solver(R: int, iterations: int, is_normal: tuple,
                    norm_idx: tuple, tile: int = 256,
                    interpret: bool | None = None, layout: str = "auto"):
    """Build the custom-vmap PGS solver for a fixed row structure.

    Args are the static row metadata (hashable tuples so the solver is
    cached per system): ``is_normal[r]`` marks normal rows, ``norm_idx[r]``
    is the controlling normal row for friction clamping.

    ``layout``: 'batch_sublane' ((TILE, R) blocks), 'batch_lane'
    (transposed (R, TILE) blocks — full lane occupancy, see
    ``_pgs_kernel_t``), or 'auto' (batch_lane; override with
    SIMGAN_PGS_PALLAS_LAYOUT for A/B measurements).

    Returned fn signature (unbatched):
        lam = solve(A, v0, rhs, mu_r, softness_r, active_f, inv_diag, lam0)
    with A (R, R), everything else (R,); ``active_f`` is a float mask.
    Under one ``jax.vmap`` level the batched rule runs the Pallas kernel.
    """
    import os
    if layout == "auto":
        layout = os.environ.get("SIMGAN_PGS_PALLAS_LAYOUT", "batch_lane")

    @jax.custom_batching.custom_vmap
    def solve(A, v0, rhs, mu_r, softness_r, active_f, inv_diag, lam0):
        return _pgs_rolled(A, v0, rhs, mu_r, softness_r, active_f > 0.5,
                           inv_diag, lam0, norm_idx=norm_idx,
                           is_normal_r=is_normal, iterations=iterations)

    @solve.def_vmap
    def _batched(axis_size, in_batched, A, v0, rhs, mu_r, softness_r,
                 active_f, inv_diag, lam0):
        args = [A, v0, rhs, mu_r, softness_r, active_f, inv_diag, lam0]
        for i, (a, b) in enumerate(zip(args, in_batched)):
            if not b:
                args[i] = jnp.broadcast_to(a, (axis_size,) + a.shape)
        A, v0, rhs, mu_r, softness_r, active_f, inv_diag, lam0 = args
        B = axis_size
        t = min(tile, max(8, B))
        pad = (-B) % t
        if pad:
            z = lambda x: jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            A, v0, rhs, mu_r, softness_r, active_f, inv_diag, lam0 = map(
                z, (A, v0, rhs, mu_r, softness_r, active_f, inv_diag, lam0))
        Bp = B + pad
        itp = (jax.default_backend() != "tpu") if interpret is None else interpret
        if layout == "batch_lane":
            A2 = A.reshape(Bp, R * R).T               # (R*R, Bp)
            vecs = [x.T for x in (v0, rhs, mu_r, softness_r, active_f,
                                  inv_diag, lam0)]    # (R, Bp)
            spec = lambda d: pl.BlockSpec((d, t), lambda i: (0, i))
            lam = pl.pallas_call(
                functools.partial(_pgs_kernel_t, R, iterations, is_normal,
                                  norm_idx),
                grid=(Bp // t,),
                in_specs=[spec(R * R)] + [spec(R)] * 7,
                out_specs=spec(R),
                out_shape=jax.ShapeDtypeStruct((R, Bp), jnp.float32),
                interpret=itp,
            )(A2, *vecs)
            return lam.T[:B], True
        A2 = A.reshape(Bp, R * R)
        spec = lambda d: pl.BlockSpec((t, d), lambda i: (i, 0))
        lam = pl.pallas_call(
            functools.partial(_pgs_kernel, R, iterations, is_normal, norm_idx),
            grid=(Bp // t,),
            in_specs=[spec(R * R)] + [spec(R)] * 7,
            out_specs=spec(R),
            out_shape=jax.ShapeDtypeStruct((Bp, R), jnp.float32),
            interpret=itp,
        )(A2, v0, rhs, mu_r, softness_r, active_f, inv_diag, lam0)
        return lam[:B], True

    return solve
