"""Compliant contact: detection + batched projected Gauss-Seidel impulse solve.

Reproduces the semantics of Bullet's sequential-impulse solver in the regime
the reference uses it (per-body ``contactStiffness``/``contactDamping``
mutated at runtime, ``numSolverIterations=100``; reference:
my_pybullet_envs/hopper_env_v3.py:118,169-177,
hopper_env_combined_policy.py:270-287):

* stiffness/damping -> constraint softness via Bullet's ERP/CFM conversion
  ``erp = dt*k/(dt*k + d)``, ``cfm = 1/(dt*k + d)``;
* combined contact parameters: lateral friction = f_a*f_b, restitution =
  e_a*e_b, stiffness in series, damping summed, spinning friction by the
  cross rule ``s_a*f_b + s_b*f_a``;
* restitution applied as a velocity bias when the approach speed exceeds a
  threshold;
* friction: two tangent rows clamped by ``mu * lambda_n``; torsional
  (spinning) friction as one angular row clamped by ``mu_spin * lambda_n``.

All contacts are against the horizontal floor plane ``z = floor_z`` (the only
collider in every reference env).  Candidate contact spheres are static per
robot; inactive ones are masked, so the jitted program has fixed shape.

The "deformable mattress" target envs (``loadSoftBody`` with mass-spring
parameters, hopper_env_v3.py:143-149, laikago_env_v4.py:177-183) are modeled
by the same machinery as a soft half-space: the floor's stiffness/damping are
set to the soft body's spring constants and the robot-side contact params are
ignored (``combine='floor'``) because Bullet's deformable contact does not
read the rigid body's stiffness either.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from simgan_tpu.core import maths
from simgan_tpu.core.system import DomainParams, System
from simgan_tpu.physics import smallmm
from simgan_tpu.physics.dynamics import Dyn
from simgan_tpu.physics.kinematics import geom_world


class ContactConfig(NamedTuple):
    # Bullet runs 100 sequential-impulse iterations (hopper_env_v3.py:118);
    # our PGS on <=10 candidate contacts is converged far earlier — measured
    # max relative qd error vs 100 iterations over randomized contact-rich
    # states: hopper 1.8e-6 @10 iters, laikago 1.3e-3 @10 iters.
    iterations: int = 10
    restitution_threshold: float = 0.2   # Bullet default splitting threshold
    combine: str = "bullet"              # 'bullet' | 'floor' (deform surrogate)
    max_friction: float = 10.0           # Bullet clamps combined friction at 10
    # True: statically unroll the Gauss-Seidel sweep into elementwise scalar
    # chains.  False (default): rolled fori_loop over rows.  Measured on
    # v5e: the rolled loop is ~1.7x faster AND compiles ~3x faster — the
    # unrolled scalar graph defeats the vector units.  Kept as an option for
    # experimentation.
    unroll: bool = False
    # 'pgs': sequential Gauss-Seidel row sweep (R serial updates/iteration).
    # 'staged': TPU-parallel variant — all normal rows updated together, then
    # all friction rows, via 2 (R,R) matvecs per sweep instead of R serial
    # rank-1 updates.  Converges like block-Jacobi with GS between stages;
    # wins when the rollout is LATENCY-bound (small env batches: 20 serial
    # matvecs/substep vs laikago's 400 serial row updates), loses when
    # bandwidth-bound (large batches re-read the full (R,R) Delassus matrix
    # every sweep).  On the TRUE pi_dyn contact distribution (damping
    # exp([1,3])*2 = [5.44, 40.2] — the reference code's squash, not its
    # "20~2000" comment) staged matches pgs at equal sweep count
    # (scripts/solver_fidelity_diag.py, tests/test_staged_training_parity.py);
    # the stage-iteration stall seen earlier only occurs on the unreachable
    # wide-damping regime, so re-validate before any use outside the pi_dyn
    # coefficient ranges.
    # 'pgs_pallas': bit-of-math-identical PGS (same row order/projection),
    # executed for BATCHED states as one Pallas kernel per batch tile with
    # the Delassus matrix resident in VMEM across all sweeps — removes the
    # iterations*R serial HBM-roundtrip ops of the rolled path (measured
    # 58% of the laikago hybrid step at B=8192).  Unbatched calls fall back
    # to the rolled loop (ops/pgs_pallas.py).
    # 'pgs_matfree': matrix-free Pallas PGS — the Delassus matrix is never
    # materialized; the kernel maintains w = M⁻¹Jᵀλ in VMEM with one AXPY
    # per row update, cutting per-substep HBM traffic from O(B·R²) to
    # O(2·B·R·NV) (~6x at laikago R=58).  Same row order/projection as
    # 'pgs' but NOT bit-identical (row dot contracts over NV instead of R):
    # bench/rollout use; production identification stays on pgs/pgs_pallas
    # (ops/pgs_matfree_pallas.py).
    solver: str = "pgs"
    # Statically unroll the ROW loop of the 'pgs' sweep (fori_loop stays over
    # sweeps).  Bit-identical to the fully-rolled (iterations*R fori) form —
    # same row order, same float ops — but the row index becomes a trace-time
    # constant, which deletes the per-row dynamic-index machinery the XLA
    # profile showed costing ~23% of the laikago B=8192 solve (pred/s32
    # dynamic slices, branch selects, and a diagonal-extraction fusion that
    # re-read the full Delassus matrix).  Distinct from ``unroll`` above,
    # which unrolls BOTH loops into scalar chains (a measured regression).
    row_unroll: bool = True
    # Thread each substep's impulse solution into the next substep's solve
    # (control_step scan).  Bullet warm-starts its sequential-impulse solver
    # the same way; contacts persist across 2 ms substeps, so converged
    # accuracy is reached with far fewer sweeps.
    warm_start: bool = True


# Backup hard plane under the finite mattress (deform envs): the reference
# plane has no contactStiffness set, so Bullet solves it rigidly with the
# global erp; k/d below give erp = dt*k/(dt*k+d) = 0.2 at dt=1/500 with a
# small cfm — near-rigid.  (The robot falls ~10 m off the mattress edge and
# the episode terminates on height long before this contact matters.)
HARD_K = 1e5
HARD_D = 800.0


def _combined_params(sys: System, dp: DomainParams, cfg: ContactConfig,
                     on_mattress: jax.Array | None = None):
    G = sys.n_geoms
    if cfg.combine == "floor":
        mu = jnp.broadcast_to(dp.floor_friction, (G,))
        mu_spin = jnp.broadcast_to(dp.floor_spinning_friction, (G,))
        e = jnp.broadcast_to(dp.floor_restitution, (G,))
        k = jnp.broadcast_to(dp.floor_stiffness, (G,))
        d = jnp.broadcast_to(dp.floor_damping, (G,))
        if on_mattress is not None:
            mu = jnp.where(on_mattress, mu, dp.hard_floor_friction)
            mu_spin = jnp.where(on_mattress, mu_spin, 0.0)
            e = jnp.where(on_mattress, e, 0.0)
            k = jnp.where(on_mattress, k, HARD_K)
            d = jnp.where(on_mattress, d, HARD_D)
    else:
        mu = jnp.clip(dp.lateral_friction * dp.floor_friction, 0.0, cfg.max_friction)
        mu_spin = dp.spinning_friction * dp.floor_friction + dp.floor_spinning_friction * dp.lateral_friction
        e = dp.restitution * dp.floor_restitution
        ks, kf = dp.contact_stiffness, dp.floor_stiffness
        k = ks * kf / jnp.maximum(ks + kf, 1e-9)
        d = dp.contact_damping + dp.floor_damping
    return mu, mu_spin, e, k, d


def n_rows(sys: System) -> int:
    """Constraint-row count of the static candidate contact set."""
    return 4 * sys.n_geoms + 3 * sys.n_pairs


def contact_impulses(
    sys: System,
    dp: DomainParams,
    dyn: Dyn,
    qd_free: jax.Array,
    dt: float,
    cfg: ContactConfig,
    lam0: jax.Array | None = None,
    floor_du: jax.Array | None = None,
    floor_dv: jax.Array | None = None,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Return the post-contact generalized velocity.

    ``qd_free`` is the velocity after applying all smooth forces for one
    substep.  Solves a small PGS system (4 rows per candidate floor contact:
    normal, 2 tangents, torsional; plus 3 rows per self-collision capsule
    pair) with Bullet-style soft constraints.

    ``lam0``: optional (R,) warm-start impulses (e.g. last substep's
    solution — Bullet warm-starts its sequential-impulse solver the same way
    across steps).  When given, returns ``(qd_new, lam)`` so the caller can
    thread the impulses through a substep scan; when None, returns just
    ``qd_new`` (cold start from zeros).

    ``floor_du``/``floor_dv``: optional (G,) per-geom mattress-surface
    deflection offset and vertical surface velocity (the deform_nodes field,
    physics/deformable.py).  The floor height each on-mattress geom sees is
    shifted by its offset and the normal rows target the surface's velocity
    instead of zero (contacts follow a sinking/rebounding surface).
    """
    G = sys.n_geoms
    if G == 0 and sys.n_pairs == 0:
        return qd_free if lam0 is None else (qd_free, jnp.zeros((0,)))
    with jax.default_matmul_precision("highest"):
        qd_new, lam = _contact_impulses_f32(
            sys, dp, dyn, qd_free, dt, cfg,
            jnp.zeros(n_rows(sys)) if lam0 is None else lam0,
            floor_du, floor_dv)
    return qd_new if lam0 is None else (qd_new, lam)


def _closest_seg_seg(p1, q1, p2, q2):
    """Closest points between 3-D segments [p1,q1], [p2,q2] (scalar shapes;
    the standard clamped-parameter algorithm, jit-safe)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    b = jnp.dot(d1, d2)
    c = jnp.dot(d1, r)
    f = jnp.dot(d2, r)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e) / jnp.where(denom > 1e-12, denom, 1.0), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-12)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.maximum(e, 1e-12), 0.0, 1.0)
    return p1 + s * d1, p2 + t * d2


def _tangent_basis(n):
    """Two unit tangents orthogonal to n (jit-safe branchless pick)."""
    ref = jnp.where(jnp.abs(n[0]) < 0.9,
                    jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


# Bullet's default contact erp2 used for link-link (non-compliant) contacts —
# self-collision pairs have no contactStiffness set in the reference, so they
# get the global solver defaults rather than the per-body ERP/CFM conversion.
PAIR_ERP = 0.2


def _contact_impulses_f32(sys, dp, dyn, qd_free, dt, cfg, lam0,
                          floor_du=None, floor_dv=None):
    G = sys.n_geoms
    P = sys.n_pairs
    nv = sys.nv
    kin = dyn.kin

    p_geom, _ = geom_world(sys, kin)
    if cfg.combine == "floor":
        # finite-mattress support: per-geom floor height/params switch to the
        # backup hard plane outside the mattress x/y extent (no-op at the
        # default +-1e9 extent)
        on_mattress = ((p_geom[:, 0] >= dp.mattress_x[0])
                       & (p_geom[:, 0] <= dp.mattress_x[1])
                       & (p_geom[:, 1] >= dp.mattress_y[0])
                       & (p_geom[:, 1] <= dp.mattress_y[1]))
        floor_z_g = jnp.where(on_mattress, dp.floor_z, dp.hard_floor_z)
        if floor_du is not None:
            floor_z_g = jnp.where(on_mattress, floor_z_g + floor_du, floor_z_g)
        surf_v = (jnp.where(on_mattress, floor_dv, 0.0)
                  if floor_dv is not None else None)
    else:
        on_mattress = None
        floor_z_g = dp.floor_z
        surf_v = None
    phi = p_geom[:, 2] - sys.geom_radius - floor_z_g       # signed gap per geom
    active = phi < 0.0

    mu, mu_spin, e, k, d = _combined_params(sys, dp, cfg, on_mattress)
    denom = dt * k + d
    cfm = 1.0 / jnp.maximum(denom, 1e-9)
    erp = dt * k / jnp.maximum(denom, 1e-9)
    softness = cfm / dt                                     # added to row diagonal
    pushout = -(erp / dt) * jnp.minimum(phi, 0.0)           # >= 0 bias velocity

    # Build rows: for each geom, [normal; t1; t2; spin]
    n_vec = jnp.array([0.0, 0.0, 1.0])
    t1 = jnp.array([1.0, 0.0, 0.0])
    t2 = jnp.array([0.0, 1.0, 0.0])

    rows = []
    for g in range(G):
        l = sys.geom_link[g]
        # contact point at the bottom of the sphere
        r = (p_geom[g] - jnp.array([0.0, 0.0, 1.0]) * sys.geom_radius[g]) - kin.com[l]
        j_pt = kin.jv[l] - smallmm.mm(maths.skew(r), kin.jw[l])  # (3, NV)
        rows.append(smallmm.vm(n_vec, j_pt))
        rows.append(smallmm.vm(t1, j_pt))
        rows.append(smallmm.vm(t2, j_pt))
        rows.append(smallmm.vm(n_vec, kin.jw[l]))           # torsional row
    # --- self-collision capsule pairs: [normal; t1; t2] each ---
    pair_active, pair_pushout = [], []
    for p in range(P):
        li, lj = sys.pair_link[p]
        seg = sys.pair_seg[p]
        a1 = kin.pos[li] + maths.quat_rotate(kin.quat[li], seg[0, 0])
        b1 = kin.pos[li] + maths.quat_rotate(kin.quat[li], seg[0, 1])
        a2 = kin.pos[lj] + maths.quat_rotate(kin.quat[lj], seg[1, 0])
        b2 = kin.pos[lj] + maths.quat_rotate(kin.quat[lj], seg[1, 1])
        c1, c2 = _closest_seg_seg(a1, b1, a2, b2)
        diff = c1 - c2
        dist = jnp.linalg.norm(diff)
        n = diff / jnp.maximum(dist, 1e-9)
        gap = dist - sys.pair_radius[p]
        pair_active.append(gap < 0.0)
        pair_pushout.append(-(PAIR_ERP / dt) * jnp.minimum(gap, 0.0))
        j1 = kin.jv[li] - smallmm.mm(maths.skew(c1 - kin.com[li]), kin.jw[li])
        j2 = kin.jv[lj] - smallmm.mm(maths.skew(c2 - kin.com[lj]), kin.jw[lj])
        j_rel = j1 - j2                                     # (3, NV)
        tp1, tp2 = _tangent_basis(n)
        rows.append(smallmm.vm(n, j_rel))
        rows.append(smallmm.vm(tp1, j_rel))
        rows.append(smallmm.vm(tp2, j_rel))
    J = jnp.stack(rows)                                     # (4G + 3P, NV)

    JM = smallmm.mm(J, dyn.m_inv)                           # (R, NV) = (M⁻¹Jᵀ)ᵀ
    A = smallmm.mm(JM, J.T)                                 # (R, R)
    v0 = smallmm.mv(J, qd_free)                             # row velocities pre-impulse

    # restitution bias on normal rows from the *pre-contact* approach speed
    # (static-index stack, not a strided slice: strided slices become gathers
    # under vmap, which Mosaic cannot lower)
    if G:
        v_n = jnp.stack([v0[..., 4 * g] for g in range(G)], axis=-1)
        if surf_v is not None:
            # moving mattress surface: restitution from the RELATIVE approach
            # speed, and the row targets the surface velocity instead of 0
            v_rel = v_n - surf_v
            bounce = jnp.where(v_rel < -cfg.restitution_threshold,
                               -e * v_rel, 0.0)
            rhs_n = jnp.maximum(bounce, pushout) + surf_v
        else:
            bounce = jnp.where(v_n < -cfg.restitution_threshold, -e * v_n, 0.0)
            rhs_n = jnp.maximum(bounce, pushout)            # Bullet takes max of the two
    else:
        rhs_n = jnp.zeros((0,))

    R = 4 * G + 3 * P

    if cfg.unroll:
        assert P == 0, "unrolled PGS supports floor contacts only"
        # Fully unrolled Gauss-Seidel over scalars: every update is a chain of
        # elementwise ops over the (vmapped) batch — no scatters, no gathers,
        # no loop-iteration overhead; this is the Pallas-kernel path.
        # stale impulses on now-inactive rows must not leak into the sweep
        lam = [jnp.where(active[r // 4], lam0[r], 0.0) for r in range(R)]
        for _ in range(cfg.iterations):
            for g in range(G):
                base_r = 4 * g
                for t in range(4):
                    r = base_r + t
                    v = v0[r]
                    for k in range(R):
                        v = v + A[r, k] * lam[k]
                    rhs_r = rhs_n[g] if t == 0 else 0.0
                    inv_d = 1.0 / jnp.maximum(A[r, r] + softness[g], 1e-9)
                    cand = lam[r] + (rhs_r - v - softness[g] * lam[r]) * inv_d
                    if t == 0:
                        new = jnp.maximum(cand, 0.0)
                    else:
                        lim = (mu_spin[g] if t == 3 else mu[g]) * lam[base_r]
                        new = jnp.clip(cand, -lim, lim)
                    lam[r] = jnp.where(active[g], new, 0.0)
        lam = jnp.stack(lam)
        return qd_free + smallmm.mv(dyn.m_inv, smallmm.mv(J.T, lam)), lam

    # Rolled variant: per-row metadata + fori_loop (compact compile graph).
    # Row structure is static per system — built in numpy so the Pallas
    # solver can close over it as compile-time constants.
    import numpy as _np

    _rt = _np.tile(_np.arange(4), G)                       # 0=n,1=t1,2=t2,3=spin
    _norm_np = 4 * (_np.arange(4 * G) // 4)
    _isn_np = _rt == 0
    if P:
        _prt = _np.tile(_np.arange(3), P)                  # 0=n,1=t1,2=t2
        _norm_np = _np.concatenate([_norm_np, 4 * G + 3 * _np.repeat(_np.arange(P), 3)])
        _isn_np = _np.concatenate([_isn_np, _prt == 0])

    row_type = jnp.tile(jnp.arange(4), G)
    row_geom = jnp.repeat(jnp.arange(G), 4)
    rhs = jnp.where(row_type == 0, rhs_n[row_geom], 0.0)   # (4G,)
    active_r = active[row_geom]
    mu_r = jnp.where(row_type == 3, mu_spin[row_geom], mu[row_geom])
    softness_r = jnp.repeat(softness, 4)

    if P:
        pair_rt = jnp.tile(jnp.arange(3), P)
        pair_row_p = jnp.repeat(jnp.arange(P), 3)
        rhs = jnp.concatenate([
            rhs, jnp.where(pair_rt == 0, jnp.stack(pair_pushout)[pair_row_p], 0.0)])
        active_r = jnp.concatenate([active_r, jnp.stack(pair_active)[pair_row_p]])
        mu_r = jnp.concatenate([mu_r, sys.pair_friction[pair_row_p]])
        softness_r = jnp.concatenate([softness_r, jnp.zeros(3 * P)])
    is_normal_r = jnp.asarray(_isn_np)
    norm_idx = jnp.asarray(_norm_np)

    if cfg.solver == "pgs" and cfg.row_unroll:
        # Row-statically-unrolled Gauss-Seidel: fori over sweeps, python loop
        # over rows.  Exactly the rolled loop's math in the rolled loop's
        # order — BIT-IDENTICAL on TPU over vmapped multi-step rollouts
        # (CPU LLVM may FMA-contract the two programs differently at the
        # ulp level; tests/test_contact_solvers.py::test_row_unroll_bit_parity).
        # Static row indices mean every slice below is a static slice and
        # the is_normal/norm_idx row metadata resolves at trace time, which
        # deletes the rolled path's per-row pred/s32 dynamic slices and
        # selects; inv_diag reads A[r][r] from the row already in hand
        # instead of a separate diagonal pass over the full Delassus matrix.
        _isn = [bool(x) for x in _isn_np]
        _nix = [int(x) for x in _norm_np]

        def sweep_unrolled(_, lam):
            for r in range(R):
                a_row = A[r]
                v = v0[r] + jnp.sum(a_row * lam)
                inv_d = 1.0 / jnp.maximum(a_row[r] + softness_r[r], 1e-9)
                cand = lam[r] + (rhs[r] - v - softness_r[r] * lam[r]) * inv_d
                if _isn[r]:
                    new = jnp.maximum(cand, 0.0)     # == clip(cand, 0, inf)
                else:
                    lim = mu_r[r] * lam[_nix[r]]
                    new = jnp.clip(cand, -lim, lim)
                new = jnp.where(active_r[r], new, 0.0)
                lam = lam.at[r].set(new)
            return lam

        lam = jax.lax.fori_loop(0, cfg.iterations, sweep_unrolled,
                                jnp.where(active_r, lam0, 0.0))
        return qd_free + smallmm.mv(dyn.m_inv, smallmm.mv(J.T, lam)), lam

    if cfg.solver == "pgs_matfree":
        # Matrix-free Pallas PGS: A is never formed (XLA DCEs the assembly
        # above — only JM survives); the kernel maintains w = M⁻¹Jᵀλ in
        # VMEM and returns Δqd = M⁻¹Jᵀλ directly.  Same row order and
        # projection as 'pgs'; differs at float-association ulps (row dot
        # contracts over NV instead of R), so NOT bit-identical —
        # bench/rollout regime only, not production identification
        # (ops/pgs_matfree_pallas.py).
        from simgan_tpu.ops.pgs_matfree_pallas import make_matfree_solver

        diag_mf = jnp.sum(JM * J, axis=-1)                 # diag(A) w/o A
        invd_mf = 1.0 / jnp.maximum(diag_mf + softness_r, 1e-9)
        solve = make_matfree_solver(R, int(J.shape[-1]), cfg.iterations,
                                    tuple(bool(x) for x in _isn_np),
                                    tuple(int(x) for x in _norm_np))
        lam, dqd = solve(J, JM, v0, rhs, mu_r, softness_r,
                         active_r.astype(jnp.float32), invd_mf, lam0)
        return qd_free + dqd, lam

    a_diag = jnp.sum(A * jnp.eye(R), axis=-1)   # Mosaic-safe diagonal
    inv_diag = 1.0 / jnp.maximum(a_diag + softness_r, 1e-9)

    if cfg.solver == "pgs_pallas":
        from simgan_tpu.ops.pgs_pallas import make_pgs_solver

        solve = make_pgs_solver(R, cfg.iterations,
                                tuple(bool(x) for x in _isn_np),
                                tuple(int(x) for x in _norm_np))
        lam = solve(A, v0, rhs, mu_r, softness_r,
                    active_r.astype(jnp.float32), inv_diag, lam0)
        return qd_free + smallmm.mv(dyn.m_inv, smallmm.mv(J.T, lam)), lam

    if cfg.solver == "staged":
        # constant selector: S @ lam -> each row's controlling normal impulse
        # (a tiny constant matmul instead of a gather — vmap/fusion friendly)
        norm_idx_np = _np.concatenate(
            [4 * (_np.arange(4 * G) // 4),
             4 * G + 3 * _np.repeat(_np.arange(P), 3)]).astype(_np.int64)
        S = _np.zeros((R, R), dtype=_np.float32)
        S[_np.arange(R), norm_idx_np] = 1.0
        S = jnp.asarray(S)

        def sweep(_, lam):
            for phase_is_normal in (True, False):
                v = v0 + smallmm.mv(A, lam)
                cand = lam + (rhs - v - softness_r * lam) * inv_diag
                lam_n = smallmm.mv(S, lam)
                lo = jnp.where(is_normal_r, 0.0, -mu_r * lam_n)
                hi = jnp.where(is_normal_r, jnp.inf, mu_r * lam_n)
                new = jnp.where(active_r, jnp.clip(cand, lo, hi), 0.0)
                phase = is_normal_r if phase_is_normal else ~is_normal_r
                lam = jnp.where(phase, new, lam)
            return lam

        lam = jax.lax.fori_loop(0, cfg.iterations, sweep,
                                jnp.where(active_r, lam0, 0.0))
        return qd_free + smallmm.mv(dyn.m_inv, smallmm.mv(J.T, lam)), lam

    def row_body(i, lam):
        r = i % R
        a_row = jax.lax.dynamic_slice_in_dim(A, r, 1, 0)[0]
        v = v0[r] + jnp.sum(a_row * lam)
        cand = lam[r] + (rhs[r] - v - softness_r[r] * lam[r]) * inv_diag[r]
        lam_n = lam[norm_idx[r]]                           # this contact's normal impulse
        is_normal = is_normal_r[r]
        lo = jnp.where(is_normal, 0.0, -mu_r[r] * lam_n)
        hi = jnp.where(is_normal, jnp.inf, mu_r[r] * lam_n)
        new = jnp.where(active_r[r], jnp.clip(cand, lo, hi), 0.0)
        return lam.at[r].set(new)

    lam = jax.lax.fori_loop(0, cfg.iterations * R, row_body,
                            jnp.where(active_r, lam0, 0.0))
    return qd_free + smallmm.mv(dyn.m_inv, smallmm.mv(J.T, lam)), lam
