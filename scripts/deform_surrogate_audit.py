"""Deformable-mattress surrogate self-audit (VERDICT r3 item 8).

PyBullet is unavailable in this image, so the soft-body mattress
(``loadSoftBody`` mass-spring volume: hopper_env_v3.py:143-149 k=1500 d=50
mass 20; laikago_env_v4.py:177-183 k=60000 d=150 mass 4000) cannot be traced
directly.  This script bounds the surrogate error *analytically* on the 1-D
normal-direction drop problem, which dominates the contact response:

  model A (our surrogate)  — compliant half-space: a massless spring-damper
      (k, d) between the contact point and the ground, unilateral.  Two
      integrators: (A-ode) near-exact tiny-step integration of
      m z'' = -m g - k z - d z' while penetrating, and (A-eng) the ENGINE'S
      actual per-substep update at dt=1/500 — Bullet's ERP/CFM conversion +
      warm-started impulse row, replicated from physics/contact.py for one
      normal row (erp = dt k/(dt k + d), cfm = 1/(dt k + d), pushout
      = -(erp/dt) min(phi, 0), one-sided lam >= 0).

  model B (reference-like slab) — the mass-spring body has *interior inertia*:
      the engaged surface nodes carry mass m2 that must be accelerated.  1-D
      reduction: the falling mass m1 merges inelastically with an engaged
      node mass m2 riding the same (k, d) element to ground; they separate
      when the contact force reaches zero.  m2 = 0 recovers model A; sweeping
      m2/m1 bounds the interior-dynamics error our half-space cannot model.

Reported per robot (foot-effective mass, reference spring constants): settle
depth, max penetration, contact duration, rebound velocity ratio — A-eng vs
A-ode (discretization error of our engine) and A vs B over the m2 sweep
(family error of the half-space).  Output is the RESULTS.md table.
"""

from __future__ import annotations

import numpy as np

DT_FINE = 1e-6          # near-exact integration step
DT_ENGINE = 1.0 / 500.0 # reference physics rate
G = 10.0                # reference gravity (hopper_env_v3.py:115)


def drop_ode(m1, k, d, v_impact, m2=0.0, t_max=3.0):
    """Tiny-step integration of the (merged-mass) unilateral spring-damper.

    Returns dict(max_pen, settle, contact_T, v_out, rebound).  Contact phase:
    (m1+m2) z'' = -(m1+m2) g - k z - d z' with z(0)=0, z'(0)=v_merge where
    v_merge conserves momentum of the inelastic m1+m2 merge.  Separation when
    the spring-damper force on m1 drops to zero (f = -k z - d z' <= 0);
    m1 leaves with the common velocity at that instant.
    """
    m = m1 + m2
    v = m1 * v_impact / m          # inelastic merge (m2 initially at rest)
    z = 0.0
    t = 0.0
    max_pen = 0.0
    dt = DT_FINE
    # scale steps to the natural period so stiff cases stay accurate
    w = np.sqrt(k / m)
    dt = min(dt, 0.001 / w)
    while t < t_max:
        f = -k * z - d * v          # upward contact force on the mass
        a = -G + f / m
        v += a * dt
        z += v * dt
        t += dt
        max_pen = max(max_pen, -z)
        # settled? (overdamped convergence)
        if abs(v) < 1e-6 and abs(-k * z - m * G) / (m * G) < 1e-4:
            return dict(max_pen=max_pen, settle=-z, contact_T=t,
                        v_out=0.0, rebound=0.0)
        if z >= 0.0 and f <= 0.0:   # separation at zero force, above rest
            return dict(max_pen=max_pen, settle=m1 * G / k, contact_T=t,
                        v_out=v, rebound=max(v, 0.0) / max(-v_impact, 1e-12))
    return dict(max_pen=max_pen, settle=-z, contact_T=t, v_out=v,
                rebound=max(v, 0.0) / max(-v_impact, 1e-12))


def drop_engine(m1, k, d, v_impact, t_max=3.0):
    """Our engine's per-substep soft-constraint update for one normal row
    (physics/contact.py:_contact_impulses_f32, warm-started, restitution 0 —
    the deform surrogate uses combine='floor' with floor restitution of the
    target env; the mattress envs set no bounce on the soft floor)."""
    dt = DT_ENGINE
    denom = dt * k + d
    cfm = 1.0 / max(denom, 1e-9)
    erp = dt * k / max(denom, 1e-9)
    softness = cfm / dt
    inv_m = 1.0 / m1
    z, v, lam_prev = 0.0, v_impact, 0.0
    t = 0.0
    max_pen = 0.0
    while t < t_max:
        phi = z
        active = phi < 0.0
        v_free = v - G * dt
        pushout = -(erp / dt) * min(phi, 0.0)
        lam = lam_prev if active else 0.0
        # PGS on one row converges in closed form (A = inv_m):
        # lam <- max(0, lam + (rhs - (v_free + A lam) - softness*lam)/(A+softness))
        for _ in range(5):           # production solver_iterations=5
            if not active:
                lam = 0.0
                break
            cand = lam + (pushout - (v_free + inv_m * lam) - softness * lam) \
                / (inv_m + softness)
            lam = max(cand, 0.0)
        lam_prev = lam
        v = v_free + inv_m * lam
        z += v * dt                  # semi-implicit Euler
        t += dt
        max_pen = max(max_pen, -z)
        if z >= 0.0 and v > 0.0:
            return dict(max_pen=max_pen, settle=m1 * G / k, contact_T=t,
                        v_out=v, rebound=v / max(-v_impact, 1e-12))
        if abs(v) < 1e-7 and t > 0.5:
            return dict(max_pen=max_pen, settle=-z, contact_T=t,
                        v_out=0.0, rebound=0.0)
    return dict(max_pen=max_pen, settle=-z, contact_T=t, v_out=v,
                rebound=max(v, 0.0) / max(-v_impact, 1e-12))


CASES = [
    # robot, effective mass on one contact, k, d, impact speed, slab mass
    # hopper: total 15.83 kg (URDF masses 3.67+4.06+2.78+5.32), lands on one
    # foot; ~0.5 m drop -> v ~ 3.2 m/s.  mattress mass 20 kg.
    ("hopper  (k=1500, d=50)", 15.83, 1500.0, 50.0, -3.2, 20.0),
    # laikago: 25 kg over 4 toes -> ~6.2 kg per toe quasi-static; dynamic
    # footfalls at walking speed hit ~1 m/s.  mattress mass 4000 kg.
    ("laikago (k=60000, d=150)", 6.25, 60000.0, 150.0, -1.0, 4000.0),
]


def fmt(r):
    return (f"pen {1000*r['max_pen']:7.1f} mm  settle {1000*r['settle']:6.1f} mm  "
            f"T {1000*r['contact_T']:7.1f} ms  rebound {r['rebound']:.3f}")


def main():
    print("== deform surrogate audit: 1-D drop, per-contact normal response ==")
    for name, m1, k, d, v0, m_slab in CASES:
        print(f"\n-- {name}: m_eff={m1} kg, v_impact={v0} m/s --")
        a_ode = drop_ode(m1, k, d, v0)
        a_eng = drop_engine(m1, k, d, v0)
        print(f"  A-ode  (ideal half-space)  : {fmt(a_ode)}")
        print(f"  A-eng  (engine @500Hz)     : {fmt(a_eng)}")
        ep = abs(a_eng["max_pen"] - a_ode["max_pen"]) / max(a_ode["max_pen"], 1e-9)
        print(f"  engine-vs-ideal max-pen err: {100*ep:.1f}%")
        print("  B (slab inertia m2), vs A-ode:")
        for frac in (0.1, 0.3, 1.0, 3.0):
            m2 = frac * m1
            b = drop_ode(m1, k, d, v0, m2=m2)
            dp = (b["max_pen"] - a_ode["max_pen"]) / max(a_ode["max_pen"], 1e-9)
            dr = b["rebound"] - a_ode["rebound"]
            print(f"    m2/m1={frac:4.1f} ({m2:7.1f} kg): {fmt(b)}   "
                  f"d_pen {100*dp:+6.1f}%  d_reb {dr:+.3f}")
        print(f"  (full slab mass would be {m_slab} kg = "
              f"{m_slab/m1:.0f}x m_eff; engaged-node mass under one foot is "
              f"a small fraction of that)")


if __name__ == "__main__":
    main()
