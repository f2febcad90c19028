"""Joint-limit reachability sweep for laikago self-collision capsule pairs.

The reference loads laikago with URDF_USE_SELF_COLLISION
(my_pybullet_envs/laikago.py:104); btMultiBody filters parent-child pairs.
This sweep samples joint configurations inside the ctrl limits
(laikago_toes_limits.urdf: hip +-0.873/1.0472, upper -1.3/3.4, knee
-2.164/0) and reports, per candidate link pair, the minimum capsule-capsule
clearance over the sweep -- negative means the pair is reachable and must be
modeled.  Pure numpy (no jax): runs anywhere without touching the TPU.

Capsule approximations from the collision-mesh AABBs already baked into
simgan_tpu/models/laikago.py:
  chassis  : segment z=-0.26..0.32 @ y=0.014 (frame long axis), r=0.10
  upper leg: hip origin -> knee origin, r=0.05
  lower leg: knee -> toe ([0,-0.25,-0.022]), r=0.03
"""

from __future__ import annotations

import itertools

import numpy as np

HIP_ORG = {
    "FR": [-0.0817145, 0, 0.242889],
    "FL": [0.0817145, 0, 0.242889],
    "RR": [-0.0817145, 0, -0.194401],
    "RL": [0.0817145, 0, -0.194401],
}
HIP_AXIS = {"FR": [0, 0, -1], "FL": [0, 0, 1], "RR": [0, 0, -1], "RL": [0, 0, 1]}
UPPER_ORG = {"FR": [-0.053565, 0, 0], "FL": [0.055855, 0, 0],
             "RR": [-0.053565, 0, 0], "RL": [0.055855, 0, 0]}
LOWER_ORG = {"FR": [0.02069, -0.20833, -0.1422], "FL": [-0.02069, -0.20833, -0.1422],
             "RR": [0.02069, -0.20833, -0.1422], "RL": [-0.02069, -0.20833, -0.1422]}
LIMITS = [(-0.873, 1.0472), (-1.3, 3.4), (-2.164, 0.0)]

LEGS = ["FR", "FL", "RR", "RL"]

# capsules in link frames: (name, segment a, segment b, radius)
CHASSIS_CAP = (np.array([0.0, 0.014, -0.26]), np.array([0.0, 0.014, 0.32]), 0.10)
UPPER_R = 0.05
LOWER_R = 0.03
TOE = np.array([0.0, -0.25, -0.022])


def _axis_angle(axis, th):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def leg_capsules(q3, leg):
    """World (=chassis-frame; base fixed) capsules for one leg at q3."""
    R_hip = _axis_angle(HIP_AXIS[leg], q3[0])
    p_hip = np.asarray(HIP_ORG[leg])
    R_up = R_hip @ _axis_angle([1, 0, 0], q3[1])
    p_up = p_hip + R_hip @ np.asarray(UPPER_ORG[leg])
    R_lo = R_up @ _axis_angle([1, 0, 0], q3[2])
    p_lo = p_up + R_up @ np.asarray(LOWER_ORG[leg])
    upper = (p_up, p_lo, UPPER_R)                      # hip->knee segment
    lower = (p_lo, p_lo + R_lo @ TOE, LOWER_R)         # knee->toe segment
    return {"upper": upper, "lower": lower}


def seg_dist(p1, q1, p2, q2):
    d1, d2, r = q1 - p1, q2 - p2, p1 - p2
    a, e = d1 @ d1, d2 @ d2
    b, c, f = d1 @ d2, d1 @ r, d2 @ r
    denom = a * e - b * b
    s = np.clip((b * f - c * e) / denom, 0, 1) if denom > 1e-12 else 0.0
    t = np.clip((b * s + f) / e, 0, 1)
    s = np.clip((b * t - c) / a, 0, 1)
    t = np.clip((b * s + f) / e, 0, 1)
    return np.linalg.norm((p1 + s * d1) - (p2 + t * d2))


def main():
    rng = np.random.RandomState(0)
    n = 200_000
    qs = rng.uniform([l for l, _ in LIMITS] * 4, [u for _, u in LIMITS] * 4, (n, 12))

    # candidate pairs: chassis-lower, chassis-upper (per leg, non-adjacent),
    # and all cross-leg upper/lower combos
    parts = []
    for li, leg in enumerate(LEGS):
        parts += [(leg, "upper"), (leg, "lower")]
    cands = []
    for leg in LEGS:
        cands.append((("chassis",), (leg, "lower")))
        cands.append((("chassis",), (leg, "upper")))
    for (l1, p1), (l2, p2) in itertools.combinations(parts, 2):
        if l1 != l2:
            cands.append(((l1, p1), (l2, p2)))

    best = {c: (np.inf, None) for c in cands}
    batch = 2000
    for i0 in range(0, n, batch):
        for q in qs[i0:i0 + batch]:
            caps = {leg: leg_capsules(q[3 * i:3 * i + 3], leg)
                    for i, leg in enumerate(LEGS)}
            for c in cands:
                a, b = c
                c1 = CHASSIS_CAP if a == ("chassis",) else caps[a[0]][a[1]]
                c2 = caps[b[0]][b[1]]
                d = seg_dist(c1[0], c1[1], c2[0], c2[1]) - (c1[2] + c2[2])
                if d < best[c][0]:
                    best[c] = (d, q.copy())
        done = min(i0 + batch, n)
        if done % 20000 == 0:
            print(f"... {done}/{n}", flush=True)

    print("\npair: min clearance over sweep (negative = reachable penetration)")
    for c, (d, q) in sorted(best.items(), key=lambda kv: kv[1][0]):
        a = "-".join(c[0])
        b = "-".join(c[1])
        print(f"{a:10s} vs {b:10s}: {d:+.3f} m")
    reach = [c for c, (d, _) in best.items() if d < -0.01]
    print(f"\nreachable (pen > 1 cm): {len(reach)} / {len(cands)}")


if __name__ == "__main__":
    main()
