"""Same-session interleaved hardware A/B for the matrix-free PGS kernel.

VERDICT r4 item 3: ops/pgs_matfree_pallas.py landed seven minutes before
the round-4 snapshot with its hardware A/B pending.  This script measures
it against the standing defaults on the real chip, interleaved A/B/A/B in
ONE process per the house protocol (host load moves absolute numbers ±15%
between sessions; the within-session ratio is the robust claim):

  laikago B=8192  : bench regime — matfree's design target (it deletes the
                    110 MB/substep Delassus assembly that the r3 profile
                    showed dominating here); vs the row-unrolled XLA pgs
                    (current bench default) and pgs_pallas (r3 loser, -10%)
  laikago B=128   : trainer/identify regime (128 lanes x 125 steps) — vs
                    pgs_pallas, the 5.5x trainer champion
  hopper  B=32768 : bench regime — vs pgs_pallas (current default)

Reuses bench.measure (same warmup discipline: two chained warmup chunks,
then 3 timed chunks).  Reference surface being optimized:
btSequentialImpulseConstraintSolver (SURVEY §2.4).

Usage:  python scripts/ab_matfree.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench

# (label, env, batch, solver override ('' = robot default), spd_pallas)
CONFIGS = [
    ("laika8192_pgs_rowunroll_spd", "laikago", 8192, "", 1),
    ("laika8192_matfree_spd", "laikago", 8192, "pgs_matfree", 1),
    ("laika8192_pgspallas_spd", "laikago", 8192, "pgs_pallas", 1),
    ("laika128_pgspallas_spd", "laikago", 128, "pgs_pallas", 1),
    ("laika128_matfree_spd", "laikago", 128, "pgs_matfree", 1),
    ("hopper32768_pgspallas", "hopper", 32768, "pgs_pallas", 0),
    ("hopper32768_matfree", "hopper", 32768, "pgs_matfree", 0),
]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    results: dict[str, list[float]] = {label: [] for label, *_ in CONFIGS}
    for rep in range(reps):
        for label, env, batch, solver, spd in CONFIGS:
            os.environ["SIMGAN_BENCH_BATCH"] = str(batch)
            os.environ["SIMGAN_BENCH_SOLVER"] = solver
            os.environ["SIMGAN_BENCH_SPD"] = str(spd)
            t0 = time.time()
            sps = bench.measure(env)
            results[label].append(sps)
            print(f"rep{rep} {label}: {sps:,.1f} steps/s "
                  f"({1e6 / sps:.3f} us/env-step) [{time.time() - t0:.0f}s]",
                  flush=True)
    summary = {label: {"steps_per_s": [round(v, 1) for v in vals],
                       "us_per_env_step": [round(1e6 / v, 4) for v in vals],
                       "best_us": round(1e6 / max(vals), 4)}
               for label, vals in results.items()}
    print(json.dumps(summary, indent=1), flush=True)
    out = os.path.join(os.path.dirname(__file__), "..", "runs",
                       "ab_matfree_result.json")
    json.dump(summary, open(out, "w"), indent=1)


if __name__ == "__main__":
    main()
