#!/bin/bash
# Round-4 D-ensemble seed sweep (VERDICT r3 item 2): seeds +100..+400 of the
# laika_heavy 5-seed protocol (RESULTS.md seed-distribution table) with
# --d-ensemble 5 (per-member expert bootstraps, reward = member mean).
# Seed 0 already recorded: runs/laika_heavy_r4de0_result.json (28/100).
# Sequential: one process owns the TPU.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
for off in 100 200 300 400; do
  echo "=== r4de$off start $(date -u +%H:%M:%S) ==="
  python scripts/run_experiment.py laika_heavy \
    --tag r4de$off --stages identify,refine,test \
    --d-ensemble 5 --seed-offset $off 2>&1 | tail -3
  echo "=== r4de$off done $(date -u +%H:%M:%S) ==="
  cat runs/laika_heavy_r4de${off}_result.json 2>/dev/null | python -c "import json,sys; d=json.load(sys.stdin); print('r4de$off:', d.get('refined_mean'), d.get('refined_median'), d.get('refined_success'))" || echo "r4de$off: MISSING"
done
echo ALL_DONE
