#!/bin/bash
# Round-4 laika_power identification-lever sweep (VERDICT r3 item 5): all
# under det-collect (the proven lever, RESULTS r3d: 15/100), one lever moved
# per run.  The det expert pickle is re-collected first (collect_det
# reproduced bit-identically across rounds 3/4).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
P="python scripts/run_experiment.py laika_power --collect-det 1 --traj-suffix _det"

echo "=== collect (det) $(date -u +%H:%M:%S) ==="
$P --tag r4pc --stages collect 2>&1 | tail -2

for spec in "r4pw --s-idx 0,4" "r4pd --id-override gail_downsample_frequency=5" "r4pb --battery-prior 1"; do
  set -- $spec
  tag=$1; shift
  echo "=== $tag start $(date -u +%H:%M:%S) ==="
  $P --tag $tag --stages identify,refine,test "$@" 2>&1 | tail -3
  echo "=== $tag done $(date -u +%H:%M:%S) ==="
  cat runs/laika_power_${tag}_result.json 2>/dev/null | python -c "import json,sys; d=json.load(sys.stdin); print('$tag:', d.get('refined_mean'), d.get('refined_median'), d.get('refined_success'))" || echo "$tag: MISSING"
done
echo ALL_DONE
