#!/bin/bash
# Re-assemble + re-score the saved 20k multi-seed front-end runs with the
# CURRENT assembly path (PGO unbend -> select_backend -> association
# choice -> covis merge -> gauge-aligned scoring).  This is the committed
# artifact behind PERF's 20k median table: the front ends are the saved
# chip runs (results_r5/run20k_*.pkl); everything downstream reruns
# host-side, so the table is reproducible from the repo.
cd /root/repo
for course in survey lawnmower; do
  for seed in 4 5 6; do
    out=results_r5/reassemble20k_${course}_s${seed}.jsonl
    if [ -s "$out" ]; then echo "skip $out"; continue; fi
    echo "=== reassemble 20k $course seed $seed $(date +%T) ==="
    timeout 1200 python scripts/submap_scale_tpu.py 20000 800 512 \
      --sensor-range 27 --max-obs 48 --course $course --seed $seed --cpu \
      --load-run results_r5/run20k_${course}_s${seed}.pkl \
      --diag /tmp/rediag20k_${course}_${seed}.npz \
      > "$out" 2> results_r5/reassemble20k_${course}_s${seed}.err
    echo "--- exit $? $(date +%T)"
  done
done
echo ALL_DONE
