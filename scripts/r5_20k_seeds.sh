#!/bin/bash
# 20k multi-seed protocol (VERDICT r4 task 2): default recipe, both course
# families, 3 seeds each.  Fresh process per run (OOM poisoning rule).
cd /root/repo
export TPUSLAM_ALIGN_MIN_EPOCHS=32
for course in survey lawnmower; do
  for seed in 4 5 6; do
    out=results_r5/scale20k_${course}_s${seed}.jsonl
    if [ -s "$out" ]; then echo "skip $out"; continue; fi
    echo "=== 20k $course seed $seed $(date +%T) ==="
    timeout 3600 python scripts/submap_scale_tpu.py 20000 800 512 \
      --sensor-range 27 --max-obs 48 --course $course --seed $seed \
      --save-run results_r5/run20k_${course}_s${seed}.pkl \
      --diag /tmp/diag20k_${course}_${seed}.npz \
      > "$out" 2> results_r5/scale20k_${course}_s${seed}.err
    echo "--- exit $? $(date +%T)"
  done
done
echo ALL_DONE
