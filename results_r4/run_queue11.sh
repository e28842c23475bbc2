#!/bin/bash
cd /root/repo
echo "=== 100k survey + topk only (the new default recipe) ==="
TPUSLAM_ALIGN_MIN_EPOCHS=32 timeout 5400 python scripts/submap_scale_tpu.py 100000 1800 512 \
  --sensor-range 27 --max-obs 48 --max-epochs 160000 \
  --save-run results_r4/run100k_topk.pkl --diag /tmp/d100k_topk.npz \
  > results_r4/scale100k_topk.jsonl 2> results_r4/scale100k_topk.err
echo "QUEUE11 DONE"
