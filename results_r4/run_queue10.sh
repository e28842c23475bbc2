#!/bin/bash
cd /root/repo
echo "=== 20k survey + topk only ==="
TPUSLAM_ALIGN_MIN_EPOCHS=32 timeout 3000 python scripts/submap_scale_tpu.py 20000 800 512 \
  --sensor-range 27 --max-obs 48 --vote-topk 6 \
  --diag /tmp/d20k_topk.npz \
  > results_r4/scale20k_topk.jsonl 2> results_r4/scale20k_topk.err
echo "QUEUE10 DONE"
