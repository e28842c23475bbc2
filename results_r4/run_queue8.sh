#!/bin/bash
cd /root/repo
echo "=== 20k lawnmower stretch: topk vote + budget window ==="
TPUSLAM_ALIGN_MIN_EPOCHS=32 timeout 3000 python scripts/submap_scale_tpu.py 20000 800 512 \
  --sensor-range 27 --max-obs 48 --course lawnmower \
  --vote-topk 6 \
  --diag /tmp/d20k_lawn.npz \
  > results_r4/scale20k_lawn.jsonl 2> results_r4/scale20k_lawn.err
echo "QUEUE8 DONE"
