#!/bin/bash
cd /root/repo
echo "=== 100k lawnmower + topk ==="
TPUSLAM_ALIGN_MIN_EPOCHS=32 timeout 5400 python scripts/submap_scale_tpu.py 100000 1800 512 \
  --sensor-range 27 --max-obs 48 --max-epochs 160000 \
  --course lawnmower --vote-topk 6 \
  --save-run results_r4/run100k_lawn.pkl --diag /tmp/d100k_lawn.npz \
  > results_r4/scale100k_lawn.jsonl 2> results_r4/scale100k_lawn.err
echo "QUEUE9 DONE"
