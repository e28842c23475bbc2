#!/bin/bash
cd /root/repo
echo "=== 2k chip run ==="
timeout 3000 python scripts/submap_scale_tpu.py 2000 260 256 \
  --save-run results_r4/run2k.pkl --diag /tmp/d2k.npz \
  > results_r4/scale2k.jsonl 2> results_r4/scale2k.err
echo "=== 20k chip run ==="
TPUSLAM_ALIGN_MIN_EPOCHS=32 timeout 5400 python scripts/submap_scale_tpu.py 20000 800 512 \
  --sensor-range 27 --max-obs 48 \
  --save-run results_r4/run20k.pkl --diag /tmp/d20k.npz \
  > results_r4/scale20k.jsonl 2> results_r4/scale20k.err
echo "QUEUE2 DONE"
