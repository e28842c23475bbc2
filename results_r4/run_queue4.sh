#!/bin/bash
cd /root/repo
echo "=== 20k rerun v3 ==="
TPUSLAM_ALIGN_MIN_EPOCHS=32 timeout 3600 python scripts/submap_scale_tpu.py 20000 800 512 \
  --sensor-range 27 --max-obs 48 \
  --save-run results_r4/run20k_r4.pkl --diag /tmp/d20k_r4.npz \
  > results_r4/scale20k_r4.jsonl 2> results_r4/scale20k_r4.err
echo "QUEUE4 DONE"
