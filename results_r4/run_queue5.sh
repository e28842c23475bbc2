#!/bin/bash
cd /root/repo
echo "=== 20k attribution: whole-chain refine, gate off (good-run config) ==="
TPUSLAM_ALIGN_MIN_EPOCHS=32 TPUSLAM_REFINE_WINDOW=100000 TPUSLAM_REFINE_GATE=off \
  timeout 3600 python scripts/submap_scale_tpu.py 20000 800 512 \
  --sensor-range 27 --max-obs 48 \
  --save-run results_r4/run20k_whole.pkl --diag /tmp/d20k_w.npz \
  > results_r4/scale20k_whole.jsonl 2> results_r4/scale20k_whole.err
echo "QUEUE5 DONE"
