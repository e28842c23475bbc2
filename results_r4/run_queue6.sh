#!/bin/bash
cd /root/repo
echo "=== 20k v7 (head-anchored windowed refine) ==="
TPUSLAM_ALIGN_MIN_EPOCHS=32 timeout 3600 python scripts/submap_scale_tpu.py 20000 800 512 \
  --sensor-range 27 --max-obs 48 \
  --save-run results_r4/run20k_v7.pkl --diag /tmp/d20k_v7.npz \
  > results_r4/scale20k_v7.jsonl 2> results_r4/scale20k_v7.err
echo "=== 100k run ==="
TPUSLAM_ALIGN_MIN_EPOCHS=32 timeout 7200 python scripts/submap_scale_tpu.py 100000 1800 512 \
  --sensor-range 27 --max-obs 48 --max-epochs 160000 \
  --save-run results_r4/run100k.pkl --diag /tmp/d100k.npz \
  > results_r4/scale100k.jsonl 2> results_r4/scale100k.err
echo "=== PF study ==="
timeout 6000 python scripts/pf_quality_tpu.py 5 100 1000 10000 \
  > results_r4/pf_quality_g100.jsonl 2> results_r4/pf_quality_g100.err
echo "QUEUE6 DONE"
