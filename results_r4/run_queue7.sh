#!/bin/bash
cd /root/repo
# wait for queue6 (PF study) to finish
while pgrep -f "pf_quality_tpu" > /dev/null 2>&1; do sleep 30; done
sleep 10
echo "=== 100k B: vote-topk 6 + budget window ==="
TPUSLAM_ALIGN_MIN_EPOCHS=32 timeout 7200 python scripts/submap_scale_tpu.py 100000 1800 512 \
  --sensor-range 27 --max-obs 48 --max-epochs 160000 \
  --vote-topk 6 --budget-window \
  --save-run results_r4/run100k_b.pkl --diag /tmp/d100k_b.npz \
  > results_r4/scale100k_b.jsonl 2> results_r4/scale100k_b.err
echo "QUEUE7 DONE"
