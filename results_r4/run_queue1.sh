#!/bin/bash
# Queue 1: fp16 big-cap rows (VERDICT task 3) then FastSLAM study (task 6)
cd /root/repo
echo "=== bigcap fp16 24576 ===" 
timeout 3000 python scripts/bigcap_fp16_one.py 24576 > results_r4/bigcap_fp16_24576.json 2> results_r4/bigcap_fp16_24576.err
echo "=== bigcap fp16 32768 ==="
timeout 3000 python scripts/bigcap_fp16_one.py 32768 > results_r4/bigcap_fp16_32768.json 2> results_r4/bigcap_fp16_32768.err
echo "=== pf quality study ==="
timeout 6000 python scripts/pf_quality_tpu.py 5 100 1000 10000 > results_r4/pf_quality.jsonl 2> results_r4/pf_quality.err
echo "QUEUE1 DONE"
