#!/bin/bash
# int4-KV decode serving sweep (one v5e chip, 3B dims, 2014-token prefill,
# 2080-slot timelines to match the late-r3 db baselines) + same-session
# int8-KV baselines. Run: nohup bash experiments/int4_kv_bench.sh > log &
cd /root/repo
for args in \
  "--batch 1 --kv_bits 4" \
  "--batch 16 --kv_bits 4" \
  "--batch 32 --kv_bits 4" \
  "--batch 64 --kv_bits 4" \
  "--batch 1 --kv_bits 8" \
  "--batch 32 --kv_bits 8" \
  "--batch 128 --kv_bits 4" \
; do
  echo "=== decode int4w kv_quant $args ==="
  timeout 1800 python bench.py --mode decode --int4_weights --kv_quant \
    --iters 50 $args 2>&1 | tail -3
done
echo DONE
