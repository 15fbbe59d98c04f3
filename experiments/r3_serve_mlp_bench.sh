#!/bin/bash
# Round-3 late TPU measurement batch:
#  1) fused int4 decode-MLP kernel A/B (ops/mlp_int4.py, MLP_FUSED env)
#     at the B1 latency point and the B64 throughput headline
#  2) continuous-batching serving bench (experiments/serving_bench.py)
# Run: nohup bash experiments/r3_serve_mlp_bench.sh > /tmp/r3smb.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

for B in 1 64; do
  for F in 1 0; do
    echo "=== decode B=$B MLP_FUSED=$F int4w kv4 ==="
    MLP_FUSED=$F timeout 3000 python -u bench.py --mode decode \
      --int4_weights --kv_quant --kv_bits 4 --batch $B
  done
done

echo "=== serving bench ==="
timeout 5400 python -u experiments/serving_bench.py
echo "=== all done ==="
