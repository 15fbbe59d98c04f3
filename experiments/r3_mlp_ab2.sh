#!/bin/bash
# Fused int4 decode-MLP kernel A/B (after the 4-D down-scales lowering
# fix) at the B1 latency point and the B64 throughput headline, int4
# weights + int4 KV. Waits for any PID in $1 to release the chip first.
# Run: nohup bash experiments/r3_mlp_ab2.sh <pid-to-wait-for> > /tmp/r3mlp.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

for B in 1 64; do
  for F in 1 0; do
    echo "=== decode B=$B MLP_FUSED=$F int4w kv4 ==="
    MLP_FUSED=$F timeout 3000 python -u bench.py --mode decode \
      --int4_weights --kv_quant --kv_bits 4 --batch $B
  done
done
echo "=== mlp ab done ==="
