#!/bin/bash
# Round-5 session re-anchor: current-default headline captures.
# B128 decode re-measure (last session's arm printed an impossible 19.4k
# tok/s from a d_small anomaly); B64/B1 re-anchor with slab-scales+obin
# defaults; encode default (folded-smoothed int8).
cd /root/repo
run() {
  local tries=$1; shift
  for i in $(seq 1 $tries); do
    echo "=== $* (attempt $i) ==="
    timeout 3000 "$@" 2>&1 | grep -E '^\{|timing|Error|error' | tail -8
    rc=${PIPESTATUS[0]}
    echo "--- rc=$rc ---"
    [ $rc -eq 0 ] && break
  done
}

run 2 python bench.py --mode decode --batch 64 --int4_weights --kv_quant --kv_bits 4 --iters 60
run 2 python bench.py --mode decode --batch 128 --int4_weights --kv_quant --kv_bits 4 --prefill_rows 32 --iters 60
run 2 python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
run 2 python bench.py --iters 30
echo QUEUE_DONE
