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
    local tmplog
    tmplog=$(mktemp /tmp/r5_anchor.XXXXXX.log)
    timeout 3000 "$@" >"$tmplog" 2>&1
    rc=$?
    grep -E '^\{|timing|Error|error' "$tmplog" | tail -8
    if [ $rc -eq 124 ]; then
      echo "--- rc=124 (TIMEOUT after 3000s — likely mid-compile; cache may let a retry finish) ---"
    elif [ $rc -ne 0 ]; then
      echo "--- rc=$rc; unfiltered tail follows ---"
      tail -20 "$tmplog"
    else
      echo "--- rc=0 ---"
    fi
    rm -f "$tmplog"
    [ $rc -eq 0 ] && break
  done
}

run 2 python bench.py --mode decode --batch 64 --int4_weights --kv_quant --kv_bits 4 --iters 60
run 2 python bench.py --mode decode --batch 128 --int4_weights --kv_quant --kv_bits 4 --prefill_rows 32 --iters 60
run 2 python bench.py --mode decode --batch 1 --int4_weights --kv_quant --kv_bits 4 --iters 60
run 2 python bench.py --iters 30
echo QUEUE_DONE
